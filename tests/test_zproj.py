"""Z-projection tests: reductions vs numpy + focus-stacking semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from tmat_tpu.ops import zproj


def test_reductions_match_numpy(rng):
    stack = rng.randint(0, 65535, size=(7, 24, 24)).astype(np.uint16)
    np.testing.assert_array_equal(np.asarray(zproj.proj_max(stack)), stack.max(0))
    np.testing.assert_array_equal(np.asarray(zproj.proj_min(stack)), stack.min(0))
    # device mean runs in float32 (vs numpy's float64)
    np.testing.assert_allclose(
        np.asarray(zproj.proj_avg(stack)), stack.mean(0), rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(zproj.proj_med(stack)), np.median(stack, 0))


def _reference_focus_stack(stack, k=5):
    """Direct NumPy port of the reference's iterative update (zstacks.py:180-189)."""
    from scipy import ndimage

    def blur_and_lap(image):
        kern = np.array([1, 4, 6, 4, 1], np.float32) / 16
        blurred = ndimage.correlate1d(image.astype(np.float32), kern, 0, mode="mirror")
        blurred = ndimage.correlate1d(blurred, kern, 1, mode="mirror")
        deriv = np.array([1, 0, -2, 0, 1], np.float32)
        smooth = np.array([1, 4, 6, 4, 1], np.float32)
        dyy = ndimage.correlate1d(
            ndimage.correlate1d(blurred, deriv, 0, mode="mirror"), smooth, 1, mode="mirror"
        )
        dxx = ndimage.correlate1d(
            ndimage.correlate1d(blurred, smooth, 0, mode="mirror"), deriv, 1, mode="mirror"
        )
        return dyy + dxx

    maxima = np.full_like(stack[0], -np.inf, dtype=np.float32)
    out = stack[0].copy()
    for pos in stack:
        abs_lap = np.abs(blur_and_lap(pos))
        m = abs_lap > maxima
        maxima[m] = abs_lap[m]
        out[m] = pos[m]
    return out


def test_focus_stacking_matches_reference_semantics(rng):
    stack = (rng.rand(6, 32, 32) * 255).astype(np.float32)
    expected = _reference_focus_stack(stack)
    got = np.asarray(zproj.proj_focus_stacking(jnp.asarray(stack)))
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_focus_stacking_axis_move(rng):
    stack = (rng.rand(32, 5, 32) * 255).astype(np.float32)
    got = np.asarray(zproj.proj_focus_stacking(jnp.asarray(stack), axis=1))
    expected = np.asarray(
        zproj.proj_focus_stacking(jnp.asarray(np.moveaxis(stack, 1, 0)))
    )
    np.testing.assert_array_equal(got, expected)


def test_focus_stacking_batch(rng):
    stacks = (rng.rand(3, 4, 16, 16) * 255).astype(np.float32)
    batched = np.asarray(zproj.proj_focus_stacking_batch(jnp.asarray(stacks)))
    for i in range(3):
        single = np.asarray(zproj.proj_focus_stacking(jnp.asarray(stacks[i])))
        np.testing.assert_allclose(batched[i], single, atol=1e-5)


class TestProjMasked:
    """proj_masked (ragged-Z plates): padded slices must not leak into any
    of the five methods (ops/zproj.py::proj_masked)."""

    @pytest.mark.parametrize("method", ["min", "max", "med", "avg", "fs"])
    @pytest.mark.parametrize("n_real", [4, 5])  # even + odd median paths
    def test_matches_unpadded(self, method, n_real):
        from tmat_tpu.ops.zproj import PROJ_METHODS, proj_masked

        rng = np.random.RandomState(42)
        real = (rng.rand(n_real, 24, 24) * 255).astype(np.uint8)
        padded = np.zeros((8, 24, 24), np.uint8)
        padded[:n_real] = real

        got = np.asarray(proj_masked(jnp.asarray(padded), n_real, method))
        want = np.asarray(
            PROJ_METHODS[method](jnp.asarray(real.astype(np.float32)))
        )
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)

    def test_full_stack_equals_plain(self):
        from tmat_tpu.ops.zproj import proj_masked

        rng = np.random.RandomState(0)
        stack = (rng.rand(6, 16, 16) * 255).astype(np.uint8)
        got = np.asarray(proj_masked(jnp.asarray(stack), 6, "max"))
        np.testing.assert_array_equal(got, stack.max(0).astype(np.float32))
