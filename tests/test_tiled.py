"""Fused tiled-inference tests against the reference blending algorithm."""

import numpy as np
import jax.numpy as jnp

from tmat_tpu.ops import tiled


def test_spline_window_properties():
    w = tiled.spline_window(32)
    assert len(w) == 32
    np.testing.assert_allclose(w.mean(), 1.0, atol=1e-6)  # normalized by average
    # shifted copies at step=w/2 tile to a constant (perfect overlap-add)
    cover = np.zeros(64)
    for k in range(3):
        cover[k * 16 : k * 16 + 32] += w
    np.testing.assert_allclose(cover[16:48], cover[16], atol=1e-6)


def test_identity_model_recovers_image(rng):
    """With pred = identity, blended output must equal the input exactly
    (the spline windows sum to subdivisions^2 everywhere)."""
    img = rng.rand(50, 70).astype(np.float32)

    def identity(batch):
        return batch

    out = np.asarray(
        tiled.predict_img_with_smooth_windowing(
            jnp.asarray(img), window_size=16, subdivisions=2, pred_func=identity
        )
    )
    assert out.shape == img.shape
    np.testing.assert_allclose(out, img, atol=1e-4)


def test_constant_model(rng):
    img = rng.rand(40, 40).astype(np.float32)

    def const(batch):
        return jnp.full_like(batch, 0.25)

    out = np.asarray(
        tiled.predict_img_with_smooth_windowing(
            jnp.asarray(img), 16, 2, const
        )
    )
    np.testing.assert_allclose(out, 0.25, atol=1e-5)


def test_equivariant_model_matches_direct(rng):
    """For a D4-equivariant local model (3x3 mean), tiled TTA inference must
    reproduce the direct full-image result away from borders."""
    from tmat_tpu.ops.filters import sepconv2d

    img = rng.rand(48, 48).astype(np.float32)
    k = np.array([1 / 3, 1 / 3, 1 / 3], np.float32)

    def blur_model(batch):
        return sepconv2d(batch[..., 0], k, k, mode="reflect")[..., None]

    out = np.asarray(
        tiled.predict_img_with_smooth_windowing(jnp.asarray(img), 16, 2, blur_model)
    )
    direct = np.asarray(sepconv2d(jnp.asarray(img), k, k, mode="reflect"))
    # small residual comes from each patch's own border padding, damped by
    # the spline window — inherent to the reference algorithm as well
    np.testing.assert_allclose(out[4:-4, 4:-4], direct[4:-4, 4:-4], atol=5e-3)


def test_window_2d_shape():
    w2 = tiled.window_2d(16)
    assert w2.shape == (16, 16, 1)
    assert w2.max() <= 4.0


def test_tta_levels_identity_recovery(rng):
    """The opt-in tta=4/1 fast modes must preserve the blend/inverse
    alignment: with pred = identity every tta level reconstructs the
    input (a misordered inverse transform would blend rotated copies)."""
    img = rng.rand(48, 64).astype(np.float32)

    def identity(batch):
        return batch

    for tta in (1, 4, 8):
        out = np.asarray(
            tiled.predict_img_with_smooth_windowing(
                jnp.asarray(img), window_size=16, subdivisions=2,
                pred_func=identity, tta=tta,
            )
        )
        np.testing.assert_allclose(out, img, atol=1e-5, err_msg=f"tta={tta}")


def test_tta_invalid_rejected():
    import pytest

    with pytest.raises(ValueError):
        tiled.predict_img_with_smooth_windowing(
            jnp.zeros((32, 32)), window_size=16, subdivisions=2,
            pred_func=lambda b: b, tta=3,
        )


def test_tta8_matches_default(rng):
    """tta=8 IS the default path (same compiled program key semantics)."""
    img = rng.rand(40, 40).astype(np.float32)

    def blurish(batch):
        return batch * 0.5 + 0.1

    a = np.asarray(
        tiled.predict_img_with_smooth_windowing(
            jnp.asarray(img), 16, 2, blurish
        )
    )
    b = np.asarray(
        tiled.predict_img_with_smooth_windowing(
            jnp.asarray(img), 16, 2, blurish, tta=8
        )
    )
    np.testing.assert_array_equal(a, b)


def test_production_patch_batch_sizes():
    """Pin the per-well UNet batch at the production geometries.

    The exact-coverage padded canvas sets the patch grid: a 1024-px well
    at ds_ratio 0.625 (640-px canvas, patch 320, subdivisions 2) pads to
    960 px -> 5x5 grid x 8 TTA = batch 200 — so the batch-200 roofline
    measurements (BASELINE.md) ARE the headline plate geometry. 512-px
    wells (320-px canvas -> 640 padded) run 3x3 x 8 = batch 72
    (benchmarks/batch_mfu.py measures that point of the batch curve).
    """
    import jax

    seen = []

    def probe(b):
        seen.append(tuple(b.shape))
        return b[..., :1]

    for canvas, expected in ((640, 200), (320, 72)):
        seen.clear()
        img = jnp.zeros((canvas, canvas), jnp.float32)
        jax.eval_shape(lambda x: tiled._tiled_core(x, probe, 320, 2, 1, 8), img)
        assert seen == [(expected, 320, 320, 1)], (canvas, seen)
