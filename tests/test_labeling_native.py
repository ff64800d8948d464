"""Native CCL/regionprops engine vs its NumPy/scipy oracles.

csrc/labeling.cpp must be label-raster bit-equal to scipy.ndimage.label
and numerically equal (to fp accumulation order) to the NumPy
region_properties / filter_branch_seg_mask fallbacks it replaces.
"""

import numpy as np
import pytest
from scipy import ndimage

import tmat_tpu.topo.labeling_native as ln
from tmat_tpu.topo import regionprops as rp

pytestmark = pytest.mark.skipif(
    not ln.available(), reason="no C++ toolchain for the native engine"
)


def _force_fallback(monkeypatch):
    monkeypatch.setattr(ln, "_BUILD_FAILED", True)
    monkeypatch.setattr(ln, "_LIB", None)


def _random_masks():
    rng = np.random.RandomState(0)
    for density in (0.3, 0.5, 0.7):
        yield (rng.rand(96, 128) > density).astype(np.uint8)
    # structured: lines + blob + isolated pixels
    m = np.zeros((120, 120), np.uint8)
    m[60, 5:115] = 1
    m[10:110, 40] = 1
    m[20:40, 80:100] = 1
    m[[3, 3, 100], [3, 110, 3]] = 1
    yield m
    yield np.zeros((50, 50), np.uint8)  # empty
    yield np.ones((50, 50), np.uint8)  # full


@pytest.mark.parametrize("connectivity", [1, 2])
def test_label_matches_scipy_numbering(connectivity):
    for m in _random_masks():
        labs, n = ln.label_native(m, connectivity)
        structure = ndimage.generate_binary_structure(2, connectivity)
        want, wn = ndimage.label(m, structure=structure)
        assert n == wn
        np.testing.assert_array_equal(labs, want)


def test_region_props_match_numpy_oracle(monkeypatch):
    props = ("area", "perimeter", "eccentricity", "equivalent_diameter_area")
    for m in _random_masks():
        labs, n = ln.label_native(m, 2)
        if n == 0:
            continue
        native = ln.region_props_native(labs, n, props)
        with monkeypatch.context() as mp:
            _force_fallback(mp)
            oracle = rp.region_properties(labs, n, props=props)
        for k in props:
            np.testing.assert_allclose(
                native[k], oracle[k], rtol=1e-9, atol=1e-9, err_msg=k
            )


def test_perimeter_isolated_per_region(monkeypatch):
    """Diagonally adjacent components must not mix border codes (the
    reason the NumPy fallback crops per bounding box)."""
    m = np.zeros((8, 8), np.uint8)
    m[1:3, 1:3] = 1
    m[3:5, 3:5] = 1  # touches the first only diagonally -> conn=1 separates
    labs, n = ln.label_native(m, 1)
    assert n == 2
    native = ln.region_props_native(labs, n, ("perimeter",))
    with monkeypatch.context() as mp:
        _force_fallback(mp)
        oracle = rp.region_properties(labs, n, props=("perimeter",))
    np.testing.assert_allclose(native["perimeter"], oracle["perimeter"])


def test_branch_filter_matches_python(monkeypatch):
    import jax.numpy as jnp

    from tmat_tpu.ops.morphology import skeletonize
    from tmat_tpu.topo import transforms as tf

    rng = np.random.RandomState(2)
    m = np.zeros((160, 160), np.uint8)
    m[80, 10:150] = 1
    m[10:150, 60] = 1
    m[40:60, 100:120] = 1  # solid blob: circular -> dropped
    m |= (rng.rand(160, 160) > 0.93).astype(np.uint8)
    skel = np.asarray(skeletonize(jnp.asarray(m > 0)))

    for remove_isolated in (False, True):
        native = tf.filter_branch_seg_mask(
            m.copy(), footprint=None, remove_isolated=remove_isolated,
            precomputed_skeleton=skel,
        )
        with monkeypatch.context() as mp:
            _force_fallback(mp)
            oracle = tf.filter_branch_seg_mask(
                m.copy(), footprint=None, remove_isolated=remove_isolated,
                precomputed_skeleton=skel,
            )
        np.testing.assert_array_equal(native, oracle)
    # something must actually have been dropped for the test to bite
    assert native.sum() < m.sum()


def test_remove_small_objects_matches(monkeypatch):
    for m in _random_masks():
        labs, n = ln.label_native(m, 2)
        native = rp.remove_small_objects(labs, 5)
        with monkeypatch.context() as mp:
            _force_fallback(mp)
            oracle = rp.remove_small_objects(labs, 5)
        np.testing.assert_array_equal(native, oracle)


def test_regionprops_image_roundtrip():
    """The 3-D branches path's ecc * diameter raster must agree between
    the native-backed rp.regionprops_image and a direct skimage-style
    computation."""
    rng = np.random.RandomState(3)
    m = (rng.rand(64, 64) > 0.8).astype(np.uint8)
    ecc = rp.regionprops_image(m, "eccentricity")
    eqd = rp.regionprops_image(m, "equivalent_diameter_area")
    labs, n = rp.label(m)
    for lab in range(1, n + 1):
        rows, cols = np.nonzero(labs == lab)
        mu20, mu02, mu11 = rp._region_moments(
            rows.astype(float), cols.astype(float)
        )
        want_ecc = rp.eccentricity_from_moments(mu20, mu02, mu11)
        np.testing.assert_allclose(
            ecc[rows[0], cols[0]], want_ecc, rtol=1e-9, atol=1e-9
        )
        np.testing.assert_allclose(
            eqd[rows[0], cols[0]], np.sqrt(4 * len(rows) / np.pi), rtol=1e-9
        )
