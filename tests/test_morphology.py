"""Morphology and Canny tests against scipy golden implementations."""

import numpy as np
import jax.numpy as jnp
from scipy import ndimage

from tmat_tpu.ops import morphology as m
from tmat_tpu.ops.canny import canny


def test_disk_footprint():
    d1 = m.disk(1)
    np.testing.assert_array_equal(d1, [[0, 1, 0], [1, 1, 1], [0, 1, 0]])
    assert m.disk(5).shape == (11, 11)


def test_erosion_matches_scipy(rng):
    mask = rng.rand(32, 32) > 0.4
    fp = m.disk(2).astype(bool)
    got = np.asarray(m.binary_erosion(jnp.asarray(mask), m.disk(2)))
    expected = ndimage.binary_erosion(mask, structure=fp, border_value=1)
    np.testing.assert_array_equal(got, expected)


def test_dilation_matches_scipy(rng):
    mask = rng.rand(32, 32) > 0.7
    fp = m.disk(2).astype(bool)
    got = np.asarray(m.binary_dilation(jnp.asarray(mask), m.disk(2)))
    expected = ndimage.binary_dilation(mask, structure=fp, border_value=0)
    np.testing.assert_array_equal(got, expected)


def test_closing_fills_small_hole():
    mask = np.ones((16, 16), bool)
    mask[8, 8] = False
    closed = np.asarray(m.binary_closing(jnp.asarray(mask), m.disk(2)))
    assert closed[8, 8]


def test_skeletonize_line_invariant():
    mask = np.zeros((20, 20), bool)
    mask[10, 2:18] = True
    skel = np.asarray(m.skeletonize(jnp.asarray(mask)))
    np.testing.assert_array_equal(skel, mask)


def test_skeletonize_thick_bar_to_thin():
    mask = np.zeros((24, 24), bool)
    mask[8:14, 2:22] = True
    skel = np.asarray(m.skeletonize(jnp.asarray(mask)))
    assert skel.sum() > 0
    # Thin: at most ~1-2 px per column in the bar's span
    cols = skel[:, 4:20].sum(axis=0)
    assert (cols <= 2).all() and cols.max() >= 1
    # Connectivity preserved: one connected component
    lbl, n = ndimage.label(skel, structure=np.ones((3, 3)))
    assert n == 1


def test_edt_matches_scipy(rng):
    mask = rng.rand(24, 24) > 0.3
    got = m.euclidean_distance_transform(mask)
    expected = ndimage.distance_transform_edt(mask)
    np.testing.assert_allclose(got, expected)


def test_gen_circ_mask_center():
    mask = m.gen_circ_mask((8, 8), 4, (16, 16), 255)
    assert mask[8, 8] == 255
    assert mask[0, 0] == 0
    assert mask[8, 12] == 255  # (col=12, row=8) within radius 4 of (8,8)


class TestCanny:
    def test_square_outline(self):
        img = np.zeros((32, 32), np.float32)
        img[8:24, 8:24] = 1.0
        edges = np.asarray(canny(jnp.asarray(img)))
        assert edges.sum() > 20
        # edge pixels cluster around the square boundary
        rows, cols = np.nonzero(edges)
        assert rows.min() >= 6 and rows.max() <= 25
        assert cols.min() >= 6 and cols.max() <= 25
        # interior far from border has no edges
        assert not edges[14:18, 14:18].any()

    def test_blank_image_no_edges(self):
        img = np.zeros((16, 16), np.float32)
        assert not np.asarray(canny(jnp.asarray(img))).any()

    def test_hysteresis_connects_weak(self):
        # gradient ramp: weak ring attached to strong edge survives
        img = np.zeros((32, 32), np.float32)
        img[:, 16:] = 1.0
        edges = np.asarray(canny(jnp.asarray(img), sigma=1.0))
        # vertical edge detected through the whole interior height
        assert edges[1:-1, 14:18].any(axis=1).sum() >= 28
