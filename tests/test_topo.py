"""MorseGraph, regionprops, and mask-filtering tests."""

import matplotlib

matplotlib.use("Agg")

import networkx as nx
import numpy as np
import pytest
from networkx.exception import NetworkXPointlessConcept
from scipy import ndimage

from tmat_tpu.topo import regionprops as rp
from tmat_tpu.topo import transforms as tf
from tmat_tpu.topo.morse import MorseGraph


def _vessel_image(h=64, w=64, rng=None):
    """Y-shaped bright structure on noisy background."""
    rng = rng or np.random.RandomState(0)
    img = rng.rand(h, w).astype(np.float32) * 5
    img[32, 4:60] += 200  # trunk
    img[10:32, 20] += 180  # branch up
    img[32:55, 44] += 160  # branch down
    img = ndimage.gaussian_filter(img, 1.2)
    return img


class TestRegionprops:
    def test_perimeter_square(self):
        mask = np.zeros((20, 20), bool)
        mask[5:15, 5:15] = True
        # skimage perimeter of a 10x10 square is 4*(10-1) = 36
        assert rp.perimeter(mask) == pytest.approx(36.0)

    def test_area_and_equiv_diameter(self):
        mask = np.zeros((20, 20), bool)
        mask[2:6, 2:6] = True
        labels, n = rp.label(mask)
        props = rp.region_properties(labels, n)
        assert props["area"][0] == 16
        assert props["equivalent_diameter_area"][0] == pytest.approx(
            np.sqrt(4 * 16 / np.pi)
        )

    def test_eccentricity_line_vs_square(self):
        mask = np.zeros((20, 20), bool)
        mask[10, 2:18] = True  # line: ecc -> 1
        labels, n = rp.label(mask)
        ecc_line = rp.region_properties(labels, n)["eccentricity"][0]
        assert ecc_line > 0.99

        mask2 = np.zeros((20, 20), bool)
        mask2[5:15, 5:15] = True  # square: ecc = 0
        labels2, n2 = rp.label(mask2)
        ecc_sq = rp.region_properties(labels2, n2)["eccentricity"][0]
        assert ecc_sq < 0.01

    def test_regionprops_image(self):
        mask = np.zeros((16, 16), bool)
        mask[2:4, 2:4] = True  # area 4
        mask[8:12, 8:12] = True  # area 16
        img = rp.regionprops_image(mask, "area")
        assert img[2, 2] == 4
        assert img[9, 9] == 16
        assert img[0, 0] == 0

    def test_remove_small_objects(self):
        mask = np.zeros((16, 16), bool)
        mask[0, 0] = True
        mask[8:12, 8:12] = True
        labels, _ = rp.label(mask)
        out = rp.remove_small_objects(labels, min_size=4)
        assert out[0, 0] == 0
        assert out[9, 9] > 0


class TestSkeletonGraph:
    def test_line_graph(self):
        skel = np.zeros((10, 10), bool)
        skel[5, 1:9] = True
        g = tf.nx_graph_from_binary_skeleton(skel)
        assert g.number_of_nodes() == 8
        assert g.number_of_edges() == 7
        degrees = sorted(d for _, d in g.degree)
        assert degrees == [1, 1] + [2] * 6

    def test_diagonal_weights(self):
        skel = np.eye(5, dtype=bool)
        g = tf.nx_graph_from_binary_skeleton(skel)
        for _, _, w in g.edges(data="weight"):
            assert w == pytest.approx(np.sqrt(2))

    def test_isolated_nodes_included(self):
        skel = np.zeros((8, 8), bool)
        skel[1, 1] = True
        skel[5, 3:6] = True
        g = tf.nx_graph_from_binary_skeleton(skel)
        assert g.number_of_nodes() == 4


class TestFilterBranchSegMask:
    def test_circular_blob_removed_branchy_kept(self):
        mask = np.zeros((64, 64), np.uint8)
        # circular blob (no forks, high circularity)
        rr, cc = np.mgrid[0:64, 0:64]
        mask[(rr - 16) ** 2 + (cc - 48) ** 2 <= 36] = 1
        # Y-shaped branchy structure (3px wide to survive the median filter)
        mask[40:43, 4:60] = 1
        mask[10:41, 20:23] = 1
        out = tf.filter_branch_seg_mask(mask.copy())
        assert out[16, 48] == 0  # blob removed
        assert out[41, 30] == 1  # branchy structure kept

    def test_remove_isolated_false_keeps_line(self):
        mask = np.zeros((32, 32), np.uint8)
        mask[16:19, 4:28] = 1  # fork-free bar
        kept = tf.filter_branch_seg_mask(mask.copy(), None, remove_isolated=False)
        removed = tf.filter_branch_seg_mask(mask.copy(), None, remove_isolated=True)
        assert kept.sum() > 0
        assert removed.sum() == 0

    def test_median_filter_footprint_matches_scipy(self, rng):
        img = rng.rand(24, 24).astype(np.float32)
        from tmat_tpu.ops.morphology import disk

        got = tf.median_filter_footprint(img, disk(2))
        expected = ndimage.median_filter(
            img, footprint=disk(2).astype(bool), mode="nearest"
        )
        np.testing.assert_allclose(got, expected, atol=1e-6)


class TestRemoveSmallIslands:
    def test_fill_and_drop(self):
        mask = np.ones((32, 32), np.uint8)
        mask[10, 10] = 0  # small hole -> filled
        mask[:5, :] = 0
        mask[0, 0] = 1  # small island -> dropped
        out = tf.remove_small_islands(mask, min_area0=4, min_area1=4)
        assert out[10, 10] == 1
        assert out[0, 0] == 0


class TestMorseGraph:
    def test_vessel_skeleton_branches(self):
        img = _vessel_image()
        mg = MorseGraph(
            img, thresholds=(5, 10), smoothing_window=5, min_branch_length=5
        )
        # DMT unstable manifold traces paths between distinct maxima
        # (junction-to-junction along the trunk here)
        assert len(mg.barcode) >= 1
        total = mg.get_total_branch_length()
        avg = mg.get_average_branch_length()
        assert total > 20
        assert 0 < avg <= total
        # skeleton hugs the trunk row
        V = mg._vertices[[n for n in mg._G.nodes]]
        assert (np.abs(V[:, 0] - 32) < 3).mean() > 0.9

    def test_ring_traced_via_loop_persistence(self):
        """A bright ring is a 1-cycle: edge-triangle persistence seeds the
        manifold and the skeleton follows the whole ring."""
        rng = np.random.RandomState(1)
        img = rng.rand(64, 64).astype(np.float32) * 3
        rr, cc = np.mgrid[0:64, 0:64]
        ring = np.abs(np.sqrt((rr - 32.0) ** 2 + (cc - 32.0) ** 2) - 20) < 2
        img[ring] += 200
        img = ndimage.gaussian_filter(img, 1.0)
        mg = MorseGraph(img, (5, 10), smoothing_window=5, min_branch_length=5)
        V = mg._vertices[[n for n in mg._G.nodes]]
        radii = np.sqrt((V[:, 0] - 32) ** 2 + (V[:, 1] - 32) ** 2)
        assert len(V) > 40
        assert (np.abs(radii - 20) < 4).mean() > 0.9
        assert mg.get_total_branch_length() > 80

    def test_blank_flows_through_with_zero_branches(self):
        # reference parity: an empty Morse graph produces a 0-branch result
        # (the reference writes a 0-row, it does not raise)
        img = np.zeros((32, 32), np.float32)
        mg = MorseGraph(img, thresholds=(5, 10))
        assert mg.barcode == []
        assert mg.get_total_branch_length() == 0
        assert mg.get_average_branch_length() == 0

    def test_pruning_mask_removes_masked_branches(self):
        img = _vessel_image()
        no_prune = MorseGraph(
            img, thresholds=(5, 10), smoothing_window=5, min_branch_length=5
        )
        prune_all = np.ones(img.shape, bool)
        pruned = MorseGraph(
            img,
            thresholds=(5, 10),
            smoothing_window=5,
            min_branch_length=5,
            pruning_mask=prune_all,
        )
        assert len(pruned.barcode) == 0
        assert len(no_prune.barcode) > 0

    def test_min_branch_length_filters(self):
        img = _vessel_image()
        short = MorseGraph(img, (5, 10), min_branch_length=2, smoothing_window=5)
        long = MorseGraph(img, (5, 10), min_branch_length=40, smoothing_window=5)
        assert len(long.barcode) <= len(short.barcode)

    def test_barcode_birth_death_ordering(self):
        img = _vessel_image()
        mg = MorseGraph(img, (5, 10), smoothing_window=5, min_branch_length=5)
        for birth, death in mg.barcode:
            assert death >= birth

    def test_plots_render(self, tmp_path):
        import matplotlib.pyplot as plt

        img = _vessel_image()
        mg = MorseGraph(img, (5, 10), smoothing_window=5, min_branch_length=5)
        fig, ax = plt.subplots()
        mg.plot_colored_barcode(ax=ax)
        fig.savefig(tmp_path / "barcode.png")
        fig2, ax2 = plt.subplots()
        mg.plot_colored_tree(ax=ax2)
        fig2.savefig(tmp_path / "tree.png")
        plt.close("all")
        assert (tmp_path / "barcode.png").stat().st_size > 0


def test_vectorized_eccentricity_matches_per_region_loop():
    """region_properties' bincount-moment eccentricity must equal the
    per-region extraction math (regionprops.py _region_moments) for every
    component of a dense many-component raster."""
    from scipy import ndimage

    rng = np.random.RandomState(7)
    mask = rng.rand(150, 170) > 0.88
    labels, n = rp.label(mask)

    want = np.zeros(n)
    for i, sl in enumerate(ndimage.find_objects(labels)):
        if sl is None:
            continue
        sub = labels[sl] == (i + 1)
        rows, cols = np.nonzero(sub)
        if len(rows) > 0:
            want[i] = rp.eccentricity_from_moments(
                *rp._region_moments(rows, cols)
            )

    got = rp.region_properties(labels, n, props=("eccentricity",))[
        "eccentricity"
    ]
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)
