"""Discrete-Morse kernel tests: C++ vs NumPy oracle + structural checks."""

import numpy as np
import pytest

from tmat_tpu.topo import dmtgraph as dg


def _ridge_image(h=24, w=24):
    """Two bright maxima joined by a dimmer ridge (persistent saddle).

    The 1-unstable manifold seeds at edges whose union-find merge kills a
    component born at a much brighter value — i.e. the saddle along the
    connecting bar — and traces into both maxima.
    """
    img = np.zeros((h, w), np.float32)
    img[h // 2, 2 : w - 2] = 100.0  # connecting bar
    img[h // 2, 2] = 200.0  # maximum 1
    img[h // 2, w - 3] = 200.0  # maximum 2
    img += 1.0  # keep values nonzero (zero-valued vertices are dropped)
    return img


def test_native_library_builds():
    assert dg._get_lib() is not None, "C++ dmtgraph kernel failed to build"


def test_cpp_matches_numpy_on_ridge():
    img = _ridge_image()
    v_c, e_c = dg.compute_dmt_graph(img, 5.0, 0.0)
    v_np, e_np = dg.compute_dmt_graph_numpy(img, 5.0, 0.0)
    np.testing.assert_array_equal(v_c, v_np)
    np.testing.assert_array_equal(e_c, e_np)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("delta1,delta2", [(1.0, 0.0), (5.0, 0.0), (2.0, 10.0)])
def test_cpp_matches_numpy_random(seed, delta1, delta2):
    rng = np.random.RandomState(seed)
    img = (rng.rand(16, 18) * 50).astype(np.float32)
    img[img < 5] = 0  # exercise the zero-vertex filter
    v_c, e_c = dg.compute_dmt_graph(img, delta1, delta2)
    v_np, e_np = dg.compute_dmt_graph_numpy(img, delta1, delta2)
    np.testing.assert_array_equal(v_c, v_np)
    np.testing.assert_array_equal(e_c, e_np)


def test_ridge_produces_path_graph():
    img = _ridge_image()
    verts, edges = dg.compute_dmt_graph(img, 5.0, 0.0)
    assert len(verts) > 10
    assert len(edges) >= len(verts) - 2
    # skeleton vertices concentrate on the ridge row
    rows = verts[:, 0]
    assert (np.abs(rows - 12) <= 6).mean() > 0.9


def test_blank_image_empty_graph():
    img = np.zeros((16, 16), np.float32)
    verts, edges = dg.compute_dmt_graph(img, 1.0, 0.0)
    assert len(verts) == 0 and len(edges) == 0


def test_delta2_suppresses_dim_structures():
    img = _ridge_image()
    v_lo, e_lo = dg.compute_dmt_graph(img, 5.0, 0.0)
    # delta2 above the ridge brightness removes everything
    v_hi, e_hi = dg.compute_dmt_graph(img, 5.0, 150.0)
    assert len(e_hi) == 0
    assert len(e_lo) > 0
