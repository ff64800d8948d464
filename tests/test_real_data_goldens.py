"""Real-data goldens: the reference's own sample vessel masks.

The reference ships two real microvessel segmentation TIFFs
(notebooks/topology/sample_data/) that its topology notebooks analyze;
these are the only real lab images in the checkout. Each test pins the
Morse branch statistics of the downsampled raster (the branches tool's
384-px working width, compute_branches.py:53) for all three engines:

  - hardcoded goldens, produced by the reference's own executed
    topology.py (numba/tqdm-shimmed) — so a regression shows up even
    when /root/reference is absent;
  - our Python MorseGraph == goldens;
  - the native C++ engine == goldens bit-for-bit vs our Python.

These inputs are what originally exposed the networkx subgraph-view
iteration-order divergence in the forest root selection (heavy ties on
binary masks) — synthetic rasters never hit it.
"""

from pathlib import Path

import numpy as np
import pytest

from tests.real_data import sample_dir, samples_unavailable_reason

SAMPLE_DIR = sample_dir()

# (filename, n_branches, total_len_px, avg_len_px) at thresholds (5, 10),
# smoothing_window 12, min_branch_length 12, after PIL-bilinear resize to
# 384^2 and rescale to 0..255 — values from the reference's executed
# topology.py (float64 sums; the reference accumulates float32 and agrees
# to ~1e-3).
GOLDENS = [
    ("mask.tif", 73, 4178.644770, 57.241709),
    ("D5_1_ZProj_002_mask.tif", 107, 4145.118237, 38.739423),
]

# hash-verified locate (tests/real_data.py): a wrong or corrupted sample
# skips with the mismatching hash instead of failing with golden diffs
_UNAVAILABLE = samples_unavailable_reason()
pytestmark = pytest.mark.skipif(_UNAVAILABLE is not None, reason=str(_UNAVAILABLE))


def _analysis_raster(name: str) -> np.ndarray:
    # deterministic host-side downsample (PIL bilinear): the goldens must
    # not depend on which XLA backend lowered the resize (the virtual
    # 8-device CPU mesh and a single-device run differ in last-ulp fp,
    # which shifts near-tie Morse branches on these binary masks)
    from PIL import Image

    with Image.open(SAMPLE_DIR / name) as im:
        small = np.asarray(
            im.resize((384, 384), Image.BILINEAR), dtype=np.float32
        )
    lo, hi = float(small.min()), float(small.max())
    return (small - lo) * np.float32(255.0 / (hi - lo))


_KW = dict(thresholds=(5, 10), smoothing_window=12, min_branch_length=12)


@pytest.mark.parametrize("name,n_gold,total_gold,avg_gold", GOLDENS)
def test_morsegraph_real_vessel_goldens(name, n_gold, total_gold, avg_gold):
    from tmat_tpu.topo.morse import MorseGraph

    mg = MorseGraph(_analysis_raster(name), **_KW)
    assert len(mg.barcode) == n_gold
    assert mg.get_total_branch_length() == pytest.approx(total_gold, abs=1e-3)
    assert mg.get_average_branch_length() == pytest.approx(avg_gold, abs=1e-4)


@pytest.mark.parametrize("name,n_gold,total_gold,avg_gold", GOLDENS)
def test_native_engine_real_vessel_goldens(name, n_gold, total_gold, avg_gold):
    from tmat_tpu.topo.morse_native import morse_stats_native

    stats = morse_stats_native(_analysis_raster(name), **_KW)
    if stats is None:
        pytest.skip("native Morse engine unavailable")
    n, total, avg = stats
    assert n == n_gold
    assert total == pytest.approx(total_gold, abs=1e-3)
    assert avg == pytest.approx(avg_gold, abs=1e-4)


@pytest.mark.parametrize("name", [g[0] for g in GOLDENS])
def test_reference_executed_matches_goldens(name):
    """Recompute the goldens from the reference's own topology.py (the
    oracle the numbers above were pinned from)."""
    from tests.test_reference_parity import REFERENCE_ROOT, _install_shims
    import sys

    if not (REFERENCE_ROOT / "fl_tissue_model_tools").is_dir():
        pytest.skip("reference package not importable")
    _install_shims()
    sys.path.insert(0, str(REFERENCE_ROOT))
    try:
        from fl_tissue_model_tools import topology as ref_topo
    finally:
        sys.path.remove(str(REFERENCE_ROOT))

    gold = {g[0]: g[1:] for g in GOLDENS}[name]
    mg = ref_topo.MorseGraph(_analysis_raster(name), **_KW)
    assert len(mg.barcode) == gold[0]
    # reference sums in float32: agree to the f32 print precision
    assert float(mg.get_total_branch_length()) == pytest.approx(gold[1], abs=0.01)
    assert float(mg.get_average_branch_length()) == pytest.approx(gold[2], abs=1e-4)
