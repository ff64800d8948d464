"""End-to-end CLI goldens on the reference's real sample TIFFs (VERDICT r3 #5).

test_real_data_goldens.py pins Morse statistics at the MorseGraph surface;
this file pins the FULL tool: `compute_branches` run as a real process on
the reference's two sample vessel masks
(/root/reference/notebooks/topology/sample_data/), exercising the whole
2-D path above MorseGraph — lanczos4 ds_ratio resize, intensity rescale,
tiled UNet segmentation with the SHIPPED checkpoint, component filter,
medial-axis distance weighting, 384-px downsample, Morse sweep, UTF-16 CSV
(tools/compute_branches.py, reference scripts/compute_branches.py:144-489).

Golden values were produced by this same pipeline (tta=1, fixed default
thresholds) — they are regression pins for the plumbing, not reference
parity (the reference's trained weights are a missing LFS blob; our
segmentor is the shipped synthetic-trained checkpoint, caveat in
BASELINE.md). Branch counts are pinned exactly; lengths to 1e-3 relative
(fp-noise headroom across BLAS/XLA point releases).
"""

import csv
import os
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

from tests.real_data import sample_dir, samples_unavailable_reason

SAMPLE_DIR = sample_dir()

from tmat_tpu.core import defs

_CKPT = Path(
    defs.model_training_path("binary_segmentation/checkpoints/checkpoint_1.msgpack")
)

# hash-verified locate (tests/real_data.py): a wrong or corrupted sample
# skips with the mismatching hash instead of failing with golden diffs
_UNAVAILABLE = samples_unavailable_reason()
if _UNAVAILABLE is None and not _CKPT.is_file():
    _UNAVAILABLE = "shipped checkpoint not available"
pytestmark = pytest.mark.skipif(_UNAVAILABLE is not None, reason=str(_UNAVAILABLE))

# (image_id, n_branches, total_um, avg_um) at --image-width-microns 1000,
# default thresholds (5, 10), tta=1, shipped checkpoint_1.msgpack
GOLDENS = {
    "mask": (116, 11928.810570769567, 102.83457388594455),
    "D5_1_ZProj_002_mask": (209, 12928.19125359381, 61.85737441910914),
}

_RUN = textwrap.dedent(
    """
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    import matplotlib
    matplotlib.use("Agg")
    from tmat_tpu.tools import compute_branches
    compute_branches.main(argv=[
        sys.argv[1], sys.argv[2],
        "--image-width-microns", "1000", "--no-vis", "--tta", "1",
    ])
    """
)


@pytest.mark.slow
def test_compute_branches_cli_goldens_on_reference_tiffs(tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for name in ("mask.tif", "D5_1_ZProj_002_mask.tif"):
        (in_dir / name).write_bytes((SAMPLE_DIR / name).read_bytes())
    out_dir = tmp_path / "out"

    # fresh single-device process: the conftest's virtual 8-device CPU
    # build differs from a plain build in last-ulp XLA lowering, and the
    # goldens were pinned single-device (same rationale as the PIL resize
    # in test_real_data_goldens.py)
    env = dict(os.environ)
    env.update(
        TMAT_TPU_BASE_DIR=str(tmp_path / "base"),  # pkg-tree fallback
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
    )
    proc = subprocess.run(
        [sys.executable, "-c", _RUN, str(in_dir), str(out_dir)],
        capture_output=True,
        text=True,
        timeout=1500,
        env=env,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr

    csv_path = out_dir / "branching_analysis.csv"
    with open(csv_path, encoding="utf-16") as f:  # reference CSV encoding
        rows = {r["Image"]: r for r in csv.DictReader(f)}

    assert set(rows) == set(GOLDENS)
    for image_id, (n_gold, total_gold, avg_gold) in GOLDENS.items():
        row = rows[image_id]
        assert int(row["Total # of branches"]) == n_gold, row
        assert float(row["Total branch length (µm)"]) == pytest.approx(
            total_gold, rel=1e-3
        )
        assert float(row["Average branch length (µm)"]) == pytest.approx(
            avg_gold, rel=1e-3
        )
