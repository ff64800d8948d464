"""Cross-process cold-start behavior of the tool surface (VERDICT r3 #1).

The in-process tests in test_aot_cache.py simulate process freshness by
clearing the memo; this file proves the real thing: two SEPARATE python
processes run `compute_branches` end-to-end on the same geometry, and the
second is served its heavy program (the tiled UNet pipeline) from the
deserialized executable with zero AOT misses. This is the structural
answer to the reference's instant-start CLI
(fl_tissue_model_tools/cli.py:176-184 — no compile step at all).
"""

import json
import os
import subprocess
import sys
import textwrap

import pytest

PATCH = 32

_RUN_TOOL = textwrap.dedent(
    """
    import json, sys
    # the image's sitecustomize registers the TPU PJRT plugin with a
    # priority that overrides the JAX_PLATFORMS env var (see
    # tests/conftest.py); the config update wins regardless
    import jax
    jax.config.update("jax_platforms", "cpu")
    import matplotlib
    matplotlib.use("Agg")
    from tmat_tpu.tools import compute_branches
    from tmat_tpu.core import aot_cache

    in_dir, out_dir, stack_dir, out3d_dir = sys.argv[1:5]
    compute_branches.main(argv=[
        in_dir, out_dir, "--image-width-microns", "1000", "--no-vis",
    ])
    # 3-D Sato path in the same process (separate input root: the tool
    # requires files XOR dirs per root)
    compute_branches.main(argv=[
        stack_dir, out3d_dir, "--image-width-microns", "1000", "--no-vis",
    ])
    print("AOT_STATS=" + json.dumps(aot_cache.stats))
    """
)


def _setup_base(base, tmp_path):
    """User base dir holding a tiny patch segmentor (the shipped-layout
    contract of defs.model_training_path)."""
    import numpy as np

    from tmat_tpu.models.params_io import save_params
    from tmat_tpu.models.unet import build_unet_xception

    cfg_dir = base / "model_training" / "binary_segmentation" / "configs"
    ckpt_dir = base / "model_training" / "binary_segmentation" / "checkpoints"
    cfg_dir.mkdir(parents=True)
    ckpt_dir.mkdir(parents=True)
    _, variables = build_unet_xception(
        1, (PATCH, PATCH), channels=1, filter_counts=(8, 16)
    )
    save_params(ckpt_dir / "checkpoint_1.msgpack", variables)
    (cfg_dir / "unet_patch_segmentor_1.json").write_text(
        json.dumps(
            {
                "patch_size": PATCH,
                "checkpoint_file": "checkpoint_1.msgpack",
                "filter_counts": [8, 16],
                "ds_ratio": 1.0,
                "channels": 1,
            }
        )
    )

    from PIL import Image
    from scipy import ndimage

    rng = np.random.RandomState(0)
    img = rng.rand(128, 128).astype(np.float32) * 10
    rr, cc = np.mgrid[0:128, 0:128]
    ring = np.abs(np.sqrt((rr - 64.0) ** 2 + (cc - 64.0) ** 2) - 40) < 3
    img[ring] += 180
    img[64, 24:104] += 150
    img = np.clip(ndimage.gaussian_filter(img, 1.0), 0, 255).astype(np.uint8)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    Image.fromarray(img).save(in_dir / "wellA.tif")

    # one small z-stack for the 3-D Sato path (dir-of-slices layout)
    stack_dir = tmp_path / "in3d" / "stackA"
    stack_dir.mkdir(parents=True)
    for z in range(3):
        sl = np.roll(img, z * 2, axis=0)
        Image.fromarray(sl).save(stack_dir / f"stackA_z{z:02d}.tif")
    return in_dir, tmp_path / "in3d"


def _run(in_dir, out_dir, in3d_dir, out3d_dir, env) -> tuple:
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            _RUN_TOOL,
            str(in_dir),
            str(out_dir),
            str(in3d_dir),
            str(out3d_dir),
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert (out_dir / "branching_analysis.csv").is_file(), proc.stdout
    assert (out3d_dir / "branching_analysis.csv").is_file(), proc.stdout
    # JAX_LOG_COMPILES census: every backend compile logs one line
    n_compiles = proc.stderr.count("Compiling ")
    for line in proc.stdout.splitlines():
        if line.startswith("AOT_STATS="):
            return json.loads(line[len("AOT_STATS="):]), n_compiles
    pytest.fail("tool process did not report AOT stats:\n" + proc.stdout)


@pytest.mark.slow
def test_second_process_runs_with_zero_aot_misses(tmp_path):
    base = tmp_path / "base"
    in_dir, in3d_dir = _setup_base(base, tmp_path)

    env = dict(os.environ)
    env.update(
        TMAT_TPU_BASE_DIR=str(base),
        TMAT_TPU_AOT_CACHE="1",
        TMAT_TPU_AOT_CACHE_DIR=str(tmp_path / "aot"),
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        JAX_LOG_COMPILES="1",
    )

    stats1, n_compiles1 = _run(
        in_dir, tmp_path / "out1", in3d_dir, tmp_path / "o3d1", env
    )
    # the 2-D tiled pipeline + the three 3-D Sato-path programs at minimum
    assert stats1["misses"] >= 4, stats1
    assert stats1["hits"] == 0, stats1
    # census liveness: the cold run MUST log at least one "Compiling " line
    # per AOT miss — if a JAX upgrade changes the JAX_LOG_COMPILES wording,
    # this fails loudly instead of silently disabling the n_compiles2 guard
    # below (which can otherwise only ever fail in the too-many direction)
    assert n_compiles1 >= stats1["misses"], (
        f"compile census looks dead: {n_compiles1} 'Compiling ' lines for "
        f"{stats1['misses']} AOT misses — JAX_LOG_COMPILES format changed?"
    )

    stats2, n_compiles2 = _run(
        in_dir, tmp_path / "out2", in3d_dir, tmp_path / "o3d2", env
    )
    assert stats2["misses"] == 0, (
        "a fresh process at a warmed geometry must be served every "
        f"AOT-managed program from disk: {stats2}"
    )
    assert stats2["hits"] == stats1["misses"], stats2
    # the round-4 glue-elimination result (cold-start census, BASELINE.md):
    # with every AOT-managed program a disk hit, a fresh process compiles
    # ZERO XLA programs end-to-end — every eager jnp dispatch outside the
    # fused programs has been removed from both tool paths. Small headroom
    # for backend-version quirks; observed value is 0.
    assert n_compiles2 <= 2, (
        f"warm-AOT fresh process compiled {n_compiles2} programs; the "
        "tool paths must stay free of eager op dispatches"
    )

    # identical outputs across the compile/deserialize boundary
    for a, b in (("out1", "out2"), ("o3d1", "o3d2")):
        csv1 = (tmp_path / a / "branching_analysis.csv").read_bytes()
        csv2 = (tmp_path / b / "branching_analysis.csv").read_bytes()
        assert csv1 == csv2
