"""Real-process CLI goldens for zproj / cell_area / inv_depth (VERDICT r4 #5).

test_cold_start.py pins compute_branches as two real processes; this file
applies the same recipe to the OTHER three tools — fresh subprocesses on
real TIFF inputs, pinned exit codes and output bytes, and the cold->warm
AOT/compile census asserted — so the cold-start/AOT/base-dir plumbing of
every CLI surface (the reference's primary UX, cli.py:176-187) has an
end-to-end pin, not just in-process algorithm tests.

Output pins: the max-projection TIFFs are asserted BYTE-EXACT against
numpy's reduction (integer max has one right answer), and each tool's
CSV is asserted byte-identical between the cold (compiled) and warm
(deserialized-executable) processes — the same discipline as
test_cold_start.py's compile/deserialize-boundary check.
"""

import csv
import json
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest
from PIL import Image

_ZPROJ_AREA = textwrap.dedent(
    """
    import json, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    import matplotlib
    matplotlib.use("Agg")
    from tmat_tpu.tools import compute_zproj
    from tmat_tpu.core import aot_cache

    in_dir, out_dir = sys.argv[1:3]
    # --area chains cell-area on the projections in the same process
    # (reference compute_zproj.py:98-119)
    compute_zproj.main(argv=[in_dir, out_dir, "-m", "max", "--area"])
    print("AOT_STATS=" + json.dumps(aot_cache.stats))
    """
)

_INV_DEPTH = textwrap.dedent(
    """
    import json, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    import matplotlib
    matplotlib.use("Agg")
    from tmat_tpu.tools import compute_inv_depth
    from tmat_tpu.core import aot_cache

    in_dir, out_dir, cfg = sys.argv[1:4]
    compute_inv_depth.main(argv=[in_dir, out_dir, "-c", cfg])
    print("AOT_STATS=" + json.dumps(aot_cache.stats))
    """
)


def _env(tmp_path):
    env = dict(os.environ)
    env.update(
        TMAT_TPU_BASE_DIR=str(tmp_path / "base"),
        TMAT_TPU_AOT_CACHE="1",
        TMAT_TPU_AOT_CACHE_DIR=str(tmp_path / "aot"),
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        JAX_LOG_COMPILES="1",
    )
    return env


def _run(code, argv, env, timeout=900):
    proc = subprocess.run(
        [sys.executable, "-c", code, *map(str, argv)],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    stats = None
    for line in proc.stdout.splitlines():
        if line.startswith("AOT_STATS="):
            stats = json.loads(line[len("AOT_STATS="):])
    assert stats is not None, "tool process did not report AOT stats:\n" + proc.stdout
    compiled = [l for l in proc.stderr.splitlines() if "Compiling " in l]
    return stats, compiled


def _census_cold_warm(stats1, c1, stats2, c2, warm_bound):
    """The shared cold->warm assertions (same shape as test_cold_start)."""
    n1, n2 = len(c1), len(c2)
    assert stats1["misses"] >= 1 and stats1["hits"] == 0, stats1
    # census liveness: a wording change in JAX_LOG_COMPILES must fail
    # loudly, not silently disable the warm guard below
    assert n1 >= stats1["misses"], (stats1, n1)
    assert stats2["misses"] == 0, stats2
    assert stats2["hits"] == stats1["misses"], (stats1, stats2)
    assert n2 <= warm_bound, (
        f"warm-AOT fresh process compiled {n2} programs (bound {warm_bound}):\n"
        + "\n".join(c2[:60])
    )


@pytest.mark.slow
def test_zproj_area_chain_real_process_cold_then_warm(tmp_path):
    rng = np.random.RandomState(3)
    in_dir = tmp_path / "in"
    stacks = {}
    for w in range(2):
        well = f"A{w + 1:02d}"
        stack = rng.randint(10, 60, size=(4, 96, 96)).astype(np.uint8)
        stack[w % 4, 20:50, 20:50] = 220  # bright cells patch
        d = in_dir / well
        d.mkdir(parents=True)
        for z, sl in enumerate(stack):
            Image.fromarray(sl).save(d / f"{well}_z{z:02d}.tif")
        stacks[well] = stack

    env = _env(tmp_path)
    out1, out2 = tmp_path / "out1", tmp_path / "out2"
    stats1, n1 = _run(_ZPROJ_AREA, [in_dir, out1], env)
    stats2, n2 = _run(_ZPROJ_AREA, [in_dir, out2], env)

    # integer max projection has exactly one right answer: byte-exact
    for well, stack in stacks.items():
        for out in (out1, out2):
            got = np.asarray(Image.open(out / f"{well}_max.tif"))
            np.testing.assert_array_equal(got, stack.max(0))

    # chained cell-area CSV: present, well-formed, byte-identical across
    # the compile/deserialize boundary
    rows = {}
    for out in (out1, out2):
        csv_path = out / "calculations" / "cell_area.csv"
        assert csv_path.is_file()
        with open(csv_path) as f:
            rows[out] = list(csv.DictReader(f))
    # row order follows input discovery order (not lexicographic)
    assert sorted(r["image_id"] for r in rows[out1]) == sorted(
        f"{w}_max" for w in stacks
    )
    assert all(0 <= float(r["area_pct"]) <= 100 for r in rows[out1])
    csv1 = (out1 / "calculations" / "cell_area.csv").read_bytes()
    csv2 = (out2 / "calculations" / "cell_area.csv").read_bytes()
    assert csv1 == csv2

    # round-4 zero-glue result holds for this chain too (commit c59f987)
    _census_cold_warm(stats1, n1, stats2, n2, warm_bound=2)


def _setup_inv_base(tmp_path, n_models=2, inp=64):
    """Tiny ranked ensemble in the user base dir (shipped-layout contract)."""
    from tmat_tpu.models.params_io import save_params
    from tmat_tpu.models.resnet import build_resnet50_tl

    mt = tmp_path / "base" / "model_training"
    ens = mt / "best_ensemble"
    ens.mkdir(parents=True)
    (mt / "invasion_depth_best_hp.json").write_text(
        json.dumps(
            {
                "adam_beta_1": 0.9,
                "adam_beta_2": 0.99,
                "fine_tune_lr": 1e-4,
                "frozen_lr": 1e-4,
                "last_resnet_layer": "conv4_block6_out",
            }
        )
    )
    (mt / "invasion_depth_training_values.json").write_text(
        json.dumps(
            {
                "cls_thresh": 0.5,
                "resnet_inp_shape": [inp, inp, 3],
                "n_models": n_models,
                "rs_seed": "None",
            }
        )
    )
    for i, loss in enumerate(np.linspace(0.4, 0.2, n_models)):
        with open(ens / f"best_model_history_{i}.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["val_loss", "training_stage"])
            w.writeheader()
            w.writerow({"val_loss": loss, "training_stage": "finetune"})
    for i in range(n_models):
        _, variables = build_resnet50_tl(
            1, (inp, inp, 3), base_last_layer="conv4_block6_out", seed=i
        )
        save_params(ens / f"best_finetune_weights_{i}.msgpack", variables)


@pytest.mark.slow
def test_inv_depth_real_process_cold_then_warm(tmp_path):
    _setup_inv_base(tmp_path)

    rng = np.random.RandomState(11)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    stack = rng.randint(0, 255, size=(3, 80, 80)).astype(np.uint8)
    frames = [Image.fromarray(s) for s in stack]
    frames[0].save(in_dir / "well1.tif", save_all=True, append_images=frames[1:])

    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({"n_pred_models": 2}))

    env = _env(tmp_path)
    out1, out2 = tmp_path / "out1", tmp_path / "out2"
    stats1, n1 = _run(_INV_DEPTH, [in_dir, out1, cfg], env)
    stats2, n2 = _run(_INV_DEPTH, [in_dir, out2, cfg], env)

    rows = {}
    for out in (out1, out2):
        csv_path = out / "invasion_depth_predictions.csv"
        assert csv_path.is_file()
        with open(csv_path) as f:
            rows[out] = list(csv.DictReader(f))
        assert len(rows[out]) == 3  # one row per Z slice
        for r in rows[out]:
            p = float(r["Invasion Probability"])
            assert 0.0 <= p <= 1.0
            assert r["Invasion Prediction (0=no 1=yes)"] in ("0", "1")

    csv1 = (out1 / "invasion_depth_predictions.csv").read_bytes()
    csv2 = (out2 / "invasion_depth_predictions.csv").read_bytes()
    assert csv1 == csv2

    # ensemble forward + prep tail are AOT-managed (round-4 wiring)
    _census_cold_warm(stats1, n1, stats2, n2, warm_bound=4)
