"""Benchmark: end-to-end plate pipeline throughput (the north-star workload).

Workload (BASELINE.json): multi-well plate of Z stacks through
zproj -> GMM cell-area -> tiled-UNet segmentation (patch 320, filters
64-128-256-512, 8x D4 TTA) -> Morse branch analysis, at production
geometry (1024x1024 wells, Z=8), via tmat_tpu.tools.plate_pipeline.

Prints ONE JSON line: {"metric", "value" (wells/sec end-to-end), "unit",
"vs_baseline"}. The reference publishes no throughput numbers
(BASELINE.md), so vs_baseline compares against the pinned CPU baseline in
BASELINE_CPU.json — the measured CPU time of the dominant stage (the tiled
UNet forwards) ONLY, which favors the CPU side: the real CPU pipeline adds
zproj/GMM/Sato/Morse on top.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", str(Path.home() / ".cache" / "jax_bench")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
# The bench must measure the SHIPPED artifacts: a developer's package.cfg
# (auto-written by any CLI drive) would otherwise redirect
# defs.model_training_path to their scratch base dir — and a tiny scratch
# checkpoint_1.msgpack then fails to load into the production template.
# Env beats package.cfg in defs._read_user_base_dir; point it at a fresh
# temp dir so every lookup falls back per-file to the packaged tree.
if "TMAT_TPU_BASE_DIR" not in os.environ:
    # stable per-user path under the user's own home (NOT a predictable
    # /tmp path another local user could pre-create and seed with rogue
    # package.cfg/checkpoints); repeated runs must not accumulate leaked
    # directories; concurrent runs share it harmlessly (config-copy
    # bootstrap writes identical content). Duplicated in bench_matrix.py /
    # __graft_entry__.py because it must run BEFORE any tmat_tpu import.
    _base = os.path.join(
        os.path.expanduser("~"), ".cache", "tmat_tpu", "neutral_base"
    )
    os.makedirs(_base, mode=0o700, exist_ok=True)
    os.environ["TMAT_TPU_BASE_DIR"] = _base

# Production plates are 96 wells; at 6 wells the measurement is mostly
# pipeline ramp/tail (the device pipeline is ~105 ms/well of compute, but
# the first chunk pays H2D + dispatch round trips with nothing to overlap
# them: 6 wells measured 6.5 wells/sec vs 7.4 at 12 and 7.65 at 24 in the
# same session). 24 wells approaches steady state while keeping the bench
# under a few seconds of timed work.
N_WELLS = 24
IMG_SIZE = 1024
N_Z = 8
DS_RATIO = 0.625
PATCH = 320
FILTERS = (64, 128, 256, 512)

_BASELINE_FILE = Path(__file__).parent / "BASELINE_CPU.json"


def _make_segmentor(dtype):
    from tmat_tpu.core import defs
    from tmat_tpu.models.unet import UNetXceptionPatchSegmentor

    # the SHIPPED production checkpoint (same FLOPs as random weights, but
    # perf and quality claims should exercise the same artifact end-to-end)
    ckpt = defs.model_training_path(
        "binary_segmentation/checkpoints/checkpoint_1.msgpack"
    )
    return UNetXceptionPatchSegmentor(
        PATCH,
        ckpt if Path(ckpt).is_file() else None,
        FILTERS,
        ds_ratio=DS_RATIO,
        dtype=dtype,
    )


def _synthetic_plate(n_wells: int, rng) -> np.ndarray:
    """Vessel-network-like plate (uint8, the native microscopy dtype)."""
    h = w = IMG_SIZE
    rr, cc = np.mgrid[0:h, 0:w]
    plate = rng.rand(n_wells, N_Z, h, w).astype(np.float32) * 10
    for i in range(n_wells):
        ring = (
            np.abs(np.sqrt((rr - h / 2) ** 2 + (cc - w / 2) ** 2) - (h / 3 + 10 * i))
            < 4
        )
        plate[i, N_Z // 2][ring] += 180
        plate[i, N_Z // 2, h // 2 - 2 : h // 2 + 2, 100:-100] += 150
    return np.clip(plate, 0, 255).astype(np.uint8)


def run_plate_workload(n_wells: int, dtype=None, n_reps: int = 3) -> dict:
    import jax
    import jax.numpy as jnp

    from tmat_tpu.tools.plate_pipeline import run_plate

    if dtype is None:
        on_tpu = jax.devices()[0].platform != "cpu"
        dtype = jnp.bfloat16 if on_tpu else jnp.float32

    segmentor = _make_segmentor(dtype)
    rng = np.random.RandomState(0)
    config = {"image_width_microns": 1200.0}

    # warmup/compile on a plate of the SAME shape so the timed run hits
    # fully-compiled programs
    warm = _synthetic_plate(n_wells, rng)
    run_plate(warm, [f"warm{i}" for i in range(len(warm))], segmentor, config)

    plate = _synthetic_plate(n_wells, rng)
    ids = [f"W{i}" for i in range(n_wells)]
    # median of n_reps fully-warm runs, with min/max spread recorded: the
    # dev tunnel's dispatch/H2D weather swings 2-3x between minutes, and
    # best-of-N systematically flatters — median keeps BENCH_r* rounds
    # comparable while the spread makes the weather visible (VERDICT r3
    # weak #5)
    throughputs = []
    for _ in range(n_reps):
        start = time.perf_counter()
        results = run_plate(plate, ids, segmentor, config)
        throughputs.append(n_wells / (time.perf_counter() - start))
    timer = results.pop("_timer")
    print(timer.report(), flush=True)
    return {
        "median": float(np.median(throughputs)),
        "best": max(throughputs),
        "spread": [min(throughputs), max(throughputs)],
        "n_reps": n_reps,
        # last rep's per-stage totals (seconds): postprocess attribution
        # for benchmarks/postprocess_profile.py
        "stage_totals": dict(timer.totals),
    }


def main():
    stats = run_plate_workload(N_WELLS)
    throughput = stats["median"]

    vs_baseline = None
    if _BASELINE_FILE.is_file():
        baseline = json.loads(_BASELINE_FILE.read_text())
        # prefer the honest full-pipeline CPU pin (all stages on the CPU
        # backend, measured by bench_matrix.py --pin-cpu-baseline); fall
        # back to the round-1 UNet-stage-only pin
        cpu = baseline.get("cpu_full_pipeline_wells_per_sec") or baseline.get(
            "cpu_wells_per_sec"
        )
        if cpu:
            vs_baseline = throughput / cpu

    print(
        json.dumps(
            {
                "metric": "plate_pipeline_end_to_end_throughput",
                "value": round(throughput, 4),
                "unit": "wells/sec (zproj+area+UNet-seg+morse, 1024px wells, Z=8)",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
                "value_median": round(stats["median"], 4),
                "value_best": round(stats["best"], 4),
                "n_reps": stats["n_reps"],
                "spread": [round(v, 4) for v in stats["spread"]],
            }
        )
    )


if __name__ == "__main__":
    main()
