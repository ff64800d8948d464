"""Benchmark: tiled-UNet segmentation throughput (the headline workload).

Workload: the compute_branches 2-D hot path on production geometry —
1024x1024 wells, ds_ratio 0.625 -> 640x640, UNet-Xception patch segmentor
(patch 320, filters 64-128-256-512), smooth spline-blend tiling with
8x D4 TTA (200 patch forwards per well) — run as the fused device pipeline
in tmat_tpu.ops.tiled.

Prints ONE JSON line: {"metric", "value" (wells/sec), "unit",
"vs_baseline"}. The reference publishes no throughput numbers
(BASELINE.md), so vs_baseline is measured against the pinned CPU baseline
in BASELINE_CPU.json: the SAME workload executed on this machine's CPU
backend (the reference pipeline is CPU-bound TF/NumPy; this is the
fairest available stand-in, and the driver's north star is >20x CPU).
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import numpy as np

# Persistent compilation cache: first-ever bench run pays the (multi-minute
# remote) XLA compile; subsequent runs hit the cache.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", str(Path.home() / ".cache" / "jax_bench")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

N_WARMUP = 1
N_IMAGES = 6
IMG_SIZE = 1024
DS_RATIO = 0.625
PATCH = 320
FILTERS = (64, 128, 256, 512)

_BASELINE_FILE = Path(__file__).parent / "BASELINE_CPU.json"


def _build_pred_fn(dtype):
    import jax.numpy as jnp

    from tmat_tpu.models.unet import build_unet_xception

    model, variables = build_unet_xception(
        1, (PATCH, PATCH), channels=1, filter_counts=FILTERS, dtype=dtype
    )

    def pred_fn(batch):
        return model.apply(variables, batch, train=False)

    return pred_fn


def run_workload(n_images: int, dtype=None) -> float:
    """Returns wells/sec for the fused tiled segmentation pipeline."""
    import jax
    import jax.numpy as jnp

    from tmat_tpu.ops.resize import resize, target_shape_for_ratio
    from tmat_tpu.ops.tiled import predict_img_with_smooth_windowing

    if dtype is None:
        on_tpu = jax.devices()[0].platform != "cpu"
        dtype = jnp.bfloat16 if on_tpu else jnp.float32

    pred_fn = _build_pred_fn(dtype)
    rng = np.random.RandomState(0)
    target = target_shape_for_ratio((IMG_SIZE, IMG_SIZE), DS_RATIO)

    def one(img):
        small = resize(jnp.asarray(img), target, "lanczos")
        return predict_img_with_smooth_windowing(small, PATCH, 2, pred_fn)

    # warmup/compile
    img = rng.rand(IMG_SIZE, IMG_SIZE).astype(np.float32)
    for _ in range(N_WARMUP):
        jax.block_until_ready(one(img))

    imgs = [rng.rand(IMG_SIZE, IMG_SIZE).astype(np.float32) for _ in range(n_images)]
    start = time.perf_counter()
    for img in imgs:
        out = one(img)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start
    return n_images / elapsed


def main():
    throughput = run_workload(N_IMAGES)

    vs_baseline = None
    if _BASELINE_FILE.is_file():
        baseline = json.loads(_BASELINE_FILE.read_text())
        cpu = baseline.get("cpu_wells_per_sec")
        if cpu:
            vs_baseline = throughput / cpu

    print(
        json.dumps(
            {
                "metric": "tiled_unet_segmentation_throughput",
                "value": round(throughput, 4),
                "unit": "wells/sec (1024px well, 320px patches, 8x TTA)",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
