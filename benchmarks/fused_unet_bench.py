"""Head-to-head: fused Pallas UNet forward vs the standard Flax/XLA forward.

Runs both paths at the production geometry (patch 320, filters
64-128-256-512, bf16) on the current backend, value-fetch synced,
and checks output agreement (mask IoU at the 0.5 threshold).

Usage: python benchmarks/fused_unet_bench.py [--batch 200] [--repeats 5]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def fetch_sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def timeit(fn, *args, repeats=5):
    out = fn(*args)
    fetch_sync(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fetch_sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=200)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--patch", type=int, default=320)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from tmat_tpu.models.unet import build_unet_xception
    from tmat_tpu.ops.pallas_unet import make_fused_pred_fn

    filters = (64, 128, 256, 512)
    patch, B = args.patch, args.batch
    dtype = jnp.dtype(args.dtype)
    print(f"device={jax.devices()[0].device_kind} batch={B} patch={patch} "
          f"dtype={dtype}")

    model, variables = build_unet_xception(
        1, (patch, patch), channels=1, filter_counts=filters, seed=3
    )
    rng = np.random.RandomState(0)
    bs = jax.tree.map(
        lambda a: jnp.asarray(rng.uniform(0.2, 1.5, a.shape), jnp.float32),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": bs}
    x = jnp.asarray(rng.rand(B, patch, patch, 1), jnp.float32)

    cast_vars = jax.tree.map(lambda a: jnp.asarray(a, dtype), variables)

    @jax.jit
    def std_pred(batch):
        return model.apply(cast_vars, batch.astype(dtype), train=False)

    fused = jax.jit(make_fused_pred_fn(variables, filters, dtype=dtype))

    t_std, out_std = timeit(std_pred, x, repeats=args.repeats)
    t_fused, out_fused = timeit(fused, x, repeats=args.repeats)

    m_std = np.asarray(out_std, np.float32) > 0.5
    m_fused = np.asarray(out_fused, np.float32) > 0.5
    inter = np.logical_and(m_std, m_fused).sum()
    union = max(np.logical_or(m_std, m_fused).sum(), 1)
    diff = float(np.abs(np.asarray(out_std, np.float32)
                        - np.asarray(out_fused, np.float32)).max())

    print(f"standard forward : {t_std * 1e3:8.2f} ms "
          f"({B / t_std:7.0f} imgs/sec)")
    print(f"fused forward    : {t_fused * 1e3:8.2f} ms "
          f"({B / t_fused:7.0f} imgs/sec)")
    print(f"speedup          : {t_std / t_fused:6.2f}x")
    print(f"mask IoU         : {inter / union:.5f}  max|dp|={diff:.4f}")


if __name__ == "__main__":
    main()
