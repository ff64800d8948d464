"""Per-block wall-time attribution for the production UNet forward.

Times each stage of the UNetXception forward (entry conv, the three
down blocks, the four up blocks, head) in isolation at the exact
production shapes (patch 320, filters 64-128-256-512, batch 200, bf16),
plus the individual ops inside down block 1 — the bandwidth-bound
segment identified by the round-3 roofline analysis in BASELINE.md.

Sync method: value-fetch (copy one output element to host) — on the
axon tunnel runtime `block_until_ready` is not a reliable barrier
(ROADMAP round-3 notes).

Usage: python benchmarks/unet_blockprof.py [--batch 200] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def fetch_sync(out):
    """Force completion by fetching one element to host."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def timeit(fn, *args, repeats=5):
    out = fn(*args)
    fetch_sync(out)  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fetch_sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=200)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    dtype = jnp.dtype(args.dtype)
    B = args.batch
    filters = (64, 128, 256, 512)
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    print(f"device={jax.devices()[0].device_kind} batch={B} dtype={dtype}")

    # ---- stage harness: each stage is an isolated module timed at its
    # production input shape ----
    class Entry(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(filters[0], (3, 3), strides=2, padding="SAME", dtype=dtype)(x)
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, dtype=dtype)(x)
            return nn.relu(x)

    class SepConv(nn.Module):
        features: int

        @nn.compact
        def __call__(self, x):
            in_ch = x.shape[-1]
            x = nn.Conv(in_ch, (3, 3), feature_group_count=in_ch, padding="SAME",
                        use_bias=False, dtype=dtype, name="depthwise")(x)
            return nn.Conv(self.features, (1, 1), padding="SAME", dtype=dtype,
                           name="pointwise")(x)

    class DownBlock(nn.Module):
        features: int
        first: bool = False

        @nn.compact
        def __call__(self, x):
            prev = x
            if not self.first:
                x = nn.relu(x)
            x = SepConv(self.features)(x)
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, dtype=dtype)(x)
            x = nn.relu(x)
            x = SepConv(self.features)(x)
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, dtype=dtype)(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
            res = nn.Conv(self.features, (1, 1), strides=2, padding="SAME",
                          dtype=dtype)(prev)
            return x + res

    class UpBlock(nn.Module):
        features: int

        @nn.compact
        def __call__(self, x):
            prev = x
            x = nn.relu(x)
            x = nn.ConvTranspose(self.features, (3, 3), padding="SAME", dtype=dtype)(x)
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, dtype=dtype)(x)
            x = nn.relu(x)
            x = nn.ConvTranspose(self.features, (3, 3), padding="SAME", dtype=dtype)(x)
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, dtype=dtype)(x)
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            res = jnp.repeat(
                jnp.repeat(nn.Conv(self.features, (1, 1), padding="SAME",
                                   dtype=dtype)(prev), 2, axis=1), 2, axis=2)
            return x + res

    stages = [
        ("entry 320->160 @64", Entry(), (B, 320, 320, 1)),
        ("down1 160->80 @128", DownBlock(filters[1], first=True), (B, 160, 160, 64)),
        ("down2 80->40 @256", DownBlock(filters[2]), (B, 80, 80, 128)),
        ("down3 40->20 @512", DownBlock(filters[3]), (B, 40, 40, 256)),
        ("up1 20->40 @512", UpBlock(filters[3]), (B, 20, 20, 512)),
        ("up2 40->80 @256", UpBlock(filters[2]), (B, 40, 40, 512)),
        ("up3 80->160 @128", UpBlock(filters[1]), (B, 80, 80, 256)),
        ("up4 160->320 @64", UpBlock(filters[0]), (B, 160, 160, 128)),
    ]

    total = 0.0
    for name, mod, shape in stages:
        x = jnp.asarray(rng.rand(*shape), dtype)
        variables = mod.init(key, x)
        fn = jax.jit(lambda v, x, mod=mod: mod.apply(v, x))
        dt = timeit(fn, variables, x, repeats=args.repeats)
        total += dt
        print(f"{name:24s} {dt * 1e3:8.2f} ms")
    print(f"{'sum of stages':24s} {total * 1e3:8.2f} ms")

    # ---- op-level attribution inside down1 (the roofline-bound segment) ----
    print("\ndown1 op-level (input (B,160,160,64)):")
    x64 = jnp.asarray(rng.rand(B, 160, 160, 64), dtype)
    x128 = jnp.asarray(rng.rand(B, 160, 160, 128), dtype)

    def op(name, mod, x):
        variables = mod.init(key, x)
        fn = jax.jit(lambda v, x: mod.apply(v, x))
        dt = timeit(fn, variables, x, repeats=args.repeats)
        print(f"  {name:30s} {dt * 1e3:8.2f} ms")
        return dt

    class Depthwise(nn.Module):
        @nn.compact
        def __call__(self, x):
            c = x.shape[-1]
            return nn.Conv(c, (3, 3), feature_group_count=c, padding="SAME",
                           use_bias=False, dtype=dtype)(x)

    class Pointwise(nn.Module):
        features: int

        @nn.compact
        def __call__(self, x):
            return nn.Conv(self.features, (1, 1), padding="SAME", dtype=dtype)(x)

    class MaxPool(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

    class Residual(nn.Module):
        features: int

        @nn.compact
        def __call__(self, x):
            return nn.Conv(self.features, (1, 1), strides=2, padding="SAME",
                           dtype=dtype)(x)

    op("depthwise 3x3 @64ch", Depthwise(), x64)
    op("pointwise 64->128", Pointwise(128), x64)
    op("depthwise 3x3 @128ch", Depthwise(), x128)
    op("pointwise 128->128", Pointwise(128), x128)
    op("maxpool 3x3 s2 @128", MaxPool(), x128)
    op("residual 1x1 s2 64->128", Residual(128), x64)
    op("sepconv 64->128 (dw+pw)", SepConv(128), x64)

    # raw bandwidth yardstick: a pure copy of the down1 activation
    def copy_fn(x):
        return x + jnp.asarray(1, dtype)

    cp = jax.jit(copy_fn)
    dt = timeit(cp, x128, repeats=args.repeats)
    gb = x128.size * x128.dtype.itemsize * 2 / 1e9
    print(f"  {'copy yardstick (B,160,160,128)':30s} {dt * 1e3:8.2f} ms "
          f"= {gb / dt:.0f} GB/s effective")


if __name__ == "__main__":
    main()
