"""Marginal per-stage cost of the production UNet forward.

The axon tunnel adds a ~30 ms dispatch/fetch floor per program
(benchmarks/unet_blockprof.py measured even a pure copy at ~35 ms), so
isolated per-op timings are meaningless. Here each stage is applied to
k DISTINCT inputs inside ONE jitted program whose output is a scalar
sum of means; the marginal cost is (t(k_hi) - t(k_lo)) / (k_hi - k_lo),
which cancels the dispatch floor and the fetch round-trip.

Usage: python benchmarks/unet_marginal.py [--batch 200]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def fetch_sync(out):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))


def timeit(fn, *args, repeats=5):
    fetch_sync(fn(*args))
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
    ap.add_argument("--klo", type=int, default=1)
    ap.add_argument("--khi", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    dtype = jnp.dtype(args.dtype)
    B = args.batch
    filters = (64, 128, 256, 512)
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    print(f"device={jax.devices()[0].device_kind} batch={B} dtype={dtype} "
          f"k={args.klo}->{args.khi}")

    class SepConv(nn.Module):
        features: int

        @nn.compact
        def __call__(self, x):
            c = x.shape[-1]
            x = nn.Conv(c, (3, 3), feature_group_count=c, padding="SAME",
                        use_bias=False, dtype=dtype, name="depthwise")(x)
            return nn.Conv(self.features, (1, 1), padding="SAME", dtype=dtype,
                           name="pointwise")(x)

    class Entry(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(filters[0], (3, 3), strides=2, padding="SAME",
                        dtype=dtype)(x)
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                             dtype=dtype)(x)
            return nn.relu(x)

    class DownBlock(nn.Module):
        features: int
        first: bool = False

        @nn.compact
        def __call__(self, x):
            prev = x
            if not self.first:
                x = nn.relu(x)
            x = SepConv(self.features)(x)
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                             dtype=dtype)(x)
            x = nn.relu(x)
            x = SepConv(self.features)(x)
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                             dtype=dtype)(x)
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
            x = nn.ConvTranspose(self.features, (3, 3), padding="SAME",
                                 dtype=dtype)(x)
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                             dtype=dtype)(x)
            x = nn.relu(x)
            x = nn.ConvTranspose(self.features, (3, 3), padding="SAME",
                                 dtype=dtype)(x)
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                             dtype=dtype)(x)
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            res = jnp.repeat(
                jnp.repeat(nn.Conv(self.features, (1, 1), padding="SAME",
                                   dtype=dtype)(prev), 2, axis=1), 2, axis=2)
            return x + res

    class Head(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(1, (3, 3), padding="SAME", dtype=dtype)(x)
            return nn.sigmoid(x.astype(jnp.float32))

    stages = [
        ("entry 320->160 @64", Entry(), (B, 320, 320, 1)),
        ("down1 160->80 @128", DownBlock(filters[1], first=True),
         (B, 160, 160, 64)),
        ("down2 80->40 @256", DownBlock(filters[2]), (B, 80, 80, 128)),
        ("down3 40->20 @512", DownBlock(filters[3]), (B, 40, 40, 256)),
        ("up1 20->40 @512", UpBlock(filters[3]), (B, 20, 20, 512)),
        ("up2 40->80 @256", UpBlock(filters[2]), (B, 40, 40, 512)),
        ("up3 80->160 @128", UpBlock(filters[1]), (B, 80, 80, 256)),
        ("up4 160->320 @64", UpBlock(filters[0]), (B, 160, 160, 128)),
        ("head 320 @64->1", Head(), (B, 320, 320, 64)),
    ]

    def marginal(mod, shape):
        x0 = jnp.asarray(rng.rand(*shape), dtype)
        variables = mod.init(key, x0)

        def make(k):
            # k distinct inputs -> k independent applications, one program
            xs = [jnp.asarray(rng.rand(*shape), dtype) for _ in range(k)]

            @jax.jit
            def f(v, *xs):
                return sum(jnp.mean(mod.apply(v, x).astype(jnp.float32))
                           for x in xs)

            return f, xs

        flo, xlo = make(args.klo)
        tlo = timeit(flo, variables, *xlo, repeats=args.repeats)
        fhi, xhi = make(args.khi)
        thi = timeit(fhi, variables, *xhi, repeats=args.repeats)
        return (thi - tlo) / (args.khi - args.klo)

    total = 0.0
    for name, mod, shape in stages:
        dt = marginal(mod, shape)
        total += dt
        print(f"{name:24s} {dt * 1e3:8.2f} ms marginal")
    print(f"{'sum of stages':24s} {total * 1e3:8.2f} ms")

    # bandwidth yardstick at the down1 activation shape
    shape = (B, 160, 160, 128)

    def make_copy(k):
        xs = [jnp.asarray(rng.rand(*shape), dtype) for _ in range(k)]

        @jax.jit
        def f(*xs):
            return sum(jnp.mean((x * jnp.asarray(1.0001, dtype))
                                .astype(jnp.float32)) for x in xs)

        return f, xs

    flo, xlo = make_copy(args.klo)
    fhi, xhi = make_copy(args.khi)
    dt = (timeit(fhi, *xhi, repeats=args.repeats)
          - timeit(flo, *xlo, repeats=args.repeats)) / (args.khi - args.klo)
    gb = np.prod(shape) * jnp.dtype(dtype).itemsize / 1e9
    print(f"{'scale yardstick (1.3GB rd)':24s} {dt * 1e3:8.2f} ms marginal "
          f"= {gb / dt:.0f} GB/s read")


if __name__ == "__main__":
    main()
