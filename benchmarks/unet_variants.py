"""UNet variant-ablation roofline table, ONE methodology (VERDICT r3 weak #4).

Round 3's per-variant table (BASELINE.md "UNet forward efficiency") mixed
two timing methods: the headline used value-fetch sync minus the measured
dispatch round trip, while the variant rows used uncorrected
block_until_ready timing that absorbed a 26-46 ms RTT into each op. This
re-measures every variant with the strongest method available on the
noisy axon tunnel: the *marginal* cost of one forward inside a k-replica
program ((t(khi) - t(klo)) / (khi - klo), distinct inputs so XLA cannot
CSE the replicas), which cancels both the dispatch floor and the fetch
round trip exactly (benchmarks/unet_marginal.py established the method).

Variants (architecture anchors: reference models.py:85-171):
  full        - the production UNetXception (patch 320, filters 64-512)
  no_bn       - BatchNorm layers removed
  no_depthwise- separable convs' depthwise 3x3 dropped (pointwise only)
  dense3x3    - separable convs replaced by dense 3x3 convs
  down_only   - entry + the three down blocks (no up path, no head)

Usage (on the TPU): python benchmarks/unet_variants.py [--batch 200]
Prints one JSON line per variant: marginal ms, FLOPs (XLA cost_analysis),
MFU vs the chip bf16 peak.
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

PEAK_BF16 = {"TPU v5 lite": 197e12, "TPU v5e": 197e12}


def fetch_sync(out):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))


def timeit(fn, *args, repeats=5):
    fetch_sync(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fetch_sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


class Variant(nn.Module):
    """UNetXception with ablation switches (mirrors models/unet.py)."""

    filters: tuple = (64, 128, 256, 512)
    use_bn: bool = True
    conv_kind: str = "separable"  # separable | pointwise_only | dense3x3
    down_only: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    def _sep(self, x, features):
        c = x.shape[-1]
        if self.conv_kind == "separable":
            x = nn.Conv(c, (3, 3), feature_group_count=c, padding="SAME",
                        use_bias=False, dtype=self.dtype)(x)
            return nn.Conv(features, (1, 1), padding="SAME", dtype=self.dtype)(x)
        if self.conv_kind == "pointwise_only":
            return nn.Conv(features, (1, 1), padding="SAME", dtype=self.dtype)(x)
        return nn.Conv(features, (3, 3), padding="SAME", dtype=self.dtype)(x)

    def _norm(self, x):
        if not self.use_bn:
            return x
        return nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                            dtype=self.dtype)(x)

    @nn.compact
    def __call__(self, x):
        up2 = lambda t: jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2)
        x = x.astype(self.dtype)
        x = nn.Conv(self.filters[0], (3, 3), strides=2, padding="SAME",
                    dtype=self.dtype)(x)
        x = self._norm(x)
        x = nn.relu(x)
        prev = x
        for i, f in enumerate(self.filters[1:]):
            if i != 0:
                x = nn.relu(x)
            x = self._sep(x, f)
            x = self._norm(x)
            x = nn.relu(x)
            x = self._sep(x, f)
            x = self._norm(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
            res = nn.Conv(f, (1, 1), strides=2, padding="SAME",
                          dtype=self.dtype)(prev)
            x = x + res
            prev = x
        if self.down_only:
            return x.astype(jnp.float32)
        for f in reversed(self.filters):
            x = nn.relu(x)
            x = nn.ConvTranspose(f, (3, 3), padding="SAME", dtype=self.dtype)(x)
            x = self._norm(x)
            x = nn.relu(x)
            x = nn.ConvTranspose(f, (3, 3), padding="SAME", dtype=self.dtype)(x)
            x = self._norm(x)
            x = up2(x)
            res = up2(nn.Conv(f, (1, 1), padding="SAME", dtype=self.dtype)(prev))
            x = x + res
            prev = x
        x = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype)(x)
        return nn.sigmoid(x.astype(jnp.float32))


def compiled_flops(fn, *args):
    try:
        an = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(an, (list, tuple)):
            an = an[0]
        return float(an.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=200)
    ap.add_argument("--patch", type=int, default=320)
    ap.add_argument("--klo", type=int, default=1)
    ap.add_argument("--khi", type=int, default=3)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    dev = jax.devices()[0]
    peak = next(
        (v for k, v in PEAK_BF16.items() if k in dev.device_kind), 197e12
    )
    print(f"device={dev.device_kind} batch={args.batch} patch={args.patch} "
          f"marginal k={args.klo}->{args.khi} best-of-{args.repeats}")

    variants = {
        "full": Variant(),
        "no_bn": Variant(use_bn=False),
        "no_depthwise": Variant(conv_kind="pointwise_only"),
        "dense3x3": Variant(conv_kind="dense3x3"),
        "down_only": Variant(down_only=True),
    }
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    shape = (args.batch, args.patch, args.patch, 1)

    for name, mod in variants.items():
        x0 = jnp.asarray(rng.rand(*shape), jnp.float32)
        variables = mod.init(key, x0)
        flops = compiled_flops(
            lambda v, x: jnp.mean(mod.apply(v, x)), variables, x0
        )

        def make(k):
            xs = [jnp.asarray(rng.rand(*shape), jnp.float32) for _ in range(k)]

            @jax.jit
            def f(v, *xs):
                return sum(jnp.mean(mod.apply(v, x)) for x in xs)

            return f, xs

        flo, xlo = make(args.klo)
        tlo = timeit(flo, variables, *xlo, repeats=args.repeats)
        fhi, xhi = make(args.khi)
        thi = timeit(fhi, variables, *xhi, repeats=args.repeats)
        dt = (thi - tlo) / (args.khi - args.klo)
        print(json.dumps({
            "variant": name,
            "marginal_ms": round(dt * 1e3, 1),
            "gflops": round(flops / 1e9, 1),
            "mfu_pct": round(100 * flops / (dt * peak), 1) if dt > 0 else None,
        }), flush=True)


if __name__ == "__main__":
    main()
