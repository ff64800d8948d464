"""Probe: does XLA-TPU fuse the w8a8 epilogue (dequant-scale + bias + relu
+ requant) into int8 convs, or does it materialize f32 intermediates?

Compares, with the chained-scan methodology of int8_probe.py:
  1. bf16 conv + bias + relu            (the production epilogue)
  2. int8 conv alone (requant-only carry, minimal epilogue)
  3. int8 conv + full w8a8 epilogue     (dequant f32, *eff, +b, relu, requant)
  4. same as 3 but elementwise in bf16

If (3) ~= (2) + epsilon, the epilogue fuses and int8 should win end to end;
if (3) blows past (1), the requant chain is materializing.

Also probes the two suspects from the end-to-end loss:
  5. int8 depthwise conv vs bf16 depthwise (160x160x64)
  6. int8 conv_transpose vs bf16 conv_transpose (40x40x256)

Usage: python benchmarks/int8_fusion_probe.py [--chain 24] [--repeats 3]
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
from jax import lax

DN = ("NHWC", "HWIO", "NHWC")


def fetch_sync(out):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))


def bench(fn, sets, repeats, k):
    fetch_sync(fn(*sets[0]))
    best = float("inf")
    for r in range(repeats):
        s = sets[(r + 1) % len(sets)]
        t0 = time.perf_counter()
        fetch_sync(fn(*s))
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def chained(step, k):
    @jax.jit
    def f(x, w):
        def body(c, _):
            return step(c, w), ()

        c, _ = lax.scan(body, x, None, length=k)
        return c.ravel()[0]

    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=24)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    k = args.chain
    print(f"device={jax.devices()[0].device_kind} chain={k}", flush=True)

    B, H, W, C = 200, 80, 80, 128  # mid UNet shape
    eff = jnp.asarray(np.random.RandomState(1).rand(C) * 0.01, jnp.float32)
    bias = jnp.asarray(np.random.RandomState(2).randn(C), jnp.float32)
    inv_sx = jnp.float32(37.3)

    def conv(x, w, pet):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=DN,
            preferred_element_type=pet)

    def mk(dtype, shp=(B, H, W, C), ks=(3, 3, C, C)):
        def m(seed):
            r = np.random.RandomState(seed)
            if dtype == jnp.int8:
                return (jnp.asarray(r.randint(-127, 128, shp), jnp.int8),
                        jnp.asarray(r.randint(-127, 128, ks), jnp.int8))
            return (jnp.asarray(r.randn(*shp), dtype),
                    jnp.asarray(r.randn(*ks), dtype))
        return m

    def requant(y):
        return jnp.clip(jnp.round(y * inv_sx), -127, 127).astype(jnp.int8)

    steps = {
        "1 bf16 conv+bias+relu": (
            lambda c, w: jax.nn.relu(
                conv(c, w, jnp.float32) + bias).astype(jnp.bfloat16),
            mk(jnp.bfloat16),
        ),
        "2 int8 conv, min epilogue": (
            lambda c, w: jnp.clip(
                conv(c, w, jnp.int32) // 1024, -127, 127).astype(jnp.int8),
            mk(jnp.int8),
        ),
        "3 int8 conv + f32 epilogue": (
            lambda c, w: requant(jax.nn.relu(
                conv(c, w, jnp.int32).astype(jnp.float32) * eff + bias)),
            mk(jnp.int8),
        ),
        "4 int8 conv + bf16 epilogue": (
            lambda c, w: requant(jax.nn.relu(
                conv(c, w, jnp.int32).astype(jnp.bfloat16) * eff.astype(jnp.bfloat16)
                + bias.astype(jnp.bfloat16)).astype(jnp.float32)),
            mk(jnp.int8),
        ),
    }

    flops = 2 * B * H * W * 9 * C * C
    for name, (step, mker) in steps.items():
        fn = chained(step, k)
        sets = [mker(100 + i) for i in range(3)]
        for s in sets:
            for a in s:
                fetch_sync(a)
        t = bench(fn, sets, args.repeats, k)
        print(f"{name:32s} {t * 1e3:7.2f} ms ({flops / t / 1e12:6.1f} TOP/s)",
              flush=True)

    # 5. depthwise 160x160x64
    Bd, Hd, Wd, Cd = 200, 160, 160, 64

    def dwconv(x, w, pet):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", feature_group_count=Cd,
            dimension_numbers=DN, preferred_element_type=pet)

    for name, dtype, pet, cast in [
        ("5 bf16 depthwise 160px 64ch", jnp.bfloat16, jnp.float32,
         lambda y: y.astype(jnp.bfloat16)),
        ("5 int8 depthwise 160px 64ch", jnp.int8, jnp.int32,
         lambda y: jnp.clip(y // 16, -127, 127).astype(jnp.int8)),
    ]:
        def step(c, w, pet=pet, cast=cast):
            return cast(dwconv(c, w, pet))

        def m(seed, dtype=dtype):
            r = np.random.RandomState(seed)
            if dtype == jnp.int8:
                return (jnp.asarray(r.randint(-127, 128, (Bd, Hd, Wd, Cd)), jnp.int8),
                        jnp.asarray(r.randint(-127, 128, (3, 3, 1, Cd)), jnp.int8))
            return (jnp.asarray(r.randn(Bd, Hd, Wd, Cd), dtype),
                    jnp.asarray(r.randn(3, 3, 1, Cd), dtype))

        fn = chained(step, k)
        sets = [m(100 + i) for i in range(3)]
        for s in sets:
            for a in s:
                fetch_sync(a)
        t = bench(fn, sets, args.repeats, k)
        print(f"{name:32s} {t * 1e3:7.2f} ms", flush=True)

    # 6. conv_transpose 40x40x256
    Bt, Ht, Wt, Ct = 200, 40, 40, 256

    def tconv(x, w, pet):
        return lax.conv_transpose(
            x, w, (1, 1), "SAME", dimension_numbers=DN,
            transpose_kernel=False, preferred_element_type=pet)

    tflops = 2 * Bt * Ht * Wt * 9 * Ct * Ct
    for name, dtype, pet, cast in [
        ("6 bf16 convT 40px 256ch", jnp.bfloat16, jnp.float32,
         lambda y: y.astype(jnp.bfloat16)),
        ("6 int8 convT 40px 256ch", jnp.int8, jnp.int32,
         lambda y: jnp.clip(y // 1024, -127, 127).astype(jnp.int8)),
    ]:
        def step(c, w, pet=pet, cast=cast):
            return cast(tconv(c, w, pet))

        def m(seed, dtype=dtype):
            r = np.random.RandomState(seed)
            if dtype == jnp.int8:
                return (jnp.asarray(r.randint(-127, 128, (Bt, Ht, Wt, Ct)), jnp.int8),
                        jnp.asarray(r.randint(-127, 128, (3, 3, Ct, Ct)), jnp.int8))
            return (jnp.asarray(r.randn(Bt, Ht, Wt, Ct), dtype),
                    jnp.asarray(r.randn(3, 3, Ct, Ct), dtype))

        fn = chained(step, k)
        sets = [m(100 + i) for i in range(3)]
        for s in sets:
            for a in s:
                fetch_sync(a)
        t = bench(fn, sets, args.repeats, k)
        print(f"{name:32s} {t * 1e3:7.2f} ms ({tflops / t / 1e12:6.1f} TOP/s)",
              flush=True)


if __name__ == "__main__":
    main()
