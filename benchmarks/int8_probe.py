"""Probe: does this TPU runtime support s8xs8->s32 matmul/conv, and is it
faster than bf16 at UNet production shapes?

Measurement methodology (this tunnel runtime has a ~25-30 ms
dispatch+fetch round-trip floor and a same-input dispatch cache, so
naive per-op timing is meaningless):
  - each case chains K=32 ops inside ONE jitted lax.scan program, with a
    dtype cast between iterations so the carry matches the input spec;
    wall/K isolates per-op device time to ~1 ms accuracy
  - inputs are staged on-device and value-fetch-synced BEFORE the timer
  - repetitions use distinct pre-staged input sets (the dispatch cache
    serves repeated identical calls without running them)

Cases (UNet production shapes, batch 200):
  1. dot  (25600,512)@(512,512)     — up-path pointwise-equivalent GEMM
  2. conv 3x3 (200,40,40,256)->256  — up-path transpose-conv-equivalent
  3. conv 3x3 (200,160,160,64)->64  — down-path shape (bandwidth-bound)

Usage: python benchmarks/int8_probe.py [--repeats 3] [--chain 32]
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


def fetch_sync(out):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))


def make_chained(op, cast_back, k):
    """One jit program that applies op k times, casting output back to the
    input dtype/shape between iterations (defeats folding; keeps the scan
    carry spec fixed). Returns a scalar so D2H is one element."""

    @jax.jit
    def f(x, w):
        def body(c, _):
            return cast_back(op(c, w)), ()

        c, _ = lax.scan(body, x, None, length=k)
        return c.ravel()[0]

    return f


def bench(fn, make_inputs, repeats, k, n_sets=3):
    sets = [make_inputs(100 + i) for i in range(n_sets)]
    for s in sets:
        for a in s:
            fetch_sync(a)
    fetch_sync(fn(*sets[0]))  # compile + warm
    best = float("inf")
    for r in range(repeats):
        s = sets[(r + 1) % n_sets]  # fresh inputs per rep
        t0 = time.perf_counter()
        fetch_sync(fn(*s))
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--chain", type=int, default=32)
    args = ap.parse_args()
    k = args.chain
    dev = jax.devices()[0]
    print(f"device={dev.device_kind} backend={jax.default_backend()} chain={k}",
          flush=True)

    def cast_bf16(y):
        return y.astype(jnp.bfloat16)

    def cast_i8(y):
        return jnp.clip(y // 128, -127, 127).astype(jnp.int8)

    cases = []

    # 1. GEMM (K == N so the chained carry keeps its shape)
    M, K, N = 25600, 512, 512
    flops = 2 * M * K * N

    def dot_f(a, b, pet):
        return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=pet)

    def mk_gemm(dtype):
        def mk(seed):
            r = np.random.RandomState(seed)
            if dtype == jnp.int8:
                return (jnp.asarray(r.randint(-127, 128, (M, K)), jnp.int8),
                        jnp.asarray(r.randint(-127, 128, (K, N)), jnp.int8))
            return (jnp.asarray(r.randn(M, K), jnp.bfloat16),
                    jnp.asarray(r.randn(K, N), jnp.bfloat16))
        return mk

    cases.append((
        "gemm 25600x512x512",
        make_chained(lambda a, b: dot_f(a, b, jnp.float32), cast_bf16, k),
        mk_gemm(jnp.bfloat16),
        make_chained(lambda a, b: dot_f(a, b, jnp.int32), cast_i8, k),
        mk_gemm(jnp.int8),
        flops,
    ))

    # 2/3. convs (F == C so the chained carry keeps its shape)
    dn = ("NHWC", "HWIO", "NHWC")
    for name, (B, H, W, C) in [
        ("conv3x3 200x40x40x256->256", (200, 40, 40, 256)),
        ("conv3x3 200x160x160x64->64", (200, 160, 160, 64)),
    ]:
        F = C
        cflops = 2 * B * H * W * 9 * C * F

        def conv_f(x, w, pet):
            return lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=pet)

        def mk_conv(dtype, shp=(B, H, W, C), ks=(3, 3, C, F)):
            def mk(seed):
                r = np.random.RandomState(seed)
                if dtype == jnp.int8:
                    return (jnp.asarray(r.randint(-127, 128, shp), jnp.int8),
                            jnp.asarray(r.randint(-127, 128, ks), jnp.int8))
                return (jnp.asarray(r.randn(*shp), jnp.bfloat16),
                        jnp.asarray(r.randn(*ks), jnp.bfloat16))
            return mk

        cases.append((
            name,
            make_chained(lambda x, w: conv_f(x, w, jnp.float32), cast_bf16, k),
            mk_conv(jnp.bfloat16),
            make_chained(lambda x, w: conv_f(x, w, jnp.int32), cast_i8, k),
            mk_conv(jnp.int8),
            cflops,
        ))

    for name, f16, mk16, f8, mk8, fl in cases:
        t16 = bench(f16, mk16, args.repeats, k)
        print(f"{name:32s} bf16 {t16 * 1e3:7.2f} ms "
              f"({fl / t16 / 1e12:6.1f} TF/s)", flush=True)
        try:
            t8 = bench(f8, mk8, args.repeats, k)
            msg = (f"int8 {t8 * 1e3:7.2f} ms ({fl / t8 / 1e12:6.1f} TOP/s) | "
                   f"int8/bf16 {t16 / t8:5.2f}x")
        except Exception as exc:
            msg = f"int8 FAILED: {type(exc).__name__}: {exc}"
        print(f"{name:32s} {msg}", flush=True)


if __name__ == "__main__":
    main()
