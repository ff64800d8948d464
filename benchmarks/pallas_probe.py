"""Probe Mosaic support for the ops the fused UNet kernels need.

Each probe is a tiny pallas_call exercising one risky lowering: pad on
the sublane dim, strided slice subsample, reshape-split subsample,
dot_general contracting the lane dim, jnp.repeat upsample on sublane,
-inf padding + max pooling. Prints PASS/FAIL per probe on the current
backend so the kernel design can route around unsupported ops.
"""

from __future__ import annotations

import os

INTERPRET = bool(os.environ.get("PALLAS_PROBE_INTERPRET"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, x, out_shape, expect):
    try:
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=INTERPRET,
        )(x)
        y = np.asarray(y)
        ok = np.allclose(y, expect, atol=1e-5)
        print(f"{name:34s} {'PASS' if ok else 'WRONG RESULT'}")
        if not ok:
            print("   max err", np.abs(y - expect).max())
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:120]
        print(f"{name:34s} FAIL: {type(e).__name__}: {msg}")


def main():
    print(f"backend: {jax.devices()[0].platform} {jax.devices()[0].device_kind}")
    rng = np.random.RandomState(0)
    H, W, C = 16, 32, 128
    x = jnp.asarray(rng.rand(H, W, C), jnp.float32)
    xnp = np.asarray(x)

    # 1. zero-pad on the sublane (W) dim
    def k_pad(i, o):
        o[:] = jnp.pad(i[:], ((0, 0), (1, 1), (0, 0)))

    run("pad sublane (W) +-1", k_pad, x, (H, W + 2, C),
        np.pad(xnp, ((0, 0), (1, 1), (0, 0))))

    # 2. strided slice every other column (sublane stride 2)
    def k_stride(i, o):
        o[:] = i[:, ::2, :]

    run("strided slice W[::2]", k_stride, x, (H, W // 2, C), xnp[:, ::2, :])

    # 3. reshape-split subsample on W
    def k_reshape(i, o):
        o[:] = i[:].reshape(H, W // 2, 2, C)[:, :, 0, :]

    run("reshape-split W subsample", k_reshape, x, (H, W // 2, C),
        xnp[:, ::2, :])

    # 4. dot_general contracting the lane dim (C) without reshape
    w = jnp.asarray(rng.rand(C, 64), jnp.float32)

    # NOTE: default MXU precision decomposes f32 operands into bf16 passes
    # (max rel err ~7e-4 measured on v5e); HIGHEST restores exact f32.
    # Production kernels run bf16 inputs + f32 accumulation, which is exact.
    def k_dot(i, wref, o):
        o[:] = jax.lax.dot_general(
            i[:], wref[:], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    try:
        y = pl.pallas_call(
            k_dot,
            out_shape=jax.ShapeDtypeStruct((H, W, 64), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=INTERPRET,
        )(x, w)
        ok = np.allclose(np.asarray(y), np.einsum("hwc,ck->hwk", xnp, np.asarray(w)),
                         atol=1e-3)
        print(f"{'3d dot_general over lanes':34s} {'PASS' if ok else 'WRONG RESULT'}")
    except Exception as e:  # noqa: BLE001
        print(f"{'3d dot_general over lanes':34s} FAIL: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}")

    # 5. reshape (H,W,C)->(H*W,C) then matmul
    def k_rmat(i, wref, o):
        f = i[:].reshape(H * W, C)
        o[:] = jnp.dot(f, wref[:], preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    try:
        y = pl.pallas_call(
            k_rmat,
            out_shape=jax.ShapeDtypeStruct((H * W, 64), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=INTERPRET,
        )(x, w)
        ok = np.allclose(np.asarray(y),
                         xnp.reshape(H * W, C) @ np.asarray(w), atol=1e-3)
        print(f"{'reshape flatten + matmul':34s} {'PASS' if ok else 'WRONG RESULT'}")
    except Exception as e:  # noqa: BLE001
        print(f"{'reshape flatten + matmul':34s} FAIL: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}")

    # 6. jnp.repeat x2 on H and W (upsample)
    def k_rep(i, o):
        o[:] = jnp.repeat(jnp.repeat(i[:], 2, axis=0), 2, axis=1)

    run("repeat x2 upsample", k_rep, x, (2 * H, 2 * W, C),
        np.repeat(np.repeat(xnp, 2, 0), 2, 1))

    # 7. -inf pad + 3x3 stride-1 max + even-subsample (the pool pattern)
    def k_pool(i, o):
        neg = jnp.asarray(-jnp.inf, i.dtype)
        p = jnp.pad(i[:], ((0, 1), (0, 1), (0, 0)), constant_values=neg)
        m = None
        for dr in range(3):
            for dc in range(3):
                s = p[dr:dr + H - 1, dc:dc + W - 1, :]
                m = s if m is None else jnp.maximum(m, s)
        m = jnp.pad(m, ((0, 1), (0, 1), (0, 0)), constant_values=neg)
        o[:] = m.reshape(H // 2, 2, W // 2, 2, C)[:, 0, :, 0, :]

    exp = np.full((H // 2, W // 2, C), -np.inf, np.float32)
    pn = np.pad(xnp, ((0, 1), (0, 1), (0, 0)), constant_values=-np.inf)
    for r in range(H // 2):
        for c in range(W // 2):
            exp[r, c] = pn[2 * r:2 * r + 3, 2 * c:2 * c + 3, :].max((0, 1))
    run("3x3 s2 maxpool pattern", k_pool, x, (H // 2, W // 2, C), exp)

    # 8. unaligned sublane slice (offset 1)
    def k_off(i, o):
        o[:] = i[:, 1:W - 1, :] * 2.0

    run("unaligned sublane slice", k_off, x, (H, W - 2, C),
        xnp[:, 1:W - 1, :] * 2.0)


if __name__ == "__main__":
    main()
