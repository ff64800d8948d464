"""Fused Pallas TPU kernels for the UNet-Xception inference down path.

Why: the production forward (patch 320, filters 64-512) is
bandwidth-bound on its down path — 17% of the FLOPs but ~45% of the
wall, because the unfused XLA lowering materializes every intermediate
activation (depthwise out, pointwise out x2, pool in) in HBM
(BASELINE.md "UNet forward efficiency" roofline). Here each down block

    [relu] -> depthwise3x3 -> pointwise -> BN -> relu
           -> depthwise3x3 -> pointwise -> BN
           -> maxpool3x3/s2  (+ 1x1 stride-2 residual of the block input)

is ONE Pallas kernel per batch element: activations live in VMEM for the
whole block, HBM sees exactly one read of the block input and one write
of the half-resolution output. BatchNorm (inference mode) is folded into
the preceding conv's weights/bias at parameter-extraction time, so the
kernels never see it. The up path (256-512 channel transpose convs) is
MXU-bound at ~37% MFU already and stays on the XLA lowering, expressed
in raw lax with the same BN folding.

MEASURED RESULT (this is an opt-in experiment, not the production
default): at production geometry the fused path is 0.83x the standard
Flax/XLA forward on a v5e chip (157.2 ms vs 129.7 ms, batch 200, bf16;
mask IoU 0.99986 — numerics are fine). The grid-per-batch-element
schedule trades XLA's cross-layer pipelining for HBM-traffic savings
and loses: at 64-128 channels the VPU lanes run half-empty through the
depthwise taps and the single-element blocks leave the MXU idle during
the elementwise phases. This negative result is part of the
BASELINE.md roofline argument for why the down path sits ~2x above its
bandwidth floor under any schedule we can express. Enable with
TMAT_TPU_FUSED_UNET=1.

Architecture parity: the reference's Keras builder
(fl_tissue_model_tools/models.py:85-171) as re-expressed by
tmat_tpu.models.unet.UNetXception; numerics validated against the Flax
module in f32 interpret mode (tests/test_pallas_unet.py) and bound by
mask-IoU on the bf16 production path. Mosaic op support for every
non-trivial lowering used here (sublane pad, strided sublane slice,
flatten+matmul, -inf pad maxpool pattern) is probed by
benchmarks/pallas_probe.py — all PASS on TPU v5e.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Down-block peak live set at the production geometry (batch block 1,
# 160x160x64 -> 80x80x128, f32 accumulators) is ~40 MB; v5e VMEM is
# 128 MB. Leave headroom for Mosaic's own double buffering.
_VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def should_use_fused(patch_size: int, filter_counts: Sequence[int]) -> bool:
    """Production policy for the fused inference path: OPT-IN only.

    Measured head-to-head at the production geometry (batch 200, patch
    320, bf16, one v5e chip, value-fetch sync): fused 157.2 ms vs
    standard 129.7 ms — 0.83x, with mask IoU 0.99986 vs the standard
    forward (benchmarks/fused_unet_bench.py). XLA's pipelined lowering
    beats the VMEM-resident fusion at these shapes, so the default stays
    on the Flax/XLA forward everywhere; TMAT_TPU_FUSED_UNET=1 enables
    the fused path (on CPU it runs in interpret mode — this is how the
    test suite exercises it).
    """
    if not fused_pred_supported(patch_size, filter_counts):
        return False
    return os.environ.get("TMAT_TPU_FUSED_UNET") == "1"


# --------------------------------------------------------------------------
# Parameter extraction: fold inference BatchNorm into conv weights/bias
# --------------------------------------------------------------------------


def _fold_bn(kernel, bias, scale, bn_bias, mean, var, eps):
    """Fold y = BN(conv(x)) into conv'(x) with adjusted kernel/bias.

    BN(z) = (z - mean) * scale/sqrt(var+eps) + bias
          = z * s + (bias - mean*s),  s = scale/sqrt(var+eps)
    so kernel' = kernel * s (output-channel axis last), and
    bias' = conv_bias * s + (bias - mean*s). All math in f64->f32 numpy.
    """
    s = (scale.astype(np.float64) / np.sqrt(var.astype(np.float64) + eps))
    k = kernel.astype(np.float64) * s
    b0 = 0.0 if bias is None else bias.astype(np.float64)
    b = b0 * s + (bn_bias.astype(np.float64) - mean.astype(np.float64) * s)
    return k.astype(np.float32), b.astype(np.float32)


def extract_fused_params(
    variables: Dict[str, Any],
    filter_counts: Sequence[int],
    eps: float = 1e-3,
) -> Dict[str, Any]:
    """Flatten the Flax variable tree into BN-folded plain arrays.

    Uses the deterministic nn.compact auto-naming of UNetXception:
    entry Conv_0 + BatchNorm_0; down block i = SeparableConv_{2i},
    BatchNorm_{1+2i}, SeparableConv_{2i+1}, BatchNorm_{2+2i}, residual
    Conv_{1+i}; up block j = ConvTranspose_{2j}/{2j+1} with
    BatchNorm_{1+2*n_down+2j}/{+1} and residual Conv_{1+n_down+j};
    head Conv_{1+n_down+n_up}.
    """
    p = jax.tree.map(lambda a: np.asarray(a, np.float32), variables["params"])
    bs = jax.tree.map(
        lambda a: np.asarray(a, np.float32), variables["batch_stats"]
    )
    f = tuple(sorted(filter_counts))
    n_down = len(f) - 1
    n_up = len(f)

    def bn(i):
        return (
            p[f"BatchNorm_{i}"]["scale"],
            p[f"BatchNorm_{i}"]["bias"],
            bs[f"BatchNorm_{i}"]["mean"],
            bs[f"BatchNorm_{i}"]["var"],
        )

    out: Dict[str, Any] = {}
    k, b = _fold_bn(p["Conv_0"]["kernel"], p["Conv_0"]["bias"], *bn(0), eps)
    out["entry"] = {"k": k, "b": b}

    down = []
    for i in range(n_down):
        sc1 = p[f"SeparableConv_{2 * i}"]
        sc2 = p[f"SeparableConv_{2 * i + 1}"]
        w1, b1 = _fold_bn(
            sc1["pointwise"]["kernel"][0, 0], sc1["pointwise"]["bias"],
            *bn(1 + 2 * i), eps,
        )
        w2, b2 = _fold_bn(
            sc2["pointwise"]["kernel"][0, 0], sc2["pointwise"]["bias"],
            *bn(2 + 2 * i), eps,
        )
        down.append(
            {
                # depthwise kernels (3,3,1,C) -> (9,C): row k = tap (k//3, k%3)
                "dw1": np.ascontiguousarray(
                    sc1["depthwise"]["kernel"][:, :, 0, :].reshape(9, -1)
                ),
                "w1": w1,
                "b1": b1,
                "dw2": np.ascontiguousarray(
                    sc2["depthwise"]["kernel"][:, :, 0, :].reshape(9, -1)
                ),
                "w2": w2,
                "b2": b2,
                "wr": p[f"Conv_{1 + i}"]["kernel"][0, 0],
                "br": p[f"Conv_{1 + i}"]["bias"],
            }
        )
    out["down"] = down

    ups = []
    for j in range(n_up):
        k1, bb1 = _fold_bn(
            p[f"ConvTranspose_{2 * j}"]["kernel"],
            p[f"ConvTranspose_{2 * j}"]["bias"],
            *bn(1 + 2 * n_down + 2 * j), eps,
        )
        k2, bb2 = _fold_bn(
            p[f"ConvTranspose_{2 * j + 1}"]["kernel"],
            p[f"ConvTranspose_{2 * j + 1}"]["bias"],
            *bn(2 + 2 * n_down + 2 * j), eps,
        )
        ups.append(
            {
                "k1": k1,
                "b1": bb1,
                "k2": k2,
                "b2": bb2,
                "wr": p[f"Conv_{1 + n_down + j}"]["kernel"][0, 0],
                "br": p[f"Conv_{1 + n_down + j}"]["bias"],
            }
        )
    out["up"] = ups
    head = p[f"Conv_{1 + n_down + n_up}"]
    out["head"] = {"k": head["kernel"], "b": head["bias"]}
    return out


# --------------------------------------------------------------------------
# The fused down-block kernel
# --------------------------------------------------------------------------


def _depthwise3x3(x, dw_ref):
    """3x3 SAME depthwise conv as 9 shifted multiply-adds (VPU), f32 acc."""
    H, W, C = x.shape
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((H, W, C), jnp.float32)
    for k in range(9):
        dr, dc = divmod(k, 3)
        tap = dw_ref[k][None, None, :].astype(jnp.float32)
        acc = acc + xp[dr : dr + H, dc : dc + W, :].astype(jnp.float32) * tap
    return acc


def _matmul_bias(x2d, w_ref, b_ref, relu):
    """(HW, Cin) @ (Cin, Cout) on the MXU with f32 accumulation + bias."""
    y = lax.dot_general(
        x2d,
        w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = y + b_ref[:][None, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    return y


def _subsample2(x):
    """x[::2, ::2, :] via reshape-split: Mosaic rejects >2-D strided
    gathers, but the 5-D reshape + static index lowers fine
    (benchmarks/pallas_probe.py probe 7)."""
    H, W, C = x.shape
    return x.reshape(H // 2, 2, W // 2, 2, C)[:, 0, :, 0, :]


def _maxpool3x3s2(u):
    """3x3 stride-2 max pool, TF-SAME (even size -> pad (0,1) with -inf)."""
    H, W, F = u.shape
    neg = jnp.asarray(-jnp.inf, u.dtype)
    p = jnp.pad(u, ((0, 1), (0, 1), (0, 0)), constant_values=neg)
    m = None
    for dr in range(3):
        for dc in range(3):
            s = p[dr : dr + H - 1, dc : dc + W - 1, :]
            m = s if m is None else jnp.maximum(m, s)
    m = jnp.pad(m, ((0, 1), (0, 1), (0, 0)), constant_values=neg)
    return _subsample2(m)


def _down_block_kernel(
    x_ref, dw1, w1, b1, dw2, w2, b2, wr, br, out_ref, *, first: bool
):
    x = x_ref[0]
    H, W, C = x.shape
    h = x if first else jnp.maximum(x, 0)
    t = _depthwise3x3(h, dw1).astype(x.dtype)
    t = (
        _matmul_bias(t.reshape(H * W, C), w1, b1, relu=True)
        .astype(x.dtype)
        .reshape(H, W, -1)
    )
    F = t.shape[-1]
    u = _depthwise3x3(t, dw2).astype(x.dtype)
    u = _matmul_bias(u.reshape(H * W, F), w2, b2, relu=False).reshape(H, W, F)
    pool = _maxpool3x3s2(u)
    # 1x1 stride-2 residual of the (pre-relu) block input
    xs = _subsample2(x)
    r = _matmul_bias(
        xs.reshape((H // 2) * (W // 2), C), wr, br, relu=False
    ).reshape(H // 2, W // 2, F)
    out_ref[0] = (pool + r).astype(out_ref.dtype)


def _down_block(x, blk, *, first: bool, interpret: bool):
    B, H, W, C = x.shape
    F = blk["w1"].shape[1]
    if H % 2 or W % 2:
        raise ValueError(f"down block needs even spatial dims, got {H}x{W}")
    weights = (
        blk["dw1"], blk["w1"], blk["b1"],
        blk["dw2"], blk["w2"], blk["b2"],
        blk["wr"], blk["br"],
    )

    def _full_spec(a):
        return pl.BlockSpec(
            a.shape, lambda i, _nd=a.ndim: (0,) * _nd, memory_space=pltpu.VMEM
        )

    return pl.pallas_call(
        partial(_down_block_kernel, first=first),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, H, W, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            )
        ]
        + [_full_spec(a) for a in weights],
        out_specs=pl.BlockSpec(
            (1, H // 2, W // 2, F),
            lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H // 2, W // 2, F), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(x, *weights)


# --------------------------------------------------------------------------
# Full forward: XLA entry conv -> Pallas down blocks -> raw-lax up path
# --------------------------------------------------------------------------

_DN = ("NHWC", "HWIO", "NHWC")


def _upsample2(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def _pointwise4d(x, w, b):
    y = lax.dot_general(
        x, w, dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (y + b[None, None, None, :]).astype(x.dtype)


def make_fused_pred_fn(
    variables: Dict[str, Any],
    filter_counts: Sequence[int],
    *,
    dtype=jnp.bfloat16,
    output_act: str = "sigmoid",
    interpret: Optional[bool] = None,
):
    """Build a jit-safe pred(batch)->(B,H,W,1) f32 using the fused kernels.

    ``interpret`` defaults to True on the CPU backend (Mosaic requires a
    TPU); the interpreted path computes identical results and keeps the
    whole code path exercised by the CPU test suite.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    fp = extract_fused_params(variables, filter_counts)

    def cast(a):
        return jnp.asarray(a, dtype)

    def f32(a):
        return jnp.asarray(a, jnp.float32)

    entry_k, entry_b = cast(fp["entry"]["k"]), f32(fp["entry"]["b"])
    down = [
        {
            k: (f32(v) if k in ("b1", "b2", "br") else cast(v))
            for k, v in blk.items()
        }
        for blk in fp["down"]
    ]
    ups = [
        {
            k: (f32(v) if k in ("b1", "b2", "br") else cast(v))
            for k, v in blk.items()
        }
        for blk in fp["up"]
    ]
    head_k, head_b = cast(fp["head"]["k"]), f32(fp["head"]["b"])

    def pred(batch):
        x = batch.astype(dtype)
        # Entry: conv3x3/s2 + folded BN + relu. Cheap and MXU-unfriendly
        # (1 input channel); XLA's lowering is fine.
        y = lax.conv_general_dilated(
            x, entry_k, (2, 2), "SAME", dimension_numbers=_DN
        )
        x = jnp.maximum(y + entry_b.astype(dtype), 0).astype(dtype)

        for i, blk in enumerate(down):
            x = _down_block(x, blk, first=(i == 0), interpret=interpret)

        for up in ups:
            prev = x
            h = jnp.maximum(x, 0)
            h = lax.conv_transpose(
                h, up["k1"], (1, 1), "SAME", transpose_kernel=False
            ) + up["b1"].astype(dtype)
            h = jnp.maximum(h, 0)
            h = lax.conv_transpose(
                h, up["k2"], (1, 1), "SAME", transpose_kernel=False
            ) + up["b2"].astype(dtype)
            h = _upsample2(h.astype(dtype))
            r = _upsample2(_pointwise4d(prev, up["wr"], up["br"]))
            x = h + r

        y = lax.conv_general_dilated(
            x, head_k, (1, 1), "SAME", dimension_numbers=_DN
        ) + head_b.astype(dtype)
        y = y.astype(jnp.float32)
        if output_act == "sigmoid":
            y = jax.nn.sigmoid(y)
        elif output_act == "softmax":
            y = jax.nn.softmax(y)
        return y

    return pred


def fused_pred_supported(patch_size: int, filter_counts: Sequence[int]) -> bool:
    """The fused down path needs even spatial dims at every level."""
    n_halvings = len(filter_counts)  # entry + n_down
    return patch_size % (2**n_halvings) == 0
