"""Pallas TPU kernel: fused focus-stacking Z-projection.

The focus-stacking hot loop (zstacks.py:180-189) reads each slice, blurs,
takes a Laplacian, and keeps the per-pixel sharpest slice. The XLA path
(ops/zproj.py) materializes the (Z, H, W) blur/Laplacian intermediates in
HBM; this kernel instead streams one spatial tile of one slice at a time
HBM->VMEM (async DMA), computes the 5-tap blur + 5-tap Laplacian with VPU
shift-adds entirely in VMEM, and keeps only the running (best score, best
pixel) tiles resident — a single HBM read of the stack and a single HBM
write of the projection.

Boundary semantics match the XLA path: the wrapper pre-pads the stack with
REFLECT_101 (cv2 default) by the 4-px kernel support before tiling.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HALO = 4  # support of 5-tap blur + 5-tap derivative
_BLUR = (1 / 16, 4 / 16, 6 / 16, 4 / 16, 1 / 16)
_DERIV = (1.0, 0.0, -2.0, 0.0, 1.0)
_SMOOTH = (1.0, 4.0, 6.0, 4.0, 1.0)


def _conv5_rows(x, taps):
    """5-tap correlation along rows; (m, n) -> (m-4, n)."""
    m = x.shape[0] - 4
    out = taps[0] * x[0:m]
    for u in range(1, 5):
        if taps[u] != 0.0:
            out = out + taps[u] * x[u : u + m]
    return out


def _conv5_cols(x, taps):
    n = x.shape[1] - 4
    out = taps[0] * x[:, 0:n]
    for u in range(1, 5):
        if taps[u] != 0.0:
            out = out + taps[u] * x[:, u : u + n]
    return out


def _focus_kernel(stack_ref, out_ref, tile_ref, score_ref, val_ref, sem):
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_z = stack_ref.shape[0]
    tile_h = out_ref.shape[0]
    tile_w = out_ref.shape[1]

    score_ref[:] = jnp.full_like(score_ref, -jnp.inf)

    def body(z, _):
        # DMA slice sizes must respect (8, 128) tiling: rows tile_h + 8
        # (8-aligned), cols tile_w + 128 (128-aligned, covers the 8-px halo)
        copy = pltpu.make_async_copy(
            stack_ref.at[
                z,
                pl.ds(i * tile_h, tile_h + 2 * _HALO),
                pl.ds(j * tile_w, tile_w + 128),
            ],
            tile_ref,
            sem,
        )
        copy.start()
        copy.wait()
        x = tile_ref[:, : tile_w + 2 * _HALO]
        # Gaussian blur (separable 5-tap): (T+8,T+8) -> (T+4,T+4)
        blurred = _conv5_cols(_conv5_rows(x, _BLUR), _BLUR)
        # Laplacian ksize=5: d2/drow2 smoothed over cols + transpose
        dyy = _conv5_cols(_conv5_rows(blurred, _DERIV), _SMOOTH)
        dxx = _conv5_cols(_conv5_rows(blurred, _SMOOTH), _DERIV)
        score = jnp.abs(dyy + dxx)
        orig = x[_HALO : _HALO + tile_h, _HALO : _HALO + tile_w]
        better = score > score_ref[:]
        val_ref[:] = jnp.where(better, orig, val_ref[:])
        score_ref[:] = jnp.where(better, score, score_ref[:])
        return 0

    jax.lax.fori_loop(0, n_z, body, 0)
    out_ref[:] = val_ref[:]


@partial(jax.jit, static_argnames=("tile", "interpret"))
def proj_focus_stacking_pallas(
    stack: jax.Array, tile: int = 256, interpret: bool = False
) -> jax.Array:
    """Focus-stacking projection of a (Z, H, W) stack via the Pallas kernel."""
    stack = jnp.asarray(stack)
    orig_dtype = stack.dtype
    z, h, w = stack.shape
    tile_h = min(tile, max(8, 8 * math.ceil(h / 8)))
    tile_w = min(tile, max(128, 128 * math.ceil(w / 128)))

    # REFLECT_101 support halo, then edge-pad up to tile multiples
    padded = jnp.pad(
        stack.astype(jnp.float32),
        ((0, 0), (_HALO, _HALO), (_HALO, _HALO)),
        mode="reflect",
    )
    grid_h = math.ceil(h / tile_h)
    grid_w = math.ceil(w / tile_w)
    full_h = grid_h * tile_h
    full_w = grid_w * tile_w
    # rows: halo already included; cols: extend so every 128-aligned DMA
    # (tile_w + 128 wide) stays in bounds
    padded = jnp.pad(
        padded,
        ((0, 0), (0, full_h + 2 * _HALO - padded.shape[1]),
         (0, full_w + 128 - padded.shape[2])),
        mode="edge",
    )

    out = pl.pallas_call(
        _focus_kernel,
        grid=(grid_h, grid_w),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((full_h, full_w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * _HALO, tile_w + 128), jnp.float32),
            pltpu.VMEM((tile_h, tile_w), jnp.float32),
            pltpu.VMEM((tile_h, tile_w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)

    out = out[:h, :w]
    if jnp.issubdtype(orig_dtype, jnp.integer):
        out = jnp.round(out)
    return out.astype(orig_dtype)
