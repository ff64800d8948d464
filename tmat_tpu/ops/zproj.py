"""Z-projection kernels: axis reductions + fused focus stacking.

Parity target: fl_tissue_model_tools/zstacks.py:134-249. The five projection
methods keep the reference's numerics:

- min/max/med/avg are plain reductions over Z (zstacks.py:192-249).
- focus stacking (zstacks.py:153-189) selects, per pixel, the value from the
  slice whose |Laplacian(GaussianBlur(slice))| is maximal, with the
  reference's strict-greater update ≡ first-occurrence argmax over Z.

TPU-first design: the whole stack is one device-resident (Z, H, W) array;
blur+Laplacian run as batched separable convolutions over Z (treated as the
batch axis, so the VPU sees large fused elementwise work), and slice
selection is a single argmax + take_along_axis. Everything is inside one
jit; `proj_focus_stacking_batch` vmaps it across a plate of stacks.
"""

from __future__ import annotations

import warnings
from functools import partial

import jax
import jax.numpy as jnp

from tmat_tpu.ops.filters import gaussian_blur_cv2, laplacian_cv2


def proj_avg(stack: jax.Array, axis: int = 0) -> jax.Array:
    return jnp.mean(stack, axis=axis)


def proj_med(stack: jax.Array, axis: int = 0) -> jax.Array:
    return jnp.median(stack, axis=axis)


def proj_max(stack: jax.Array, axis: int = 0) -> jax.Array:
    return jnp.max(stack, axis=axis)


def proj_min(stack: jax.Array, axis: int = 0) -> jax.Array:
    return jnp.min(stack, axis=axis)


@partial(jax.jit, static_argnames=("kernel_size",))
def _focus_stack_zhw(stack: jax.Array, kernel_size: int = 5) -> jax.Array:
    """Fused focus-stacking over a (Z, H, W) stack."""
    as_float = stack.astype(jnp.float32)
    blurred = gaussian_blur_cv2(as_float, kernel_size)
    sharpness = jnp.abs(laplacian_cv2(blurred, kernel_size))
    # Strict-greater running update in the reference == first argmax here.
    best_z = jnp.argmax(sharpness, axis=0)
    return jnp.take_along_axis(stack, best_z[None], axis=0)[0]


def proj_focus_stacking(
    stack: jax.Array, axis: int = 0, kernel_size: int = 5
) -> jax.Array:
    """Focus-stacking projection (zstacks.py:153-189).

    On TPU with the default kernel size, dispatches to the Pallas kernel
    (ops/pallas_zproj.py): one HBM pass per slice with the blur/Laplacian/
    argmax fused in VMEM. Falls back to the XLA path otherwise. The two
    paths agree except at |Laplacian| near-ties (zero crossings), where the
    winning slice is numerically arbitrary on any backend.
    """
    stack = jnp.asarray(stack)
    if axis != 0:
        stack = jnp.moveaxis(stack, axis, 0)
    if kernel_size == 5 and stack.ndim == 3:
        if jax.devices()[0].platform not in ("cpu",):
            from tmat_tpu.ops.pallas_zproj import proj_focus_stacking_pallas

            try:
                return proj_focus_stacking_pallas(stack)
            except jax.errors.JaxRuntimeError as e:
                # A Pallas lowering/compile failure on an unusual geometry
                # is recoverable via the XLA path — but never silently:
                # a kernel regression must leave a trace.
                warnings.warn(
                    f"Pallas focus-stacking kernel failed ({e!r}); "
                    "falling back to the XLA lowering",
                    RuntimeWarning,
                    stacklevel=2,
                )
    return _focus_stack_zhw(stack, kernel_size)


# Batched variants: map a (B, Z, H, W) plate of stacks in one XLA program.
proj_focus_stacking_batch = jax.jit(
    jax.vmap(_focus_stack_zhw, in_axes=(0,)), static_argnames=()
)

PROJ_METHODS = {
    "min": proj_min,
    "max": proj_max,
    "med": proj_med,
    "avg": proj_avg,
    "fs": proj_focus_stacking,
}


def proj_masked(
    stack: jax.Array, z_count, method: str, kernel_size: int = 5
) -> jax.Array:
    """Projection over the first ``z_count`` slices of a Z-padded stack.

    Plate batches pad every well's stack to the plate-maximum Z for static
    XLA shapes; zero padding is only neutral for the max projection of
    unsigned data. This variant masks the padded slices so all five
    methods (zstacks.py:134-249 numerics) are correct on ragged-Z plates:
    min/max see +/-inf, avg divides by the true count, med takes the
    order statistics of the valid prefix (mean of the two middles, like
    np.median), and focus stacking excludes padded slices from the
    sharpness argmax. ``z_count`` may be a traced scalar. Returns f32.
    """
    x = stack.astype(jnp.float32)
    z = x.shape[0]
    valid = (jnp.arange(z) < z_count)[:, None, None]
    if method == "max":
        return jnp.max(jnp.where(valid, x, -jnp.inf), axis=0)
    if method == "min":
        return jnp.min(jnp.where(valid, x, jnp.inf), axis=0)
    if method == "avg":
        return jnp.sum(jnp.where(valid, x, 0.0), axis=0) / z_count
    if method == "med":
        s = jnp.sort(jnp.where(valid, x, jnp.inf), axis=0)
        lo = jnp.asarray((z_count - 1) // 2, jnp.int32)
        hi = jnp.asarray(z_count // 2, jnp.int32)
        shape = (1,) + x.shape[1:]
        return (
            jnp.take_along_axis(s, jnp.full(shape, lo), axis=0)[0]
            + jnp.take_along_axis(s, jnp.full(shape, hi), axis=0)[0]
        ) / 2.0
    if method == "fs":
        blurred = gaussian_blur_cv2(x, kernel_size)
        sharpness = jnp.abs(laplacian_cv2(blurred, kernel_size))
        sharpness = jnp.where(valid, sharpness, -jnp.inf)
        best_z = jnp.argmax(sharpness, axis=0)
        return jnp.take_along_axis(x, best_z[None], axis=0)[0]
    raise ValueError(f"Unknown projection method: {method}")


def proj_host(stack, method: str):
    """Host-side projection of an UNPADDED (Z, H, W) stack.

    Matches ``proj_masked``'s f32 numerics bit-for-bit on integer-valued
    microscopy data (max/min are exact order statistics; avg's f32 sum of
    uint8/uint16 slices is exact below 2^24 so the single f32 division
    agrees; med is the mean of the two middle order statistics in f32).
    Used by the plate streaming producer to reduce during decode —
    transferring a (H, W) projection instead of the (Z, H, W) stack cuts
    H2D bytes 8x on typical depths, and transfer bandwidth (not the
    reduce) is the plate bottleneck on slow links. ``fs`` is device-only
    (it needs the blur/Laplacian convolutions); callers fall back to
    shipping the full stack for it.
    """
    import numpy as np

    x = np.asarray(stack)
    if method == "max":
        return x.max(axis=0)  # input dtype: exact, smallest transfer
    if method == "min":
        return x.min(axis=0)
    x = x.astype(np.float32, copy=False)
    if method == "avg":
        return x.sum(axis=0, dtype=np.float32) / np.float32(x.shape[0])
    if method == "med":
        s = np.sort(x, axis=0)
        z = x.shape[0]
        return (s[(z - 1) // 2] + s[z // 2]) / np.float32(2.0)
    raise ValueError(f"proj_host does not support method: {method}")
