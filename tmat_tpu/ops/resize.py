"""Resampling ops over the trailing (H, W) axes.

Parity targets: the reference's resampling call sites —
cv2.resize/INTER_LANCZOS4 (compute_branches.py:312, data_prep.py:35),
PIL LANCZOS / NEAREST (models.py:631-651), skimage.transform.resize /
rescale (well_mask_generation.py:160,228; compute_branches.py:248-254,351).

Note: several reference call sites pass (rows, cols) where cv2/PIL expect
(width, height), silently transposing the target for non-square images
(SURVEY §7 "known bugs"). This implementation always takes (rows, cols)
and resizes the trailing axes correctly.

All methods lower to jax.image.resize (gather/matmul based, MXU-friendly);
antialiasing is enabled for downsampling as in skimage/PIL.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_METHODS = {
    "nearest": "nearest",
    "linear": "linear",
    "bilinear": "linear",
    "lanczos": "lanczos3",  # PIL LANCZOS (a=3)
    "lanczos3": "lanczos3",
    "lanczos4": "lanczos5",  # closest jax kernel to cv2 INTER_LANCZOS4 (a=4)
    "cubic": "cubic",
}


@partial(jax.jit, static_argnames=("shape", "method", "antialias"))
def resize(
    img: jax.Array,
    shape: Tuple[int, int],
    method: str = "linear",
    antialias: bool = True,
) -> jax.Array:
    """Resize trailing (H, W) axes to ``shape`` (rows, cols)."""
    out_shape = img.shape[:-2] + tuple(shape)
    dtype = img.dtype
    resized = jax.image.resize(
        img.astype(jnp.float32), out_shape, method=_METHODS[method], antialias=antialias
    )
    if jnp.issubdtype(dtype, jnp.integer):
        info = jnp.iinfo(dtype)
        resized = jnp.clip(jnp.round(resized), info.min, info.max)
    return resized.astype(dtype)


def _lanczos_weight_matrix(in_size: int, out_size: int, a: int = 4):
    """Separable antialiased Lanczos-a weight matrix (out_size, in_size).

    Same sampling convention as jax.image.resize (pixel centers aligned,
    kernel stretched by the scale factor when downsampling, rows
    normalized to 1) but with the true a=4 kernel cv2 INTER_LANCZOS4
    uses — the device path approximates it with jax's lanczos5.
    """
    import numpy as np

    scale = out_size / in_size
    stretch = max(1.0 / scale, 1.0)
    coord = (np.arange(out_size) + 0.5) / scale - 0.5
    x = (np.arange(in_size)[None, :] - coord[:, None]) / stretch
    with np.errstate(invalid="ignore"):
        w = np.where(np.abs(x) < a, np.sinc(x) * np.sinc(x / a), 0.0)
    w /= np.sum(w, axis=1, keepdims=True)
    return w.astype(np.float32)


def resize_lanczos4_host(stack, shape: Tuple[int, int]):
    """Host-side batched Lanczos-4 resize of (..., H, W) via two GEMMs.

    For ingest-bound tools the resize belongs on the host: the profiled
    TPU tunnel spends more wall on the device resize program + its
    dispatch than two BLAS GEMMs cost locally (BASELINE.md round-3 H2D
    section), and shipping the already-resized f32 slices halves the
    transferred bytes. Numerically this is the cv2 INTER_LANCZOS4 kernel
    (the reference's data_prep.py:35 resize), closer to the reference
    than the device lanczos5 approximation.
    """
    import numpy as np

    stack = np.asarray(stack, np.float32)
    lead = stack.shape[:-2]
    H, W = stack.shape[-2:]
    h, w = shape
    wh = _lanczos_weight_matrix(H, h)
    ww = _lanczos_weight_matrix(W, w)
    # two single large GEMMs (threaded BLAS) instead of a batched matmul
    # loop: fold the batch into the free dimension each time
    flat = stack.reshape(-1, H, W)
    t1 = (wh @ flat.transpose(1, 0, 2).reshape(H, -1)).reshape(h, -1, W)
    t2 = np.ascontiguousarray(t1.transpose(1, 0, 2)).reshape(-1, W) @ ww.T
    return t2.reshape(*lead, h, w)


def target_shape_for_ratio(shape: Tuple[int, int], ratio: float) -> Tuple[int, int]:
    """round(shape * ratio) — the reference's target-size rule
    (models.py:627-629, compute_branches.py:309-311)."""
    import numpy as np

    return tuple(int(x) for x in np.round(np.multiply(shape[:2], ratio)).astype(int))


def downsample_max_dim_shape(shape: Tuple[int, int], max_dim: int) -> Tuple[int, int]:
    """Target shape so that max(shape) == max_dim (compute_cell_area.py:54-56)."""
    import numpy as np

    ratio = max_dim / max(shape[:2])
    return tuple(int(x) for x in np.round(np.multiply(shape[:2], ratio)).astype(int))
