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
