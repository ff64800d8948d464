"""Intensity rescaling and masking primitives.

Parity targets: skimage.exposure.rescale_intensity as used throughout the
reference (compute_cell_area.py:80, compute_branches.py:255,316,419),
preprocessing.apply_mask / bin_thresh (preprocessing.py:13-41).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rescale_intensity(
    img: jax.Array, out_range=(0.0, 1.0), in_range=None
) -> jax.Array:
    """Linear stretch of (min, max) — or ``in_range`` — onto ``out_range``.

    Matches skimage.exposure.rescale_intensity for the in_range='image'
    default: values are clipped to in_range, then mapped linearly. A
    constant image maps to out_min (0/0 guarded to 0).
    """
    img = img.astype(jnp.float32)
    if in_range is None:
        imin = jnp.min(img)
        imax = jnp.max(img)
    else:
        imin, imax = (jnp.asarray(v, jnp.float32) for v in in_range)
    omin, omax = (float(v) for v in out_range)
    scale = jnp.where(imax > imin, (omax - omin) / jnp.maximum(imax - imin, 1e-38), 0.0)
    return (jnp.clip(img, imin, imax) - imin) * scale + omin


def apply_mask(img: jax.Array, mask: jax.Array) -> jax.Array:
    """Zero out pixels where the mask is 0 (preprocessing.py:13-23)."""
    return jnp.where(mask == 0, jnp.zeros_like(img), img)


def bin_thresh(img: jax.Array, img_max, threshold: float = 0.0) -> jax.Array:
    """img_max where img > threshold else 0 (preprocessing.py:26-41)."""
    return jnp.where(img > threshold, img_max, 0).astype(img.dtype)
