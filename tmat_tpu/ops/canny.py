"""Canny edge detection on device (skimage.feature.canny semantics).

Reference call sites: well_mask_generation.py:165,195 (borders of binary
well masks, default sigma=1, thresholds 0.1/0.2) and compute_branches.py:271
(edges of the vesselness raster, sigma=0).

Pipeline (all jit, static shapes): Gaussian smooth → Sobel gradients →
interpolated non-maximum suppression → double threshold → hysteresis as a
lax.while_loop of masked dilations (fixed point of "weak edges connected to
strong edges").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tmat_tpu.ops.filters import gaussian, sepconv2d

# numpy on purpose: module-level jnp.array dispatches an eager device
# convert at import time — one remote XLA compile per process on the TPU
# tunnel (cold-start census, BASELINE.md). Traced code embeds these as
# constants either way.
_SOBEL_SMOOTH = np.array([1.0, 2.0, 1.0], np.float32)
_SOBEL_DERIV = np.array([1.0, 0.0, -1.0], np.float32)


def _shift(x: jax.Array, dr: int, dc: int) -> jax.Array:
    """Shift with zero fill: out[r, c] = x[r + dr, c + dc]."""
    h, w = x.shape
    p = jnp.pad(x, ((1, 1), (1, 1)))
    return p[1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]


@partial(jax.jit, static_argnames=("sigma", "low_threshold", "high_threshold"))
def canny(
    image: jax.Array,
    sigma: float = 1.0,
    low_threshold: float = 0.1,
    high_threshold: float = 0.2,
) -> jax.Array:
    """Binary edge map of a 2-D image."""
    img = image.astype(jnp.float32)
    smoothed = gaussian(img, sigma, mode="constant") if sigma > 0 else img

    # scipy.ndimage.sobel kernels (reflect border), as in skimage.canny
    gr = sepconv2d(smoothed, _SOBEL_DERIV, _SOBEL_SMOOTH, mode="reflect")  # d/drow
    gc = sepconv2d(smoothed, _SOBEL_SMOOTH, _SOBEL_DERIV, mode="reflect")  # d/dcol
    mag = jnp.hypot(gr, gc)

    # Interpolated non-maximum suppression. Gradient direction (gr, gc);
    # compare against magnitudes interpolated at +/- the unit gradient.
    abs_r = jnp.abs(gr)
    abs_c = jnp.abs(gc)
    eps = 1e-12
    # Two regimes: |gc| >= |gr| (mostly horizontal gradient) and converse.
    w_c = jnp.where(abs_c >= abs_r, abs_r / (abs_c + eps), abs_c / (abs_r + eps))
    sr = jnp.where(gr >= 0, 1, -1)
    sc = jnp.where(gc >= 0, 1, -1)

    # _shift needs static offsets, so expand the four gradient-sign cases
    # and select per pixel.
    def interp_signed(direction):
        outs = []
        for srv in (1, -1):
            for scv in (1, -1):
                n_c = _shift(mag, 0, direction * scv)
                n_r = _shift(mag, direction * srv, 0)
                n_d = _shift(mag, direction * srv, direction * scv)
                horiz = n_c * (1 - w_c) + n_d * w_c
                vert = n_r * (1 - w_c) + n_d * w_c
                val = jnp.where(abs_c >= abs_r, horiz, vert)
                outs.append(((sr == srv) & (sc == scv), val))
        result = jnp.zeros_like(mag)
        for cond, val in outs:
            result = jnp.where(cond, val, result)
        return result

    plus = interp_signed(1)
    minus = interp_signed(-1)
    is_max = (mag >= plus) & (mag >= minus) & (mag > 0)

    # exclude the 1-px border (skimage erodes the mask)
    h, w = img.shape
    interior = jnp.zeros((h, w), bool).at[1 : h - 1, 1 : w - 1].set(True)
    local_max = is_max & interior

    strong = local_max & (mag > high_threshold)
    weak = local_max & (mag > low_threshold)

    # Hysteresis: grow strong edges through weak pixels to a fixed point.
    def body(state):
        edges, _ = state
        grown = jnp.zeros_like(edges)
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                grown = grown | _shift(edges, dr, dc)
        new_edges = weak & grown
        return new_edges, jnp.any(new_edges != edges)

    edges, _ = jax.lax.while_loop(
        lambda s: s[1], body, (strong, jnp.bool_(True))
    )
    return edges
