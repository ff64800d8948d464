"""Binary morphology on device: erosion, dilation, closing, thinning.

Parity targets: skimage.morphology.{disk, square, binary_erosion, dilation,
closing, skeletonize, medial_axis} as used by well_mask_generation.py:275,
compute_branches.py:275-341, transforms.py:331.

Design: footprint morphology lowers to a single XLA convolution per op
(erosion: conv(x, K) == sum(K); dilation: conv(x, K) > 0) — one fused
HBM pass instead of per-pixel loops. Border semantics follow skimage:
out-of-image pixels are True for erosion and False for dilation.

Skeletonization is Zhang-Suen thinning expressed as a lax.while_loop of
two masked sub-iterations — a topology-preserving thinning that matches
skimage.skeletonize(method='zhang'). The reference's `medial_axis` call
sites need (a) a centerline raster and (b) the foreground EDT; we provide
`medial_axis` as thinning + EDT (documented deviation from skimage's
LUT-and-priority-queue construction, which is inherently sequential).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def disk(radius: int) -> np.ndarray:
    """skimage.morphology.disk: x^2 + y^2 <= r^2."""
    y, x = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    return (x**2 + y**2 <= radius**2).astype(np.float32)


def square(width: int) -> np.ndarray:
    """skimage.morphology.square."""
    return np.ones((width, width), np.float32)


def _conv_binary(x: jax.Array, footprint: np.ndarray, pad_value: float) -> jax.Array:
    """Correlate a binary image with a footprint (trailing H, W axes)."""
    fp = jnp.asarray(footprint, jnp.float32)
    kh, kw = fp.shape
    batch_shape = x.shape[:-2]
    h, w = x.shape[-2:]
    img = x.reshape((-1, 1, h, w)).astype(jnp.float32)
    pad = [
        (0, 0),
        (0, 0),
        ((kh - 1) // 2, kh - 1 - (kh - 1) // 2),
        ((kw - 1) // 2, kw - 1 - (kw - 1) // 2),
    ]
    img = jnp.pad(img, pad, mode="constant", constant_values=pad_value)
    dn = jax.lax.conv_dimension_numbers(img.shape, (1, 1, kh, kw), ("NCHW", "OIHW", "NCHW"))
    out = jax.lax.conv_general_dilated(
        img, fp.reshape(1, 1, kh, kw), (1, 1), "VALID", dimension_numbers=dn
    )
    return out.reshape(batch_shape + (h, w))


def binary_erosion(x: jax.Array, footprint: np.ndarray) -> jax.Array:
    """skimage binary_erosion (out-of-image treated as True)."""
    count = _conv_binary(x > 0, footprint, pad_value=1.0)
    return count >= float(footprint.sum()) - 0.5


def binary_dilation(x: jax.Array, footprint: np.ndarray) -> jax.Array:
    """skimage binary_dilation (footprint mirrored; all ours are symmetric)."""
    count = _conv_binary(x > 0, footprint, pad_value=0.0)
    return count > 0.5


def binary_closing(x: jax.Array, footprint: np.ndarray) -> jax.Array:
    """Dilation then erosion (skimage.morphology.closing on binary input)."""
    return binary_erosion(binary_dilation(x, footprint), footprint)


def binary_opening(x: jax.Array, footprint: np.ndarray) -> jax.Array:
    return binary_dilation(binary_erosion(x, footprint), footprint)


dilation = binary_dilation  # grayscale call sites in the reference are binary
closing = binary_closing


def _neighbors(x: jax.Array) -> Tuple[jax.Array, ...]:
    """P2..P9 clockwise neighbors (Zhang-Suen numbering), zero-padded."""
    p = jnp.pad(x, ((1, 1), (1, 1)))
    h, w = x.shape
    n = p[0:h, 1 : w + 1]  # P2 north
    ne = p[0:h, 2 : w + 2]  # P3
    e = p[1 : h + 1, 2 : w + 2]  # P4
    se = p[2 : h + 2, 2 : w + 2]  # P5
    s = p[2 : h + 2, 1 : w + 1]  # P6
    sw = p[2 : h + 2, 0:w]  # P7
    wn = p[1 : h + 1, 0:w]  # P8
    nw = p[0:h, 0:w]  # P9
    return n, ne, e, se, s, sw, wn, nw


def _zhang_suen_subiter(x: jax.Array, first: bool) -> jax.Array:
    n, ne, e, se, s, sw, w, nw = _neighbors(x)
    ring = [n, ne, e, se, s, sw, w, nw]
    b = sum(ring)  # number of nonzero neighbors
    # A(P1): 0->1 transitions around the ring
    a = sum(
        jnp.logical_and(ring[i] == 0, ring[(i + 1) % 8] == 1)
        for i in range(8)
    )
    if first:
        cond3 = n * e * s == 0
        cond4 = e * s * w == 0
    else:
        cond3 = n * e * w == 0
        cond4 = n * s * w == 0
    delete = (
        (x == 1) & (b >= 2) & (b <= 6) & (a == 1) & cond3 & cond4
    )
    return jnp.where(delete, 0, x).astype(x.dtype)


@jax.jit
def skeletonize(mask: jax.Array) -> jax.Array:
    """Zhang-Suen thinning (skimage.morphology.skeletonize, method='zhang')."""
    x0 = (mask > 0).astype(jnp.int32)

    def body(state):
        x, _ = state
        x1 = _zhang_suen_subiter(x, True)
        x2 = _zhang_suen_subiter(x1, False)
        changed = jnp.any(x2 != x)
        return x2, changed

    def cond(state):
        return state[1]

    out, _ = jax.lax.while_loop(cond, body, (x0, jnp.bool_(True)))
    return out > 0


def euclidean_distance_transform(mask: np.ndarray) -> np.ndarray:
    """Exact EDT of the foreground (host-side scipy; see module docstring).

    The EDT feeds the centerline enhancement (compute_branches.py:340-344)
    and dt_blur/sdt_blur (preprocessing.py:118-162); it runs on host because
    the exact lower-envelope algorithm is sequential per row/column. The
    surrounding arithmetic stays on device.
    """
    from scipy import ndimage

    return ndimage.distance_transform_edt(np.asarray(mask) > 0).astype(np.float32)


def medial_axis(
    mask: jax.Array, return_distance: bool = False
):
    """Centerline skeleton (+ optional EDT) of a binary mask.

    Reference call sites: compute_branches.py:275 (skeleton of Canny edges)
    and :340 (skeleton + distance for centerline enhancement). Implemented
    as Zhang-Suen thinning; the distance is the exact foreground EDT
    computed on device (ops/distance.py).
    """
    skel = skeletonize(mask)
    if not return_distance:
        return skel
    from tmat_tpu.ops.distance import edt

    return skel, edt(jnp.asarray(mask))


def gen_circ_mask(
    center: Tuple[int, int], radius: float, shape: Tuple[int, int], mask_val: int = 1
) -> np.ndarray:
    """Filled-circle mask; center is (col, row) like cv2.circle
    (preprocessing.py:96-115)."""
    rows, cols = np.mgrid[0 : shape[0], 0 : shape[1]]
    cx, cy = center
    inside = (cols - cx) ** 2 + (rows - cy) ** 2 <= radius**2
    return (inside * mask_val).astype(np.uint8)
