"""Separable convolution filters: Gaussian, Laplacian, Sobel, unsharp mask.

These re-implement the exact kernels the reference obtains from OpenCV and
scikit-image, as batched XLA convolutions:

- ``gaussian_blur_cv2``: cv2.GaussianBlur(k, sigma=0) — OpenCV's fixed
  binomial kernels for k in {1,3,5,7} (zstacks.py:149 uses k=5).
- ``laplacian_cv2``: cv2.Laplacian(ksize) — sum of two separable
  Sobel second-derivative passes (zstacks.py:150).
- ``gaussian``: skimage.filters.gaussian (sigma, truncate=4, nearest border)
  used across well_mask_generation.py:245 and compute_branches.py:247.
- ``sobel_h/sobel_v``: skimage Sobel kernels for Canny.
- ``unsharp_mask``: skimage.filters.unsharp_mask (compute_branches.py:269).

All ops take float arrays shaped (..., H, W); leading axes are batch.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# OpenCV's fixed "small gaussian" kernels for ksize in {1,3,5,7} with sigma<=0
_CV2_SMALL_GAUSSIAN = {
    1: np.array([1.0]),
    3: np.array([0.25, 0.5, 0.25]),
    5: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625]),
    7: np.array([0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125]),
}


def cv2_gaussian_kernel(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """OpenCV getGaussianKernel semantics (fixed kernels when sigma<=0, k<=7)."""
    if sigma <= 0 and ksize in _CV2_SMALL_GAUSSIAN:
        return _CV2_SMALL_GAUSSIAN[ksize].astype(np.float32)
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize) - (ksize - 1) * 0.5
    k = np.exp(-(x**2) / (2 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def cv2_deriv_kernel(order: int, ksize: int) -> np.ndarray:
    """OpenCV getDerivKernels: binomial smoothing convolved with differences."""
    k = np.array([1.0])
    for i in range(ksize - 1):
        if i < ksize - order - 1:
            k = np.convolve(k, [1.0, 1.0])
        else:
            k = np.convolve(k, [1.0, -1.0])
    return k.astype(np.float32)


def gaussian_kernel_1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """scipy/skimage-style Gaussian kernel (radius = int(truncate*sigma+0.5))."""
    radius = int(truncate * float(sigma) + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / float(sigma)) ** 2)
    return (k / k.sum()).astype(np.float32)


def _pad_mode(mode: str) -> str:
    return {
        "reflect": "reflect",  # cv2 BORDER_REFLECT_101 / np 'reflect'
        "nearest": "edge",  # scipy 'nearest' / np 'edge'
        "mirror": "reflect",
        "symmetric": "symmetric",  # cv2 BORDER_REFLECT
        "constant": "constant",
    }[mode]


def sepconv2d(
    img: jax.Array,
    kernel_y: Sequence[float],
    kernel_x: Sequence[float],
    mode: str = "reflect",
) -> jax.Array:
    """Separable 2-D correlation over the trailing (H, W) axes.

    Kernels are symmetric for every use here, so correlation == convolution.
    Runs as two grouped 1-D XLA convolutions (VPU-friendly; XLA fuses the
    padding and both passes).
    """
    kernel_y = jnp.asarray(kernel_y, img.dtype)
    kernel_x = jnp.asarray(kernel_x, img.dtype)
    batch_shape = img.shape[:-2]
    h, w = img.shape[-2:]
    x = img.reshape((-1, 1, h, w))

    ry = (len(kernel_y) - 1) // 2
    rx = (len(kernel_x) - 1) // 2
    pad = [(0, 0), (0, 0), (ry, len(kernel_y) - 1 - ry), (rx, len(kernel_x) - 1 - rx)]
    x = jnp.pad(x, pad, mode=_pad_mode(mode))

    ky = kernel_y.reshape(1, 1, -1, 1)
    kx = kernel_x.reshape(1, 1, 1, -1)
    dn = jax.lax.conv_dimension_numbers(x.shape, ky.shape, ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, ky, (1, 1), "VALID", dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kx, (1, 1), "VALID", dimension_numbers=dn)
    return x.reshape(batch_shape + (h, w))


def gaussian_blur_cv2(img: jax.Array, ksize: int = 5, sigma: float = 0.0) -> jax.Array:
    """cv2.GaussianBlur with BORDER_REFLECT_101 (zstacks.py:149)."""
    k = cv2_gaussian_kernel(ksize, sigma)
    return sepconv2d(img, k, k, mode="reflect")


def laplacian_cv2(img: jax.Array, ksize: int = 5) -> jax.Array:
    """cv2.Laplacian(CV_64F, ksize) = Sobel(2,0,k) + Sobel(0,2,k) (zstacks.py:150)."""
    deriv = cv2_deriv_kernel(2, ksize)
    smooth = cv2_deriv_kernel(0, ksize)
    dyy = sepconv2d(img, deriv, smooth, mode="reflect")
    dxx = sepconv2d(img, smooth, deriv, mode="reflect")
    return dyy + dxx


def gaussian(
    img: jax.Array, sigma: float, mode: str = "nearest", truncate: float = 4.0
) -> jax.Array:
    """skimage.filters.gaussian (preserve_range semantics, no rescale)."""
    if sigma <= 0:
        return img
    k = gaussian_kernel_1d(sigma, truncate)
    return sepconv2d(img, k, k, mode=mode)


# skimage Sobel kernels (smoothing [1,2,1]/4, derivative [1,0,-1]/2)
_SOBEL_SMOOTH = np.array([0.25, 0.5, 0.25], np.float32)
_SOBEL_DERIV = np.array([0.5, 0.0, -0.5], np.float32)


def sobel_h(img: jax.Array) -> jax.Array:
    """Horizontal-edge Sobel (derivative along rows), skimage convention."""
    return sepconv2d(img, _SOBEL_DERIV, _SOBEL_SMOOTH, mode="reflect")


def sobel_v(img: jax.Array) -> jax.Array:
    """Vertical-edge Sobel (derivative along columns), skimage convention."""
    return sepconv2d(img, _SOBEL_SMOOTH, _SOBEL_DERIV, mode="reflect")


def unsharp_mask(
    img: jax.Array, radius: float = 1.0, amount: float = 1.0
) -> jax.Array:
    """skimage.filters.unsharp_mask with preserve_range=False semantics.

    skimage first rescales input to float in [0, 1] (img_as_float), sharpens
    with result = img + amount * (img - gaussian(img, radius)), then clips to
    the valid [0, 1] range (compute_branches.py:269 relies on this on a
    float vesselness image already in [0, 1], where img_as_float is identity
    apart from dtype).
    """
    blurred = gaussian(img, radius, mode="nearest")
    result = img + amount * (img - blurred)
    return jnp.clip(result, 0.0, 1.0)


def conv1d_axis(
    img: jax.Array, kernel: Sequence[float], axis: int, mode: str = "nearest"
) -> jax.Array:
    """1-D correlation along an arbitrary axis."""
    kernel = jnp.asarray(kernel, img.dtype)
    x = jnp.moveaxis(img, axis, -1)
    shape = x.shape
    length = shape[-1]
    r = (len(kernel) - 1) // 2
    flat = x.reshape((-1, 1, length))
    flat = jnp.pad(
        flat, [(0, 0), (0, 0), (r, len(kernel) - 1 - r)], mode=_pad_mode(mode)
    )
    k = kernel.reshape(1, 1, -1)
    dn = jax.lax.conv_dimension_numbers(flat.shape, k.shape, ("NCH", "OIH", "NCH"))
    out = jax.lax.conv_general_dilated(flat, k, (1,), "VALID", dimension_numbers=dn)
    return jnp.moveaxis(out.reshape(shape), -1, axis)


def gaussian_nd(
    img: jax.Array, sigma: float, mode: str = "nearest", truncate: float = 4.0
) -> jax.Array:
    """N-D Gaussian blur over ALL axes (skimage.filters.gaussian on an N-D
    array, as unsharp_mask receives the full (Z, H, W) stack at
    compute_branches.py:269)."""
    if sigma <= 0:
        return img
    k = gaussian_kernel_1d(sigma, truncate)
    out = img
    for axis in range(img.ndim):
        out = conv1d_axis(out, k, axis, mode)
    return out


def unsharp_mask_nd(img: jax.Array, radius: float, amount: float) -> jax.Array:
    """skimage.filters.unsharp_mask over all axes of a [0, 1] float array."""
    blurred = gaussian_nd(img, radius, mode="nearest")
    return jnp.clip(img + amount * (img - blurred), 0.0, 1.0)


def median3x3(img: jax.Array) -> jax.Array:
    """3x3 median filter via sorting networks over the 9 shifted taps."""
    pads = jnp.pad(img, [(0, 0)] * (img.ndim - 2) + [(1, 1), (1, 1)], mode="edge")
    h, w = img.shape[-2:]
    taps = [
        pads[..., dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)
    ]
    stack = jnp.stack(taps, axis=0)
    return jnp.median(stack, axis=0)
