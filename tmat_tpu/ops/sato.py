"""Multi-scale Sato tubeness (vesselness) filter on device.

Parity target: skimage.filters.sato as called at compute_branches.py:262-264
(sigmas {1,2,3,4,5,7,9,11,13,15}, black_ridges=False) on each pairwise-max
of consecutive Z slices.

Implementation: the classic Sato/ImageJ-tubeness line measure — for each
scale, the scale-normalized response sigma^2 * max(-lambda_min, 0) where
lambda_min is the smaller eigenvalue of the Gaussian Hessian (bright ridges
give a strongly negative cross-ridge eigenvalue); the output is the max
over scales. Gaussian second derivatives are exact sampled
Hermite-polynomial kernels (scipy.ndimage.gaussian_filter semantics,
'reflect' boundary).

TPU-first: the reference loops scales x slices on CPU (its hot loop #2,
SURVEY §3.1). Here each scale is a separable convolution batched over the
whole (Z, H, W) stack, and scales reduce with a running maximum inside one
jit — HBM is read once per scale with everything else fused.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tmat_tpu.ops.filters import sepconv2d

DEFAULT_SIGMAS = (1, 2, 3, 4, 5, 7, 9, 11, 13, 15)


def gaussian_deriv_kernel(sigma: float, order: int, truncate: float = 4.0) -> np.ndarray:
    """Sampled Gaussian-derivative kernel (scipy _gaussian_kernel1d)."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    g = np.exp(-0.5 * (x / sigma) ** 2)
    g = g / g.sum()
    if order == 0:
        return g.astype(np.float32)
    # exponent-weighted polynomial q(x) with q' recursion (scipy semantics)
    exponent_range = np.arange(order + 1)
    q = np.zeros(order + 1)
    q[0] = 1
    D = np.diag(exponent_range[1:], 1)  # d/dx
    P = np.diag(np.ones(order) / -(sigma**2), -1)  # * -x/sigma^2
    Q_deriv = D + P
    for _ in range(order):
        q = Q_deriv.dot(q)
    q_of_x = (x[:, None] ** exponent_range).dot(q)
    return (q_of_x * g).astype(np.float32)


def _hessian_eig_min(img: jax.Array, sigma: float) -> jax.Array:
    """Smaller eigenvalue of the Gaussian Hessian at scale sigma."""
    g0 = gaussian_deriv_kernel(sigma, 0)
    g1 = gaussian_deriv_kernel(sigma, 1)
    g2 = gaussian_deriv_kernel(sigma, 2)
    # correlation with these kernels == scipy.ndimage convolve1d semantics
    # (the order-1 kernel is odd; scipy correlates with the sampled
    # derivative which equals convolution with its flip)
    hrr = sepconv2d(img, g2[::-1].copy(), g0, mode="symmetric")
    hcc = sepconv2d(img, g0, g2[::-1].copy(), mode="symmetric")
    hrc = sepconv2d(img, g1[::-1].copy(), g1[::-1].copy(), mode="symmetric")
    half_trace = (hrr + hcc) / 2
    disc = jnp.sqrt(((hrr - hcc) / 2) ** 2 + hrc**2)
    return half_trace - disc


@partial(jax.jit, static_argnames=("sigmas", "black_ridges"))
def sato(
    img: jax.Array,
    sigmas: Tuple[float, ...] = DEFAULT_SIGMAS,
    black_ridges: bool = False,
) -> jax.Array:
    """Multi-scale tubeness of (..., H, W) images (max over scales)."""
    work = img.astype(jnp.float32)
    if black_ridges:
        work = -work
    out = jnp.zeros_like(work)
    for sigma in sigmas:
        lam_min = _hessian_eig_min(work, float(sigma))
        response = (sigma**2) * jnp.maximum(-lam_min, 0.0)
        out = jnp.maximum(out, response)
    return out
