"""Foreground thresholding: batched 2-component GMM-EM and Otsu.

Parity targets:
- preprocessing.exec_threshold (preprocessing.py:44-93): fit a 2-component
  Gaussian mixture to masked pixel intensities; threshold at
  min(255, mu_fg + sd_coef * sigma_fg) where fg is the higher-mean
  component; zero everything <= threshold.
- skimage.filters.threshold_otsu (well_mask_generation.py:273).

TPU-first design: where sklearn runs CPU EM per image, here EM is a
fixed-iteration lax.fori_loop of closed-form 1-D responsibility updates,
fully vectorized over pixels and vmappable over a plate of images. Masked
pixels participate with weight 0, so ragged masks need no gathers.
Reproducibility comes from a deterministic quantile-style init rather than
a seeded k-means (the reference's rs_seed knob); for bimodal well images
both converge to the same fixed point (validated statistically in tests,
per SURVEY §7 hard-part #2).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tmat_tpu.core.defs import MAX_UINT8

_REG_COVAR = 1e-6  # sklearn GaussianMixture default regularisation


_EM_TOL = 1e-3  # sklearn GaussianMixture default convergence tolerance
_EM_MAX_ITER = 100  # sklearn default max_iter


@partial(jax.jit, static_argnames=("n_iter",))
def gmm2_fit(
    pixels: jax.Array, weights: Optional[jax.Array] = None, n_iter: int = _EM_MAX_ITER
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fit a 1-D 2-component GMM with weighted EM, sklearn-compatible.

    Replicates sklearn GaussianMixture's ALGORITHM (not its RNG): a
    k-means hard partition init (Lloyd iterations are deterministic and
    init-independent on 1-D data) followed by EM that early-stops when
    the mean per-sample log-likelihood changes by < tol=1e-3 — the same
    criterion sklearn uses. The early stop matters for parity: on
    degenerate (unimodal / low-contrast) wells the fully-converged EM
    fixed point differs substantially from sklearn's default-tol result
    (mask IoU ~0.73 between sklearn's own default and converged fits),
    so matching the reference means matching the stopping rule.

    Args:
        pixels: flat float array of intensities.
        weights: optional per-pixel weights in [0, 1] (0 = excluded).
        n_iter: EM iteration cap (sklearn max_iter default 100).

    Returns:
        (means[2], sds[2], mixing_weights[2])
    """
    x = pixels.astype(jnp.float32).ravel()
    w = jnp.ones_like(x) if weights is None else weights.astype(jnp.float32).ravel()
    w_sum = jnp.maximum(jnp.sum(w), 1e-12)

    # --- k-means init (Lloyd, deterministic): start from the weighted-mean
    # split, then iterate midpoint repartitions to the 1-D fixed point.
    mean_all = jnp.sum(w * x) / w_sum

    def lloyd_step(_, thresh):
        below = w * (x <= thresh)
        above = w * (x > thresh)
        n0 = jnp.maximum(jnp.sum(below), 1e-12)
        n1 = jnp.maximum(jnp.sum(above), 1e-12)
        m0 = jnp.sum(below * x) / n0
        m1 = jnp.sum(above * x) / n1
        return (m0 + m1) / 2

    thresh = jax.lax.fori_loop(0, 20, lloyd_step, mean_all)
    below = w * (x <= thresh)
    above = w * (x > thresh)
    n0 = jnp.maximum(jnp.sum(below), 1e-12)
    n1 = jnp.maximum(jnp.sum(above), 1e-12)
    mu = jnp.stack([jnp.sum(below * x) / n0, jnp.sum(above * x) / n1])
    var = jnp.stack(
        [
            jnp.sum(below * (x - mu[0]) ** 2) / n0,
            jnp.sum(above * (x - mu[1]) ** 2) / n1,
        ]
    )
    var = jnp.maximum(var, _REG_COVAR)
    pi = jnp.stack([n0, n1]) / (n0 + n1)

    def em_step(state):
        mu, var, pi, _prev_ll, it = state
        # E-step: log responsibilities (K=2, broadcast over pixels)
        diff = x[None, :] - mu[:, None]  # (2, N)
        log_prob = (
            -0.5 * diff**2 / var[:, None]
            - 0.5 * jnp.log(2 * jnp.pi * var)[:, None]
            + jnp.log(pi)[:, None]
        )
        log_norm = jax.scipy.special.logsumexp(log_prob, axis=0, keepdims=True)
        ll = jnp.sum(w * log_norm[0]) / w_sum  # mean per-sample lower bound
        resp = jnp.exp(log_prob - log_norm) * w[None, :]
        # M-step
        nk = jnp.maximum(jnp.sum(resp, axis=1), 1e-12)
        mu_new = jnp.sum(resp * x[None, :], axis=1) / nk
        var_new = (
            jnp.sum(resp * (x[None, :] - mu_new[:, None]) ** 2, axis=1) / nk
            + _REG_COVAR
        )
        pi_new = nk / jnp.sum(nk)
        return mu_new, var_new, pi_new, ll, it + 1

    # while_loop carrying (mu, var, pi, (ll_prev, ll_curr), iter); stop
    # when the lower-bound change drops below tol (sklearn's rule, checked
    # after each M-step) or at the n_iter cap
    def cond(state):
        mu, var, pi, (ll_prev, ll_curr), it = state
        keep = jnp.abs(ll_curr - ll_prev) >= _EM_TOL
        return jnp.logical_and(it < n_iter, keep)

    def body(state):
        mu, var, pi, (ll_prev, ll_curr), it = state
        mu2, var2, pi2, ll_new, it2 = em_step((mu, var, pi, ll_curr, it))
        return mu2, var2, pi2, (ll_curr, ll_new), it2

    init = (mu, var, pi, (jnp.float32(-jnp.inf), jnp.float32(jnp.inf)), 0)
    mu, var, pi, _, _ = jax.lax.while_loop(cond, body, init)
    return mu, jnp.sqrt(var), pi


def gmm_foreground_threshold(
    pixels: jax.Array, sd_coef: float, weights: Optional[jax.Array] = None
) -> jax.Array:
    """Threshold value: min(255, mu_fg + sd_coef * sigma_fg)
    (preprocessing.py:83-87)."""
    mu, sd, _ = gmm2_fit(pixels, weights)
    fg = jnp.argmax(mu)
    return jnp.minimum(float(MAX_UINT8), mu[fg] + sd[fg] * sd_coef)


def exec_threshold(
    masked: jax.Array, mask: Optional[jax.Array], sd_coef: float
) -> jax.Array:
    """Zero background pixels using the GMM threshold (preprocessing.py:44-93).

    ``mask`` replaces the reference's ``mask_idx`` index list: pixels where
    mask == 0 are excluded from the fit (the reference gathers them away;
    on TPU, weighting avoids dynamic shapes). Pass None to fit all pixels.
    """
    weights = None if mask is None else (mask > 0)
    thresh = gmm_foreground_threshold(masked, sd_coef, weights)
    return jnp.where(masked <= thresh, jnp.zeros_like(masked), masked)


# Batched plate-level variant: (B, H, W) images + (B, H, W) masks
exec_threshold_batch = jax.jit(
    jax.vmap(exec_threshold, in_axes=(0, 0, None)), static_argnums=()
)


@jax.jit
def otsu_threshold(img: jax.Array, nbins: int = 256) -> jax.Array:
    """Otsu's threshold over the image's value range (skimage semantics).

    Returns the bin-center threshold maximizing inter-class variance;
    foreground is ``img >= thresh`` at the reference's call site
    (well_mask_generation.py:273-274).
    """
    x = img.astype(jnp.float32).ravel()
    lo = jnp.min(x)
    hi = jnp.max(x)
    span = jnp.maximum(hi - lo, 1e-12)
    # histogram
    idx = jnp.clip(((x - lo) / span * nbins).astype(jnp.int32), 0, nbins - 1)
    hist = jnp.zeros((nbins,), jnp.float32).at[idx].add(1.0)
    centers = lo + (jnp.arange(nbins, dtype=jnp.float32) + 0.5) * span / nbins

    w0 = jnp.cumsum(hist)
    w1 = w0[-1] - w0
    sum0 = jnp.cumsum(hist * centers)
    mu0 = sum0 / jnp.maximum(w0, 1e-12)
    mu1 = (sum0[-1] - sum0) / jnp.maximum(w1, 1e-12)
    between = w0 * w1 * (mu0 - mu1) ** 2
    # skimage takes argmax over bins with both classes nonempty
    between = jnp.where((w0 > 0) & (w1 > 0), between, -1.0)
    return centers[jnp.argmax(between)]
