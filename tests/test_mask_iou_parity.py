"""North-star quality check: mask IoU vs the reference's exact math.

The driver's target is mask IoU >= 0.99 vs the reference pipeline
(BASELINE.json). The reference thresholds with sklearn's GaussianMixture
(preprocessing.py:44-93); here we reproduce its exact library math on the
host and require IoU >= 0.99 against our device GMM-EM masks across a
range of synthetic wells and sd_coef settings.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from sklearn.mixture import GaussianMixture

from tmat_tpu.core.defs import MAX_UINT8
from tmat_tpu.ops.rescale import rescale_intensity
from tmat_tpu.ops.threshold import exec_threshold


def _reference_mask(img: np.ndarray, sd_coef: float, seed: int = 0) -> np.ndarray:
    """Direct port of the reference's mask_and_threshold math
    (compute_cell_area.py:60-87 + preprocessing.py:44-93) using sklearn."""
    lo, hi = img.min(), img.max()
    scaled = (img - lo) / max(hi - lo, 1e-38)
    pixels = scaled.reshape(-1, 1)
    gm = GaussianMixture(n_components=2, random_state=np.random.RandomState(seed))
    gm.fit(pixels)
    means = gm.means_.squeeze()
    sds = np.sqrt(gm.covariances_.squeeze())
    fg = np.argmax(means)
    thresh = min(MAX_UINT8, means[fg] + sds[fg] * sd_coef)
    return scaled > thresh


def _our_mask(img: np.ndarray, sd_coef: float) -> np.ndarray:
    scaled = rescale_intensity(jnp.asarray(img, jnp.float32), (0, 1))
    out = exec_threshold(scaled, None, sd_coef)
    return np.asarray(out) > 0


def _synthetic_well(rng, fg_level, bg_level, fg_frac=0.25, shape=(128, 128)):
    img = rng.normal(bg_level, 8, size=shape)
    n_fg = int(fg_frac * img.size)
    idx = rng.choice(img.size, n_fg, replace=False)
    img.ravel()[idx] = rng.normal(fg_level, 12, size=n_fg)
    return np.clip(img, 0, 255).astype(np.float32)


@pytest.mark.parametrize("sd_coef", [-2.0, -1.0, 0.0, 1.0])
@pytest.mark.parametrize("levels", [(180, 40), (200, 80), (120, 30)])
def test_mask_iou_vs_sklearn_reference(sd_coef, levels):
    rng = np.random.RandomState(42)
    img = _synthetic_well(rng, *levels)
    ref = _reference_mask(img, sd_coef)
    ours = _our_mask(img, sd_coef)
    union = (ref | ours).sum()
    if union == 0:
        return  # both empty: identical
    iou = (ref & ours).sum() / union
    assert iou >= 0.99, (sd_coef, levels, iou)


@pytest.mark.parametrize("sd_coef", [-1.0, 0.0])
@pytest.mark.parametrize("case", ["unimodal", "low_contrast", "near_empty"])
def test_mask_iou_edge_cases(case, sd_coef):
    """EM inits genuinely diverge on degenerate intensity histograms
    (VERDICT r1 weak #7): unimodal wells, low fg/bg contrast, and
    near-empty wells. Require IoU >= 0.99 against sklearn, or — when the
    masks themselves are near-degenerate — a symmetric difference of at
    most 1% of pixels (IoU is unstable when the union is tiny)."""
    rng = np.random.RandomState(7)
    if case == "unimodal":
        img = np.clip(rng.normal(90, 10, (128, 128)), 0, 255).astype(np.float32)
    elif case == "low_contrast":
        img = _synthetic_well(rng, 70, 50)
    else:  # near-empty well: 1% foreground
        img = _synthetic_well(rng, 180, 40, fg_frac=0.01)
    ref = _reference_mask(img, sd_coef)
    ours = _our_mask(img, sd_coef)
    union = (ref | ours).sum()
    iou = (ref & ours).sum() / union if union else 1.0
    sym_diff = (ref ^ ours).mean()
    assert iou >= 0.99 or sym_diff <= 0.01, (case, sd_coef, iou, sym_diff)
