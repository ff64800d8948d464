"""GMM-EM threshold and Otsu tests, validated statistically vs sklearn."""

import numpy as np
import jax.numpy as jnp

from tmat_tpu.ops import threshold


def _bimodal_image(rng, shape=(64, 64), fg_frac=0.3, mu_bg=0.2, mu_fg=0.7, sd=0.05):
    img = rng.normal(mu_bg, sd, size=shape)
    n_fg = int(fg_frac * img.size)
    idx = rng.choice(img.size, n_fg, replace=False)
    img.ravel()[idx] = rng.normal(mu_fg, sd, size=n_fg)
    return np.clip(img, 0, 1).astype(np.float32)


def test_gmm2_recovers_components(rng):
    img = _bimodal_image(rng)
    mu, sd, pi = threshold.gmm2_fit(jnp.asarray(img.ravel()))
    mu = np.sort(np.asarray(mu))
    assert abs(mu[0] - 0.2) < 0.02
    assert abs(mu[1] - 0.7) < 0.02


def test_gmm_matches_sklearn_threshold(rng):
    from sklearn.mixture import GaussianMixture

    img = _bimodal_image(rng)
    pixels = img.ravel()[:, None]
    gm = GaussianMixture(n_components=2, random_state=np.random.RandomState(0))
    gm.fit(pixels)
    means = gm.means_.squeeze()
    sds = np.sqrt(gm.covariances_.squeeze())
    fg = np.argmax(means)
    for sd_coef in (0.0, -1.0, 1.0):
        ref_thresh = min(255.0, means[fg] + sds[fg] * sd_coef)
        got = float(
            threshold.gmm_foreground_threshold(jnp.asarray(img.ravel()), sd_coef)
        )
        assert abs(got - ref_thresh) < 5e-3, (sd_coef, got, ref_thresh)


def test_exec_threshold_zeroes_background(rng):
    img = _bimodal_image(rng)
    out = np.asarray(threshold.exec_threshold(jnp.asarray(img), None, 0.0))
    # Background cluster should be zeroed; retained pixels keep their value
    assert (out == 0).mean() > 0.5
    kept = out[out > 0]
    assert kept.min() > 0.4
    np.testing.assert_array_equal(out[out > 0], img[out > 0])


def test_exec_threshold_respects_mask(rng):
    img = _bimodal_image(rng)
    mask = np.zeros_like(img)
    mask[16:48, 16:48] = 1
    masked_img = img * mask
    out = np.asarray(
        threshold.exec_threshold(jnp.asarray(masked_img), jnp.asarray(mask), 0.0)
    )
    assert out.shape == img.shape
    # pixels outside the mask are zero in the masked input and stay zero
    assert (out[mask == 0] == 0).all()


def test_exec_threshold_batch(rng):
    imgs = np.stack([_bimodal_image(rng) for _ in range(3)])
    masks = np.ones_like(imgs)
    out = np.asarray(
        threshold.exec_threshold_batch(jnp.asarray(imgs), jnp.asarray(masks), 0.0)
    )
    for i in range(3):
        single = np.asarray(
            threshold.exec_threshold(jnp.asarray(imgs[i]), jnp.asarray(masks[i]), 0.0)
        )
        np.testing.assert_allclose(out[i], single, atol=1e-5)


def test_otsu_bimodal(rng):
    img = _bimodal_image(rng)
    t = float(threshold.otsu_threshold(jnp.asarray(img)))
    assert 0.3 < t < 0.6


def test_otsu_matches_histogram_reference(rng):
    """Compare against a direct NumPy Otsu implementation."""
    img = (rng.rand(48, 48) * 255).astype(np.float32)
    img[10:30, 10:30] += 300
    t = float(threshold.otsu_threshold(jnp.asarray(img)))

    x = img.ravel()
    hist, edges = np.histogram(x, bins=256)
    centers = (edges[:-1] + edges[1:]) / 2
    w0 = np.cumsum(hist).astype(float)
    w1 = w0[-1] - w0
    s0 = np.cumsum(hist * centers)
    mu0 = s0 / np.maximum(w0, 1e-12)
    mu1 = (s0[-1] - s0) / np.maximum(w1, 1e-12)
    between = np.where((w0 > 0) & (w1 > 0), w0 * w1 * (mu0 - mu1) ** 2, -1)
    ref = centers[np.argmax(between)]
    assert abs(t - ref) < (x.max() - x.min()) / 128
