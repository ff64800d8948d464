"""Synthetic vessel data generator tests."""

import numpy as np

from tmat_tpu.models.synthetic import generate_dataset, synth_vessel_image


def test_image_mask_properties():
    rng = np.random.RandomState(3)
    img, mask = synth_vessel_image(rng, 128)
    assert img.shape == mask.shape == (128, 128)
    assert img.dtype == np.uint8 and mask.dtype == np.uint8
    assert set(np.unique(mask)) <= {0, 255}
    frac = (mask > 0).mean()
    assert 0.01 < frac < 0.6
    # vessels are brighter than background on average
    assert img[mask > 0].mean() > img[mask == 0].mean() + 20


def test_deterministic_given_seed(tmp_path):
    a = synth_vessel_image(np.random.RandomState(7), 64)
    b = synth_vessel_image(np.random.RandomState(7), 64)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_generate_dataset_files(tmp_path):
    generate_dataset(tmp_path, n=3, size=48)
    assert len(list(tmp_path.glob("s*_mask.tif"))) == 3
    assert len(list(tmp_path.glob("s*.tif"))) == 6  # images + masks
