"""Device EDT tests vs scipy's exact implementation."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import ndimage

from tmat_tpu.ops.distance import edt, edt_batch


@pytest.mark.parametrize("shape", [(33, 47), (64, 64), (17, 128)])
def test_edt_matches_scipy(rng, shape):
    mask = rng.rand(*shape) > 0.3
    got = np.asarray(edt(jnp.asarray(mask)))
    expected = ndimage.distance_transform_edt(mask)
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_edt_all_foreground():
    mask = np.ones((16, 16), bool)
    got = np.asarray(edt(jnp.asarray(mask)))
    # no background anywhere: distances saturate large
    assert (got > 15).all()


def test_edt_all_background():
    mask = np.zeros((16, 16), bool)
    np.testing.assert_array_equal(np.asarray(edt(jnp.asarray(mask))), 0.0)


def test_edt_batch_matches_singles(rng):
    masks = rng.rand(3, 40, 40) > 0.4
    batched = np.asarray(edt_batch(jnp.asarray(masks)))
    for i in range(3):
        np.testing.assert_allclose(
            batched[i], np.asarray(edt(jnp.asarray(masks[i]))), atol=1e-6
        )
