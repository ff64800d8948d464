"""Pallas focus-stacking kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tmat_tpu.ops.pallas_zproj import proj_focus_stacking_pallas
from tmat_tpu.ops.zproj import _focus_stack_zhw


@pytest.mark.parametrize("shape", [(5, 100, 150), (3, 64, 64), (8, 33, 257)])
def test_pallas_matches_xla_interpret(rng, shape):
    stack = (rng.rand(*shape) * 255).astype(np.float32)
    got = np.asarray(
        proj_focus_stacking_pallas(jnp.asarray(stack), tile=64, interpret=True)
    )
    expected = np.asarray(_focus_stack_zhw(jnp.asarray(stack)))
    np.testing.assert_array_equal(got, expected)


def test_pallas_integer_dtype_roundtrip(rng):
    stack = rng.randint(0, 65535, size=(4, 40, 40)).astype(np.uint16)
    got = np.asarray(
        proj_focus_stacking_pallas(jnp.asarray(stack), tile=64, interpret=True)
    )
    assert got.dtype == np.uint16
    expected = np.asarray(_focus_stack_zhw(jnp.asarray(stack)))
    np.testing.assert_array_equal(got, expected)
