"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmat_tpu.parallel import mesh as M
from tmat_tpu.parallel import plate as PL


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest should force 8 CPU devices"
    return M.make_mesh(axis_names=("data",))


def test_make_mesh_shapes():
    m = M.make_mesh((4, 2), ("data", "space"))
    assert m.shape == {"data": 4, "space": 2}
    with pytest.raises(ValueError):
        M.make_mesh((16,))


def test_pad_to_multiple():
    arr = np.ones((6, 3))
    padded, n = M.pad_to_multiple(arr, 8)
    assert padded.shape == (8, 3)
    assert n == 6


def test_plate_zproj_sharded_matches_numpy(mesh8, rng):
    stacks = rng.randint(0, 255, size=(8, 4, 16, 16)).astype(np.float32)
    for method in ("max", "min", "avg", "med", "fs"):
        out = np.asarray(PL.plate_zproj(mesh8, jnp.asarray(stacks), method))
        assert out.shape == (8, 16, 16)
        if method == "max":
            np.testing.assert_array_equal(out, stacks.max(1))


def test_plate_threshold_sharded(mesh8, rng):
    imgs = rng.normal(0.2, 0.05, size=(8, 32, 32)).astype(np.float32)
    imgs[:, 8:20, 8:20] = rng.normal(0.8, 0.05, size=(8, 12, 12))
    out = np.asarray(PL.plate_threshold(mesh8, jnp.asarray(imgs), -2.0))
    assert out.shape == imgs.shape
    # foreground square survives, background mostly zeroed
    assert out[:, 10:18, 10:18].mean() > 0.9
    assert out[:, :4, :4].mean() < 0.1


def test_plate_segment_sharded_identity(mesh8, rng):
    imgs = rng.rand(8, 24, 24).astype(np.float32)

    def identity(batch):
        return batch

    out = np.asarray(PL.plate_segment(mesh8, jnp.asarray(imgs), identity, 8, 2))
    assert out.shape == imgs.shape
    np.testing.assert_allclose(out, imgs, atol=1e-4)


def test_graft_entry_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_entry_forward_shape():
    import __graft_entry__ as g

    fn, (variables, x) = g.entry()
    out_shape = jax.eval_shape(fn, variables, x)
    assert out_shape.shape == (8, 320, 320, 1)
