"""Model architecture tests: shapes, parameter structure, ensemble vmap."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tmat_tpu.models import unet as unet_mod
from tmat_tpu.models import resnet as resnet_mod
from tmat_tpu.models.params_io import save_params, load_params
from tmat_tpu.models.preprocess import prep_inv_depth_imgs, resnet50_preprocess


class TestUNet:
    def test_output_shape_and_range(self):
        model, variables = unet_mod.build_unet_xception(
            1, (64, 64), channels=1, filter_counts=(8, 16, 32)
        )
        x = jnp.zeros((2, 64, 64, 1))
        y = model.apply(variables, x, train=False)
        assert y.shape == (2, 64, 64, 1)
        y = np.asarray(y)
        assert (y >= 0).all() and (y <= 1).all()

    def test_filter_count_validation(self):
        with pytest.raises(AssertionError):
            unet_mod.build_unet_xception(1, (64, 64), filter_counts=(8, 24, 32))

    def test_filter_counts_sorted(self):
        # unordered but valid counts are sorted (models.py:112)
        model, variables = unet_mod.build_unet_xception(
            1, (32, 32), filter_counts=(16, 8, 32)
        )
        y = model.apply(variables, jnp.zeros((1, 32, 32, 1)), train=False)
        assert y.shape == (1, 32, 32, 1)

    def test_params_roundtrip(self, tmp_path):
        model, variables = unet_mod.build_unet_xception(
            1, (32, 32), filter_counts=(8, 16)
        )
        path = tmp_path / "ckpt.msgpack"
        save_params(path, variables)
        loaded = load_params(path, variables)
        x = jnp.ones((1, 32, 32, 1))
        np.testing.assert_array_equal(
            np.asarray(model.apply(variables, x, train=False)),
            np.asarray(model.apply(loaded, x, train=False)),
        )


class TestResNet:
    @pytest.mark.parametrize(
        "last_layer,expect_ch,expect_hw",
        [("conv4_block6_out", 1024, 4), ("conv5_block3_out", 2048, 2)],
    )
    def test_truncation_points(self, last_layer, expect_ch, expect_hw):
        base = resnet_mod.ResNet50Base(last_layer)
        variables = base.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        y = base.apply(variables, jnp.zeros((1, 64, 64, 3)))
        assert y.shape == (1, expect_hw, expect_hw, expect_ch)

    def test_tl_head(self):
        model, variables = resnet_mod.build_resnet50_tl(
            1, (64, 64, 3), base_last_layer="conv4_block6_out"
        )
        y = model.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
        assert y.shape == (2, 1)
        y = np.asarray(y)
        assert ((y >= 0) & (y <= 1)).all()

    def test_bad_layer_raises(self):
        with pytest.raises(ValueError):
            resnet_mod.build_resnet50_tl(1, (64, 64, 3), base_last_layer="conv6_block1_out")

    def test_ensemble_vmap_matches_singles(self):
        model, v0 = resnet_mod.build_resnet50_tl(
            1, (32, 32, 3), base_last_layer="conv4_block6_out", seed=0
        )
        _, v1 = resnet_mod.build_resnet50_tl(
            1, (32, 32, 3), base_last_layer="conv4_block6_out", seed=1
        )
        stacked = resnet_mod.stack_ensemble_variables([v0, v1])
        apply_fn = resnet_mod.make_ensemble_apply(model)
        x = jnp.asarray(np.random.RandomState(0).rand(3, 32, 32, 3), jnp.float32)
        ys = np.asarray(apply_fn(stacked, x))
        assert ys.shape == (2, 3, 1)
        np.testing.assert_allclose(
            ys[0], np.asarray(model.apply(v0, x, train=False)), atol=1e-5
        )
        np.testing.assert_allclose(
            ys[1], np.asarray(model.apply(v1, x, train=False)), atol=1e-5
        )


class TestPreprocess:
    def test_caffe_preprocess(self):
        x = jnp.ones((1, 4, 4, 3)) * jnp.array([10.0, 20.0, 30.0])
        out = np.asarray(resnet50_preprocess(x))
        # channel order flipped then mean-subtracted
        np.testing.assert_allclose(out[..., 0], 30.0 - 103.939, atol=1e-5)
        np.testing.assert_allclose(out[..., 2], 10.0 - 123.68, atol=1e-5)

    def test_prep_inv_depth_shape(self, rng):
        stack = rng.randint(0, 4095, size=(5, 100, 120)).astype(np.float32)
        out = np.asarray(prep_inv_depth_imgs(jnp.asarray(stack), (64, 64)))
        assert out.shape == (5, 64, 64, 3)
        # per-slice rescale to 0..255 before mean subtraction
        assert out.max() <= 255.0
        assert out.min() >= -123.69


def test_upsample_conv_commute():
    """The up-block residual computes conv1x1 BEFORE nearest upsampling
    (models/unet.py); pointwise conv commutes with pixel replication
    bit-exactly, so this must equal the reference order (conv after
    upsample, models.py:85-171) with the same weights."""
    import flax.linen as nn

    class RefOrder(nn.Module):
        @nn.compact
        def __call__(self, p):
            return nn.Conv(8, (1, 1), padding="SAME", name="c")(
                unet_mod._upsample2(p)
            )

    class FastOrder(nn.Module):
        @nn.compact
        def __call__(self, p):
            return unet_mod._upsample2(
                nn.Conv(8, (1, 1), padding="SAME", name="c")(p)
            )

    p = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 12), jnp.float32)
    variables = RefOrder().init(jax.random.PRNGKey(0), p)
    ref = RefOrder().apply(variables, p)
    fast = FastOrder().apply(variables, p)
    assert bool(jnp.all(ref == fast))
