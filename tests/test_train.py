"""Training harness tests: steps reduce loss, schedules, two-stage TL,
grid search, data generators, augmentations."""

import csv
import json

import numpy as np
import optax
import pytest
from PIL import Image

from tmat_tpu.models import train as T
from tmat_tpu.models.augment import (
    augment_invasion_imgs,
    elastic_distortion,
    get_elastic_dual_transform,
    random_flip_rotate_crop,
)
from tmat_tpu.models.data import (
    BinaryMaskSequence,
    InvasionDataGenerator,
    balanced_class_weights_from_counts,
    get_train_val_split,
)
from tmat_tpu.models.resnet import build_resnet50_tl
from tmat_tpu.models.unet import build_unet_xception


def _toy_seg_batch(rng, n=4, hw=32):
    y = np.zeros((n, hw, hw, 1), np.float32)
    y[:, 8:24, 8:24] = 1.0
    x = y * 2.0 + rng.rand(n, hw, hw, 1).astype(np.float32) * 0.1
    return x, y


class TestSchedules:
    def test_warmup_linear_then_constant(self):
        sched = T.warmup_schedule(10, 1e-3)
        assert float(sched(0)) == pytest.approx(1e-4)
        assert float(sched(9)) == pytest.approx(1e-3)
        assert float(sched(50)) == pytest.approx(1e-3)

    def test_warmup_into_schedule(self):
        inner = T.cosine_decay_restarts(1e-2, 100, t_mul=1.0, m_mul=0.5)
        sched = T.warmup_schedule(5, inner)
        assert float(sched(0)) < float(sched(4))
        # after warmup follows the cosine
        assert float(sched(5)) == pytest.approx(float(inner(1)), rel=1e-5)

    def test_cosine_restarts_cycles(self):
        sched = T.cosine_decay_restarts(1.0, 10, t_mul=1.0, m_mul=0.5)
        assert float(sched(0)) == pytest.approx(1.0)
        assert float(sched(10)) == pytest.approx(0.5, abs=1e-5)  # restart, m_mul
        assert float(sched(5)) < 1.0

    def test_cosine_restarts_geometric(self):
        sched = T.cosine_decay_restarts(1.0, 10, t_mul=2.0, m_mul=1.0)
        # restart boundaries at 10, 30, 70
        assert float(sched(10)) == pytest.approx(1.0, abs=1e-4)
        assert float(sched(30)) == pytest.approx(1.0, abs=1e-4)


class TestUNetTraining:
    def test_loss_decreases(self, rng):
        model, variables = build_unet_xception(
            1, (32, 32), channels=1, filter_counts=(8, 16)
        )
        tx = optax.adam(1e-3)
        state = T.init_train_state(variables, tx)
        step = T.make_unet_train_step(model, tx)
        x, y = _toy_seg_batch(rng)
        losses = []
        for _ in range(15):
            state, metrics = step(state, x, y, None)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0] * 0.8

    def test_mean_iou_coef(self):
        import jax.numpy as jnp

        y = jnp.zeros((1, 4, 4, 1)).at[0, :2].set(1.0)
        perfect = T.mean_iou_coef(y, y)
        assert float(perfect) == pytest.approx(1.0)
        none = T.mean_iou_coef(y, jnp.zeros_like(y))
        assert float(none) < 0.2

    def test_fit_early_stopping_and_checkpoint(self, rng, tmp_path):
        model, variables = build_unet_xception(
            1, (32, 32), channels=1, filter_counts=(8, 16)
        )
        tx = optax.adam(1e-3)
        state = T.init_train_state(variables, tx)
        step = T.make_unet_train_step(model, tx)
        eval_step = T.make_unet_eval_step(model)
        x, y = _toy_seg_batch(rng)
        ckpt = tmp_path / "best.msgpack"
        state, result, best = T.fit(
            state,
            step,
            eval_step,
            lambda: [(x, y, None)],
            lambda: [(x, y)],
            epochs=5,
            monitor="val_loss",
            checkpoint_path=str(ckpt),
        )
        assert ckpt.is_file()
        assert len(result.history["loss"]) == 5
        assert "val_loss" in result.history
        assert best is not None


class TestTwoStageTL:
    def test_frozen_stage_keeps_base_params(self, rng):
        model, variables = build_resnet50_tl(
            1, (32, 32, 3), base_last_layer="conv4_block6_out"
        )
        x = rng.rand(2, 32, 32, 3).astype(np.float32)
        y = np.array([[0.0], [1.0]], np.float32)

        state, frozen_res, ft_res = T.two_stage_tl_fit(
            model,
            variables,
            lambda: [(x, y)],
            None,
            frozen_lr=1e-3,
            fine_tune_lr=1e-4,
            frozen_epochs=2,
            fine_tune_epochs=1,
        )
        assert len(frozen_res.history["loss"]) == 2
        assert len(ft_res.history["loss"]) == 1

    def test_masked_optimizer_freezes_base(self, rng):
        import jax

        model, variables = build_resnet50_tl(
            1, (32, 32, 3), base_last_layer="conv4_block6_out"
        )
        params = variables["params"]
        tx = T.make_tl_optimizer(params, 1e-2, base_trainable=False)
        state = T.TrainState(params, variables.get("batch_stats", {}), tx.init(params), 0)
        step = T.make_classifier_train_step(model, tx)
        x = rng.rand(2, 32, 32, 3).astype(np.float32)
        y = np.array([[0.0], [1.0]], np.float32)
        new_state, _ = step(state, x, y)
        base_before = jax.tree.leaves(params["base_model"])
        base_after = jax.tree.leaves(new_state.params["base_model"])
        for b, a in zip(base_before, base_after):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
        head_before = jax.tree.leaves(params["head"])
        head_after = jax.tree.leaves(new_state.params["head"])
        assert any(
            not np.array_equal(np.asarray(b), np.asarray(a))
            for b, a in zip(head_before, head_after)
        )


class TestGridSearch:
    def test_search_persists_best(self, rng, tmp_path):
        x, y = _toy_seg_batch(rng, n=2, hw=32)
        search = T.UNetXceptionGridSearch(
            str(tmp_path), [(4, 8), (8, 16)], [lambda: optax.adam(1e-3)], 1, (32, 32)
        )
        best_fc, best = search.search(
            "loss", "min", lambda: [(x, y, None)], epochs=2
        )
        assert best_fc in ((4, 8), (8, 16))
        assert (tmp_path / "best_model_hps.json").is_file()
        meta = json.loads((tmp_path / "best_model_hps.json").read_text())
        assert meta["best_hps"]["filter_counts"] == list(best_fc)


class TestData:
    def _write_pairs(self, tmp_path, n=4, hw=16, rng=None):
        rng = rng or np.random.RandomState(0)
        img_paths, mask_paths = [], []
        for i in range(n):
            img = (rng.rand(hw, hw) * 255).astype(np.uint8)
            mask = (rng.rand(hw, hw) > 0.5).astype(np.uint8) * 255
            ip = tmp_path / f"s{i}.tif"
            mp = tmp_path / f"s{i}_mask.tif"
            Image.fromarray(img).save(ip)
            Image.fromarray(mask).save(mp)
            img_paths.append(str(ip))
            mask_paths.append(str(mp))
        return img_paths, mask_paths

    def test_binary_mask_sequence(self, tmp_path, rng):
        img_paths, mask_paths = self._write_pairs(tmp_path, rng=rng)
        seq = BinaryMaskSequence(
            2, img_paths, mask_paths, np.random.RandomState(0),
            sample_weights=(0.5, 2.0),
        )
        assert len(seq) == 2
        x, y, w = seq[0]
        assert x.shape == (2, 16, 16, 1)
        assert set(np.unique(y)) <= {0.0, 1.0}
        assert set(np.unique(w)) <= {0.5, 2.0}

    def test_pair_mismatch_raises(self, tmp_path, rng):
        img_paths, mask_paths = self._write_pairs(tmp_path, rng=rng)
        seq = BinaryMaskSequence(
            2, img_paths, list(reversed(mask_paths)), np.random.RandomState(0),
            shuffle=False,
        )
        with pytest.raises(ValueError):
            seq[0]

    def test_invasion_generator(self, tmp_path, rng):
        for cls in ("no_invasion", "invasion"):
            d = tmp_path / cls
            d.mkdir()
            for i in range(3):
                Image.fromarray(
                    (rng.rand(20, 20) * 255).astype(np.uint8)
                ).save(d / f"{i}.tif")
        class_paths = {
            0: sorted(str(p) for p in (tmp_path / "no_invasion").glob("*")),
            1: sorted(str(p) for p in (tmp_path / "invasion").glob("*")),
        }
        gen = InvasionDataGenerator(
            class_paths, {"no_invasion": 0, "invasion": 1}, 2, (16, 16),
            np.random.RandomState(0), class_weights=True,
        )
        x, y, w = gen[0]
        assert x.shape == (2, 16, 16, 3)
        assert y.shape == (2, 1)
        assert w.shape == (2,)

    def test_split_and_weights(self):
        paths = {0: [f"a{i}" for i in range(10)], 1: [f"b{i}" for i in range(5)]}
        train, val = get_train_val_split(paths, 0.2)
        assert len(train[0]) == 8 and len(val[0]) == 2
        w = balanced_class_weights_from_counts({0: 10, 1: 5})
        assert w[1] == 2 * w[0] * 10 / 10 / 2 * 2  # w0 = 15/20, w1 = 15/10
        assert w[0] == pytest.approx(0.75)
        assert w[1] == pytest.approx(1.5)


class TestAugment:
    def test_invasion_augment_shapes(self, rng):
        imgs = rng.rand(4, 16, 16).astype(np.float32)
        out = augment_invasion_imgs(imgs, np.random.RandomState(0))
        assert out.shape == imgs.shape

    def test_elastic_distortion_pairs_aligned(self, rng):
        img = (rng.rand(32, 32) * 255).astype(np.float32)
        mask = np.zeros((32, 32), np.uint8)
        mask[8:24, 8:24] = 1
        out_img, out_mask = elastic_distortion(
            [img, mask], 4, 4, 5, np.random.RandomState(0)
        )
        assert out_img.shape == img.shape
        assert out_mask.dtype == mask.dtype
        assert set(np.unique(out_mask)) <= {0, 1}

    def test_dual_transform_prob(self, rng):
        t = get_elastic_dual_transform(rs=np.random.RandomState(0), p=0.0)
        img = rng.rand(16, 16).astype(np.float32)
        mask = (rng.rand(16, 16) > 0.5).astype(np.uint8)
        res = t(img, mask)
        np.testing.assert_array_equal(res["image"], img)

    def test_flip_rotate_crop(self, rng):
        aug = random_flip_rotate_crop(
            np.random.RandomState(0), crop_size=24, out_size=16
        )
        x = rng.rand(2, 32, 32).astype(np.float32)
        y = (rng.rand(2, 32, 32) > 0.5).astype(np.float32)
        xa, ya = aug(x, y)
        assert xa.shape == (2, 16, 16)
        assert set(np.unique(ya)) <= {0.0, 1.0}


def test_weighted_bce_per_sample_weights_shape():
    """(B,) class weights must align on the batch axis, not outer-product."""
    import jax.numpy as jnp

    probs = jnp.array([[0.9], [0.1]])
    labels = jnp.array([[1.0], [0.0]])
    w = jnp.array([2.0, 1.0])
    loss = float(T.weighted_bce(probs, labels, w))
    expected = (2.0 * -np.log(0.9) + 1.0 * -np.log(0.9)) / 3.0
    assert abs(loss - expected) < 1e-6
    # must stay bounded by the max clipped BCE regardless of batch size
    assert loss < 17.0
