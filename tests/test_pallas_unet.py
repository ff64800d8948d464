"""Fused Pallas UNet down path vs the Flax module (interpret mode on CPU).

The fused path (ops/pallas_unet.py) folds inference BatchNorm into conv
weights and runs each down block as one Pallas kernel; these tests pin
its numerics against the reference Flax forward (models.py:85-171
architecture parity target) with randomized params AND batch stats, so
the BN folding, the depthwise/pointwise decomposition, the -inf-padded
maxpool and the stride-2 residual are all exercised.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmat_tpu.models.unet import build_unet_xception
from tmat_tpu.ops.pallas_unet import (
    extract_fused_params,
    fused_pred_supported,
    make_fused_pred_fn,
)


def _rand_variables(filters, patch, seed=3):
    model, variables = build_unet_xception(
        1, (patch, patch), channels=1, filter_counts=filters, seed=seed
    )
    rng = np.random.RandomState(seed)
    # Randomize BN running stats away from init (mean=0, var=1) so the
    # folding math is actually load-bearing.
    bs = jax.tree.map(
        lambda a: jnp.asarray(rng.uniform(0.2, 1.5, a.shape), jnp.float32),
        variables["batch_stats"],
    )
    return model, {"params": variables["params"], "batch_stats": bs}


@pytest.mark.parametrize(
    "filters,patch",
    [((8, 16), 32), ((4, 8, 16), 32), ((64, 128, 256, 512), 64)],
)
def test_fused_matches_flax_f32(filters, patch):
    model, variables = _rand_variables(filters, patch)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(3, patch, patch, 1), jnp.float32)
    ref = model.apply(variables, x, train=False)
    pred = make_fused_pred_fn(
        variables, filters, dtype=jnp.float32, interpret=True
    )
    out = jax.jit(pred)(x)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_bf16_close_to_f32(rng):
    filters, patch = (8, 16), 32
    model, variables = _rand_variables(filters, patch)
    x = jnp.asarray(rng.rand(2, patch, patch, 1), jnp.float32)
    ref = model.apply(variables, x, train=False)
    pred = make_fused_pred_fn(
        variables, filters, dtype=jnp.bfloat16, interpret=True
    )
    out = jax.jit(pred)(x)
    # sigmoid outputs in [0,1]: bf16 compute should stay within a few
    # parts in 1e2 of the f32 reference on a random net
    assert float(jnp.abs(out - ref).max()) < 0.05


def test_fused_params_bn_folding_identity():
    # With BN at init (mean 0, var 1, scale 1, bias 0, eps folded), the
    # folded kernel equals the raw kernel up to the eps factor.
    filters, patch = (8, 16), 32
    model, variables = build_unet_xception(
        1, (patch, patch), channels=1, filter_counts=filters, seed=0
    )
    fp = extract_fused_params(variables, filters, eps=0.0)
    raw = np.asarray(variables["params"]["Conv_0"]["kernel"], np.float32)
    np.testing.assert_allclose(fp["entry"]["k"], raw, rtol=1e-6)
    np.testing.assert_allclose(
        fp["entry"]["b"],
        np.asarray(variables["params"]["Conv_0"]["bias"], np.float32),
        rtol=1e-6,
    )


def test_fused_pred_supported():
    assert fused_pred_supported(320, (64, 128, 256, 512))
    assert fused_pred_supported(32, (8, 16))
    assert not fused_pred_supported(100, (64, 128, 256, 512))
    assert not fused_pred_supported(20, (8, 16, 32))


def test_segmentor_env_gate(monkeypatch, tmp_path):
    """TMAT_TPU_FUSED_UNET=1 flips the segmentor to the fused pred_fn on
    CPU (interpret mode); default stays on the Flax path there."""
    from tmat_tpu.models.params_io import save_params
    from tmat_tpu.models.unet import UNetXceptionPatchSegmentor

    filters, patch = (8, 16), 32
    _, variables = _rand_variables(filters, patch)
    ckpt = tmp_path / "ckpt.msgpack"
    save_params(ckpt, variables)

    monkeypatch.delenv("TMAT_TPU_FUSED_UNET", raising=False)
    seg_default = UNetXceptionPatchSegmentor(patch, ckpt, filters, ds_ratio=1.0)
    assert not seg_default.fused

    monkeypatch.setenv("TMAT_TPU_FUSED_UNET", "1")
    seg_fused = UNetXceptionPatchSegmentor(patch, ckpt, filters, ds_ratio=1.0)
    assert seg_fused.fused

    rng = np.random.RandomState(0)
    img = rng.rand(48, 48).astype(np.float32)
    a = seg_default.predict(img)
    b = seg_fused.predict(img)
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_fused_shipped_checkpoint_mask_parity(monkeypatch):
    """Production-geometry quality bound: the fused bf16 path on the
    SHIPPED segmentor checkpoint must binarize to the same mask as the
    standard f32 forward (IoU >= 0.99), mirroring test_bf16_quality."""
    from pathlib import Path

    from tmat_tpu.core import defs
    from tmat_tpu.models.unet import UNetXceptionPatchSegmentor

    ckpt = Path(
        defs.model_training_path(
            "binary_segmentation/checkpoints/checkpoint_1.msgpack"
        )
    )
    if not ckpt.is_file():
        pytest.skip("shipped segmentor checkpoint not present")

    filters, patch = (64, 128, 256, 512), 320
    rng = np.random.RandomState(7)
    img = rng.rand(patch, patch).astype(np.float32) * 0.08
    rr, cc = np.mgrid[0:patch, 0:patch]
    for k in range(4):
        r0 = 40 + 60 * k
        img[np.abs(rr - r0 - 0.2 * cc) < 2] += 0.7
        img[np.abs(cc - r0 + 0.1 * rr) < 2] += 0.6
    x = jnp.asarray(np.clip(img, 0, 1)[None, :, :, None])

    monkeypatch.delenv("TMAT_TPU_FUSED_UNET", raising=False)
    seg32 = UNetXceptionPatchSegmentor(
        patch, ckpt, filters, ds_ratio=0.625, dtype=jnp.float32
    )
    p32 = np.asarray(seg32._pred_fn(x), np.float32)[0, :, :, 0]

    monkeypatch.setenv("TMAT_TPU_FUSED_UNET", "1")
    segf = UNetXceptionPatchSegmentor(
        patch, ckpt, filters, ds_ratio=0.625, dtype=jnp.bfloat16
    )
    assert segf.fused
    pf = np.asarray(segf._pred_fn(x), np.float32)[0, :, :, 0]

    m32, mf = p32 > 0.5, pf > 0.5
    assert m32.sum() > 200, "f32 prediction found no vessels — vacuous"
    iou = np.logical_and(m32, mf).sum() / max(np.logical_or(m32, mf).sum(), 1)
    assert iou >= 0.99, f"fused bf16 vs f32 mask IoU {iou:.4f} < 0.99"
