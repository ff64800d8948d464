"""Numerics for the opt-in int8 PTQ paths (models/quant.py).

The quantized paths are an experiment, not the production default
(BASELINE.md "int8 quantization": mixed measured 1.03x vs bf16, the
integer-domain graph 0.84x), but they ship and must stay correct:

- the folded plain-lax forward is the structure oracle against
  ``model.apply`` (BN folding + layer wiring bit-for-bit in structure,
  float-tolerance in values);
- the quantized forwards carry characterization floors (measured
  int8-domain 0.967 / mixed 0.974 mask IoU vs f32 at 160 px on the
  shipped checkpoint) so regressions in scales/wiring are caught.
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest
from numpy.random import RandomState

from tmat_tpu.core import defs
from tmat_tpu.models import quant
from tmat_tpu.models.params_io import load_params
from tmat_tpu.models.unet import UNetXceptionPatchSegmentor, build_unet_xception

_CKPT = Path(
    defs.model_training_path("binary_segmentation/checkpoints/checkpoint_1.msgpack")
)
FC = (64, 128, 256, 512)


def _vessel_batch(size, n=6, seed=11):
    from tmat_tpu.models.synthetic import synth_vessel_image

    rng = RandomState(seed)
    imgs = []
    for _ in range(n):
        img, _ = synth_vessel_image(rng, size=size)
        img = img.astype(np.float32)
        img = (img - img.min()) / max(img.max() - img.min(), 1e-6)
        imgs.append(img[..., None])
    return np.stack(imgs)


def _iou(a, b):
    return np.logical_and(a, b).sum() / max(np.logical_or(a, b).sum(), 1)


def test_folded_matches_apply_small_model():
    m, v = build_unet_xception(
        1, (64, 64), channels=1, filter_counts=(8, 16, 32, 64), seed=3
    )
    x = RandomState(0).rand(2, 64, 64, 1).astype(np.float32)
    ref = np.asarray(m.apply(v, jnp.asarray(x), train=False))
    folded = quant.extract_folded(v, (8, 16, 32, 64))
    mine = np.asarray(quant.forward_folded(folded, jnp.asarray(x)))
    # pure BN folding; the only divergence is fp reassociation amplified
    # through an untrained net
    assert np.abs(ref - mine).max() < 0.02
    assert np.abs(ref - mine).mean() < 1e-3


def test_scales_roundtrip(tmp_path):
    scales = {"entry": np.asarray([0.01], np.float32),
              "d0.dw1": np.linspace(1e-3, 2e-2, 8).astype(np.float32)}
    p = tmp_path / "s.quant.json"
    quant.save_scales(p, scales)
    back = quant.load_scales(p)
    assert set(back) == set(scales)
    for k in scales:
        np.testing.assert_allclose(back[k], scales[k], rtol=1e-6)
    assert quant.load_scales(tmp_path / "missing.json") is None


@pytest.fixture(scope="module")
def trained():
    if not _CKPT.is_file():
        pytest.skip("shipped segmentor checkpoint not present")
    size = 160  # fully-convolutional: 4x cheaper than the 320 train size
    m, tpl = build_unet_xception(1, (size, size), channels=1, filter_counts=FC)
    v = load_params(_CKPT, tpl)
    x = _vessel_batch(size)
    ref = np.asarray(m.apply(v, jnp.asarray(x), train=False))
    folded = quant.extract_folded(v, FC)
    scales = quant.calibrate(folded, quant.default_calibration_batch(size, n=8))
    return {"x": x, "ref": ref, "folded": folded, "scales": scales}


def test_folded_matches_apply_trained(trained):
    mine = np.asarray(
        quant.forward_folded(trained["folded"], jnp.asarray(trained["x"]))
    )
    ref = trained["ref"]
    assert np.abs(ref - mine).mean() < 5e-3
    assert _iou(ref > 0.5, mine > 0.5) >= 0.995


def test_int8_domain_quality_floor(trained):
    qp = quant.quantize_folded(trained["folded"], trained["scales"])
    yq = np.asarray(
        quant.forward_quant(qp, jnp.asarray(trained["x"]),
                            float_dtype=jnp.bfloat16),
        np.float32,
    )
    ref = trained["ref"]
    assert (ref > 0.5).mean() > 0.05, "vacuous: no vessels predicted"
    iou = _iou(ref > 0.5, yq > 0.5)
    # characterization floor (measured 0.967) — NOT the production bar;
    # the production default stays bf16 (tests/test_bf16_quality.py)
    assert iou >= 0.95, f"int8-domain IoU {iou:.4f} regressed below floor"


def test_mixed_quality_floor(trained):
    qp = quant.quantize_mixed(trained["folded"], trained["scales"])
    yq = np.asarray(
        quant.forward_mixed(qp, jnp.asarray(trained["x"]),
                            float_dtype=jnp.bfloat16),
        np.float32,
    )
    iou = _iou(trained["ref"] > 0.5, yq > 0.5)
    assert iou >= 0.96, f"mixed IoU {iou:.4f} regressed below floor"  # meas. 0.974


def test_segmentor_quantize_flag(tmp_path, monkeypatch):
    """quantize=True builds a runnable quantized pred_fn, caches a
    fingerprinted sidecar next to the checkpoint, reuses it on the next
    construction, and recalibrates when the checkpoint bytes change."""
    if not _CKPT.is_file():
        pytest.skip("shipped segmentor checkpoint not present")
    import shutil

    calls = {"n": 0}
    real_calibrate = quant.calibrate

    def counting_calibrate(*a, **k):
        calls["n"] += 1
        return real_calibrate(*a, **k)

    monkeypatch.setattr(quant, "calibrate", counting_calibrate)

    ckpt = tmp_path / "ckpt.msgpack"
    shutil.copy(_CKPT, ckpt)
    seg = UNetXceptionPatchSegmentor(
        160, ckpt, FC, ds_ratio=1.0, dtype=jnp.float32, quantize=True
    )
    assert seg.quantized
    assert calls["n"] == 1
    sidecar = quant.scales_path_for(ckpt)
    assert sidecar.is_file(), "calibration scales were not cached"
    x = _vessel_batch(160, n=1)
    y = np.asarray(seg._pred_fn(jnp.asarray(x)), np.float32)
    assert y.shape[:3] == (1, 160, 160)
    assert np.isfinite(y).all() and 0.0 <= y.min() and y.max() <= 1.0

    # second construction must hit the sidecar, NOT recalibrate
    seg2 = UNetXceptionPatchSegmentor(
        160, ckpt, FC, ds_ratio=1.0, dtype=jnp.float32, quantize=True
    )
    assert seg2.quantized
    assert calls["n"] == 1, "sidecar was ignored; recalibrated"

    # a fingerprint mismatch (as a retrained checkpoint would produce)
    # invalidates the sidecar -> recalibrate and rewrite it
    import json

    doc = json.loads(sidecar.read_text())
    assert doc["_ckpt"] == quant._ckpt_fingerprint(ckpt)
    doc["_ckpt"]["size"] += 1
    sidecar.write_text(json.dumps(doc))
    seg3 = UNetXceptionPatchSegmentor(
        160, ckpt, FC, ds_ratio=1.0, dtype=jnp.float32, quantize=True
    )
    assert seg3.quantized
    assert calls["n"] == 2, "stale sidecar was reused after checkpoint change"
    doc2 = json.loads(sidecar.read_text())
    assert doc2["_ckpt"] == quant._ckpt_fingerprint(ckpt), "sidecar not refreshed"
