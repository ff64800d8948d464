"""Eval-set floor for the TTA fast modes (VERDICT r3 weak #6).

benchmarks/tta_quality_sweep.py measured the tta∈{8,4,1} trade across 12
synthetic eval images (BASELINE.md round-4 table: tta4 agreement with the
tta=8 reference mode 0.952-0.981 IoU, tta1 0.844-0.945 on well-segmented
inputs). This test pins a floor on two of those eval images so a tiled
kernel/blend regression that degrades the fast modes shows up — the
single identity-predictor reconstruction test (test_tiled.py) proves the
blend algebra, this proves the shipped-checkpoint behavior.
"""

from pathlib import Path

import numpy as np
import pytest

from tmat_tpu.core import defs

_CKPT = Path(
    defs.model_training_path("binary_segmentation/checkpoints/checkpoint_1.msgpack")
)

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not _CKPT.is_file(), reason="shipped segmentor checkpoint not present"
    ),
]


def _iou(a, b):
    union = np.logical_or(a, b).sum()
    if union == 0:
        return 1.0
    return float(np.logical_and(a, b).sum() / union)


@pytest.fixture(scope="module")
def masks():
    from tmat_tpu.models.synthetic import synth_vessel_image
    from tmat_tpu.models.unet import UNetXceptionPatchSegmentor

    imgs = []
    for seed, n_vessels in ((1000, 2), (1006, 3)):  # sweep imgs 0 and 6
        img, _ = synth_vessel_image(
            np.random.RandomState(seed), size=384, n_vessels=n_vessels
        )
        imgs.append(img.astype(np.float32) / 255.0)

    out = {}
    for tta in (8, 4, 1):
        seg = UNetXceptionPatchSegmentor(
            320, _CKPT, (64, 128, 256, 512), ds_ratio=0.625, tta=tta
        )
        out[tta] = [seg.predict(im) > 0.5 for im in imgs]
    return out


def test_tta8_finds_vessels(masks):
    for m in masks[8]:
        assert m.sum() > 500, "reference-mode segmentation found no vessels"


def test_tta4_agreement_floor(masks):
    for m8, m4 in zip(masks[8], masks[4]):
        assert _iou(m8, m4) >= 0.93, _iou(m8, m4)


def test_tta1_agreement_floor(masks):
    for m8, m1 in zip(masks[8], masks[1]):
        assert _iou(m8, m1) >= 0.85, _iou(m8, m1)
