"""Integration tests for the training CLI workflows (tiny configs)."""

import json

import numpy as np
import pytest
from PIL import Image

from tmat_tpu.core import defs


@pytest.fixture
def seg_data(tmp_path, rng):
    d = tmp_path / "segdata"
    d.mkdir()
    for i in range(4):
        img = (rng.rand(32, 32) * 40).astype(np.uint8)
        mask = np.zeros((32, 32), np.uint8)
        mask[8:24, 14:18] = 255
        img[mask > 0] = 200
        Image.fromarray(img).save(d / f"s{i}.tif")
        Image.fromarray(mask).save(d / f"s{i}_mask.tif")
    return d


def test_train_segmentation_cli_registers_model(tmp_path, seg_data, monkeypatch):
    mt = tmp_path / "model_training"
    monkeypatch.setattr(defs, "MODEL_TRAINING_DIR", mt)
    from tmat_tpu.models import train_segmentation

    train_segmentation.main(
        [
            str(seg_data),
            "--patch-size",
            "16",
            "--filters",
            "4",
            "8",
            "--epochs",
            "1",
            "--batch-size",
            "2",
            "--ds-ratio",
            "1.0",
            "--warmup-steps",
            "1",
        ]
    )
    cfgs = list((mt / "binary_segmentation" / "configs").glob("*.json"))
    ckpts = list((mt / "binary_segmentation" / "checkpoints").glob("*.msgpack"))
    assert len(cfgs) == 1 and len(ckpts) == 1
    cfg = json.loads(cfgs[0].read_text())
    assert cfg["patch_size"] == 16
    assert cfg["checkpoint_file"] == ckpts[0].name

    # the registered model loads and segments through the public API
    from tmat_tpu.models.unet import get_unet_patch_segmentor_from_cfg

    seg = get_unet_patch_segmentor_from_cfg(str(cfgs[0]))
    pred = seg.predict(np.random.RandomState(0).rand(40, 40).astype(np.float32))
    assert pred.shape == (40, 40)


def test_nd2_gated_with_clear_error(tmp_path):
    nd2 = tmp_path / "well.nd2"
    nd2.write_bytes(b"\x00" * 16)
    from tmat_tpu.core import io as tio

    with pytest.raises(SystemExit):
        tio.load_image(str(nd2))
