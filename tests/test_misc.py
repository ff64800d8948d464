"""Tests for preprocessing extras, profiling, GUI arg plumbing, dev dirs."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import ndimage

from tmat_tpu.core.dev_config import get_dev_directories
from tmat_tpu.core.profiling import StageTimer, maybe_profile
from tmat_tpu.ops.blur import blur, dt_blur, sdt_blur
from tmat_tpu import gui


def test_blur_iterative_matches_scipy(rng):
    img = (rng.rand(16, 16) * 255).astype(np.float32)
    got = np.asarray(blur(jnp.asarray(img), 2, 3, gs=False))
    k = np.array([0.25, 0.5, 0.25], np.float32)
    exp = img
    for _ in range(2):
        exp = ndimage.correlate1d(exp, k, 0, mode="mirror")
        exp = ndimage.correlate1d(exp, k, 1, mode="mirror")
    np.testing.assert_allclose(got, np.round(exp), atol=1e-3)


def test_dt_blur_peak_at_center(rng):
    img = np.zeros((21, 21), np.float32)
    img[5:16, 5:16] = 200.0
    out = dt_blur(img, 1)
    assert out[10, 10] == out.max()
    assert out[0, 0] == 0


def test_sdt_blur_signed():
    img = np.zeros((21, 21), np.float32)
    img[8:13, 8:13] = 200.0
    out = sdt_blur(img, 1)
    assert out[10, 10] > 0
    assert out[0, 0] < 0


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    assert t.counts["a"] == 2
    assert "a:" in t.report()


def test_maybe_profile_noop(monkeypatch):
    monkeypatch.delenv("TMAT_TPU_PROFILE_DIR", raising=False)
    with maybe_profile("x"):
        pass


def test_dev_directories(tmp_path):
    dirs = get_dev_directories(tmp_path)
    assert dirs.data_dir == tmp_path / "data"


class TestGuiPlumbing:
    def test_tabs_cover_four_tools_plus_plate(self):
        assert {t.tool for t in gui.TABS} == {
            "compute_branches",
            "compute_zproj",
            "compute_cell_area",
            "compute_inv_depth",
            "plate_pipeline",
        }

    def test_build_namespace_types(self):
        tab = next(t for t in gui.TABS if t.tool == "compute_branches")
        ns = gui.build_namespace(
            tab,
            {
                "in_root": "/in",
                "out_root": "/out",
                "channel": "1",
                "image_width_microns": "1200",
                "graph_thresh_1": "2 5 10",
                "detect_well": True,
            },
        )
        assert ns.channel == 1
        assert ns.image_width_microns == 1200.0
        assert ns.graph_thresh_1 == [2.0, 5.0, 10.0]
        assert ns.detect_well is True
        assert ns.time is None
        assert ns.max_branch_length is None

    def test_namespace_runs_zproj(self, tmp_path, rng):
        from PIL import Image

        in_dir = tmp_path / "in"
        in_dir.mkdir()
        for z in range(3):
            Image.fromarray(
                rng.randint(0, 255, size=(16, 16)).astype(np.uint8)
            ).save(in_dir / f"w_z{z}.tif")
        tab = next(t for t in gui.TABS if t.tool == "compute_zproj")
        ns = gui.build_namespace(
            tab,
            {
                "in_root": str(in_dir),
                "out_root": str(tmp_path / "out"),
                "method": "max",
            },
        )
        gui.run_tool(tab, ns)
        assert (tmp_path / "out" / "w_max.tif").is_file()


def test_gui_plate_tab_runs(tmp_path, rng, monkeypatch):
    """The Process Plate tab dispatches tools/plate_pipeline.main(args=ns)
    end-to-end (tiny random segmentor)."""
    import json

    from PIL import Image

    from tmat_tpu.core import defs as _defs
    from tmat_tpu.models.params_io import save_params
    from tmat_tpu.models.unet import build_unet_xception

    mt = tmp_path / "model_training"
    cfg_dir = mt / "binary_segmentation" / "configs"
    ckpt_dir = mt / "binary_segmentation" / "checkpoints"
    cfg_dir.mkdir(parents=True)
    ckpt_dir.mkdir(parents=True)
    _, variables = build_unet_xception(1, (32, 32), channels=1, filter_counts=(8, 16))
    save_params(ckpt_dir / "checkpoint_1.msgpack", variables)
    model_cfg = cfg_dir / "unet_patch_segmentor_1.json"
    model_cfg.write_text(
        json.dumps(
            {
                "patch_size": 32,
                "checkpoint_file": "checkpoint_1.msgpack",
                "filter_counts": [8, 16],
                "ds_ratio": 1.0,
                "channels": 1,
            }
        )
    )

    monkeypatch.setattr(_defs, "MODEL_TRAINING_DIR", mt)

    in_dir = tmp_path / "plate"
    in_dir.mkdir()
    for w in range(2):
        frames = [
            Image.fromarray(rng.randint(0, 255, (64, 64)).astype(np.uint8))
            for _ in range(3)
        ]
        frames[0].save(
            in_dir / f"well{w}.tif", save_all=True, append_images=frames[1:]
        )

    tab = next(t for t in gui.TABS if t.tool == "plate_pipeline")
    ns = gui.build_namespace(
        tab,
        {
            "in_root": str(in_dir),
            "out_root": str(tmp_path / "out"),
            "image_width_microns": "800",
            "model_cfg": str(model_cfg),
        },
    )
    gui.run_tool(tab, ns)
    assert (tmp_path / "out" / "plate_results.csv").is_file()


def test_gui_plate_tab_rejects_bad_tta(tmp_path):
    """GUI namespaces bypass argparse choices; plate main re-validates the
    tta field (5 is not a dihedral subgroup size) and exits 2."""
    import pytest

    from tmat_tpu.tools import plate_pipeline

    tab = next(t for t in gui.TABS if t.tool == "plate_pipeline")
    ns = gui.build_namespace(
        tab,
        {
            "in_root": str(tmp_path),
            "out_root": str(tmp_path / "out"),
            "image_width_microns": "800",
            "tta": "5",
        },
    )
    with pytest.raises(SystemExit) as exc:
        plate_pipeline.main(args=ns)
    assert exc.value.code == 2
