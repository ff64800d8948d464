"""CLI dispatcher tests (non-interactive paths)."""

import numpy as np
import pytest
from PIL import Image

from tmat_tpu import cli


def test_help_exits_zero(capsys):
    assert cli.main(["-h"]) == 0
    out = capsys.readouterr().out
    assert "compute_zproj" in out and "configure" in out


def test_unknown_subcommand(capsys):
    assert cli.main(["frobnicate"]) == 1
    assert "Unknown subcommand" in capsys.readouterr().out


def test_dispatch_zproj(tmp_path, rng, monkeypatch):
    from tmat_tpu.core import defs

    monkeypatch.setattr(defs, "BASE_DIR", tmp_path / "base")
    monkeypatch.setattr(defs, "SCRIPT_CONFIG_DIR", tmp_path / "base" / "config")
    monkeypatch.setattr(defs, "MODEL_TRAINING_DIR", tmp_path / "base" / "model_training")
    # auto-configure must not write package.cfg into the source tree
    monkeypatch.setattr(defs, "PKG_CFG_PATH", tmp_path / "package.cfg")
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for z in range(3):
        Image.fromarray(rng.randint(0, 255, (16, 16)).astype(np.uint8)).save(
            in_dir / f"w_z{z}.tif"
        )
    code = cli.main(["compute_zproj", str(in_dir), str(tmp_path / "out"), "-m", "max"])
    assert code == 0
    assert (tmp_path / "out" / "w_max.tif").is_file()


def test_tool_error_propagates(tmp_path):
    assert cli.main(["compute_cell_area", str(tmp_path / "missing"), str(tmp_path)]) == 1
