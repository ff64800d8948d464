"""End-to-end tests for the compute_zproj and compute_cell_area tools."""

import csv
import os

import numpy as np
import pytest
from PIL import Image

from tmat_tpu.tools import compute_cell_area, compute_zproj
from tmat_tpu.tools import args as su


def _write_stack_sequence(dirpath, stack, well):
    dirpath.mkdir(parents=True, exist_ok=True)
    for z, sl in enumerate(stack):
        Image.fromarray(sl).save(dirpath / f"{well}_z{z:02d}.tif")


def _make_plate(tmp_path, n_wells=2, n_z=4, size=96, rng=None):
    rng = rng or np.random.RandomState(0)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    stacks = {}
    for w in range(n_wells):
        well = f"A{w + 1:02d}"
        stack = rng.randint(10, 60, size=(n_z, size, size)).astype(np.uint8)
        # bright "cells" patch at a well-specific location, sharpest at z=w
        stack[w % n_z, 20:50, 20:50] = 220
        _write_stack_sequence(in_dir, stack, well)
        stacks[well] = stack
    return in_dir, stacks


def test_zproj_max_end_to_end(tmp_path, rng):
    in_dir, stacks = _make_plate(tmp_path, rng=rng)
    out_dir = tmp_path / "out"
    compute_zproj.main(argv=[str(in_dir), str(out_dir), "-m", "max"])
    for well, stack in stacks.items():
        out_file = out_dir / f"{well}_max.tif"
        assert out_file.is_file(), os.listdir(out_dir)
        got = np.asarray(Image.open(out_file))
        np.testing.assert_array_equal(got, stack.max(0))


@pytest.mark.parametrize("method", ["min", "med", "avg", "fs"])
def test_zproj_all_methods_run(tmp_path, rng, method):
    in_dir, stacks = _make_plate(tmp_path, n_wells=1, rng=rng)
    out_dir = tmp_path / f"out_{method}"
    compute_zproj.main(argv=[str(in_dir), str(out_dir), "-m", method])
    outs = list(out_dir.glob(f"*_{method}.tif*"))
    assert len(outs) == 1


def test_cell_area_end_to_end(tmp_path, rng):
    # 2-D projections with a known bright square -> area fraction ~ 30*30/96^2
    in_dir = tmp_path / "projs"
    in_dir.mkdir()
    for w in range(3):
        img = rng.randint(10, 40, size=(96, 96)).astype(np.uint8)
        img[10:40, 10:40] = rng.randint(180, 220, size=(30, 30))
        Image.fromarray(img).save(in_dir / f"B{w}.tif")
    out_dir = tmp_path / "area_out"
    # sd_coef=-2: keep everything above (fg_mean - 2 sd), i.e. the whole
    # bright square (sd_coef=0 would keep only pixels above the fg mean)
    compute_cell_area.main(argv=[str(in_dir), str(out_dir), "--sd-coef=-2"])

    csv_path = out_dir / "calculations" / "cell_area.csv"
    assert csv_path.is_file()
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3
    expected_pct = 30 * 30 / 96**2 * 100
    for row in rows:
        assert abs(float(row["area_pct"]) - expected_pct) < 1.0, row
    # thresholded PNGs exist
    assert len(list((out_dir / "thresholded").glob("*_thresholded.png"))) == 3


def test_zproj_area_chain(tmp_path, rng):
    in_dir, _ = _make_plate(tmp_path, n_wells=1, rng=rng)
    out_dir = tmp_path / "chain_out"
    compute_zproj.main(argv=[str(in_dir), str(out_dir), "-m", "max", "--area"])
    assert (out_dir / "calculations" / "cell_area.csv").is_file()


def test_cell_area_on_zstacks_maxprojects(tmp_path, rng):
    in_dir, _ = _make_plate(tmp_path, n_wells=1, rng=rng)
    out_dir = tmp_path / "stack_area"
    compute_cell_area.main(argv=[str(in_dir), str(out_dir)])
    assert (out_dir / "calculations" / "cell_area.csv").is_file()


def test_input_validation_mixed(tmp_path, capsys):
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "file.tif").write_bytes(b"x")
    (bad / "subdir").mkdir()
    with pytest.raises(SystemExit):
        su.check_input_dir_structure(str(bad))


def test_cell_area_with_well_detection(tmp_path, rng):
    """-w: area measured against the detected well region."""
    in_dir = tmp_path / "wells"
    in_dir.mkdir()
    hw = 128
    rr, cc = np.mgrid[0:hw, 0:hw]
    inside = (rr - hw / 2) ** 2 + (cc - hw / 2) ** 2 <= (0.42 * hw) ** 2
    img = rng.randint(5, 15, size=(hw, hw)).astype(np.uint8)
    img[inside] += 60
    img[50:70, 50:70] = 220  # "cells" patch inside the well
    Image.fromarray(img).save(in_dir / "w1.tif")

    out_dir = tmp_path / "wout"
    compute_cell_area.main(argv=[str(in_dir), str(out_dir), "-w", "--sd-coef=-2"])
    csv_path = out_dir / "calculations" / "cell_area.csv"
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    pct = float(rows[0]["area_pct"])
    # denominator is the well (≈55% of the frame), not the full frame
    expected = 20 * 20 / (np.pi * (0.42 * hw) ** 2) * 100
    assert abs(pct - expected) < 3.0, pct
    assert (out_dir / "thresholded" / "w1_well_mask.png").is_file()


def test_zproj_channel_selection(tmp_path, rng):
    """--channel reads the right plane of an ImageJ hyperstack."""
    pages = []
    for z in range(3):
        for c in range(2):
            val = 10 * (z + 1) if c == 0 else 100 + z
            pages.append(np.full((16, 16), val, np.uint8))
    frames = [Image.fromarray(p) for p in pages]
    desc = "ImageJ=1.53\nimages=6\nchannels=2\nslices=3\nframes=1\n"
    in_dir = tmp_path / "hs"
    in_dir.mkdir()
    frames[0].save(
        in_dir / "stack.tif", save_all=True, append_images=frames[1:],
        tiffinfo={270: desc},
    )
    out_dir = tmp_path / "hsout"
    compute_zproj.main(
        argv=[str(in_dir), str(out_dir), "-m", "max", "--channel", "1"]
    )
    out = np.asarray(Image.open(out_dir / "stack_max.tif"))
    np.testing.assert_array_equal(out, np.full((16, 16), 102, np.uint8))
