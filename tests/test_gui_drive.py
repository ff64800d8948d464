"""Drive the GUI's run path end-to-end (VERDICT r4 #6).

test_misc.py covers build_namespace at the value level; this file drives
the ACTUAL wiring the Run button executes — TabController: widget
variables -> namespace -> threaded in-process tool dispatch -> status
transitions (the reference GUI's contract, gui/tmat.py:200-209) — with a
real tool run producing real outputs. The widget layer itself
(build_tab_widgets / build_app) is constructed against a real Tk root
when a display exists, else skipped with reason (this container has no
DISPLAY and no Xvfb).
"""

import os

import numpy as np
import pytest
from PIL import Image

from tmat_tpu import gui


class FakeVar:
    """Duck-typed tk.Variable: the only surface TabController touches."""

    def __init__(self, value=""):
        self._value = value

    def get(self):
        return self._value

    def set(self, value):
        self._value = value


def _tab(title):
    return next(t for t in gui.TABS if t.title == title)


def _vars_for(tab, **overrides):
    variables = {}
    for f in tab.fields:
        default = bool(f.default) if f.kind == "bool" else (
            "" if f.default is None else str(f.default)
        )
        variables[f.name] = FakeVar(overrides.get(f.name, default))
    return variables


def test_zproject_tab_runs_tool_and_reports_status(tmp_path):
    """Z Project tab: set folders, press Run, output TIFF appears."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rng = np.random.RandomState(0)
    stack = rng.randint(10, 200, size=(3, 48, 48)).astype(np.uint8)
    for z, sl in enumerate(stack):
        Image.fromarray(sl).save(in_dir / f"w1_z{z}.tif")
    out_dir = tmp_path / "out"

    tab = _tab("Z Project")
    statuses = []
    controller = gui.TabController(
        tab,
        _vars_for(tab, in_root=str(in_dir), out_root=str(out_dir), method="max"),
        statuses.append,
    )
    controller.launch(join=True)

    assert statuses[0] == "Running Z Project..."
    assert statuses[-1] == "Z Project finished.", statuses
    out_file = out_dir / "w1_max.tif"
    assert out_file.is_file(), os.listdir(out_dir)
    np.testing.assert_array_equal(np.asarray(Image.open(out_file)), stack.max(0))


def test_bad_input_reports_exit_status(tmp_path):
    """A tool sys.exit surfaces as a status message, not a dead thread."""
    tab = _tab("Z Project")
    statuses = []
    controller = gui.TabController(
        tab,
        _vars_for(
            tab,
            in_root=str(tmp_path / "nonexistent"),
            out_root=str(tmp_path / "out"),
        ),
        statuses.append,
    )
    controller.launch(join=True)
    assert statuses[-1].startswith("Z Project exited with code"), statuses


def test_namespace_matches_build_namespace():
    """TabController.namespace goes through the shared build_namespace."""
    tab = _tab("Analyze Microvessels")
    controller = gui.TabController(
        tab,
        _vars_for(
            tab,
            in_root="/a",
            out_root="/b",
            image_width_microns="1000",
            graph_thresh_1="2 8",
            detect_well=True,
            tta="4",
        ),
        lambda s: None,
    )
    ns = controller.namespace()
    assert ns.in_root == "/a" and ns.out_root == "/b"
    assert ns.image_width_microns == 1000.0
    assert ns.graph_thresh_1 == [2.0, 8.0]
    assert ns.detect_well is True
    assert ns.tta == 4


def _display_available():
    if not os.environ.get("DISPLAY"):
        return False
    try:
        import tkinter

        tkinter.Tk().destroy()
        return True
    except Exception:
        return False


@pytest.mark.skipif(
    not _display_available(),
    reason="no DISPLAY / Xvfb in this environment: Tk cannot construct windows",
)
def test_build_app_constructs_all_tabs_under_tk(tmp_path):
    """With a display: the full Tk notebook builds and Run dispatches."""
    import tkinter as tk
    from tkinter import filedialog, ttk

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    Image.fromarray(np.zeros((16, 16), np.uint8)).save(in_dir / "a_z0.tif")
    Image.fromarray(np.ones((16, 16), np.uint8)).save(in_dir / "a_z1.tif")

    root = tk.Tk()
    try:
        status, controllers = gui.build_app(root, tk, ttk, filedialog)
        assert set(controllers) == {t.title for t in gui.TABS}
        zp = controllers["Z Project"]
        zp.variables["in_root"].set(str(in_dir))
        zp.variables["out_root"].set(str(tmp_path / "out"))
        zp.launch(join=True)
        assert status.get() == "Z Project finished."
        assert (tmp_path / "out" / "a_max.tif").is_file()
    finally:
        root.destroy()
