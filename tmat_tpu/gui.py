"""Tabbed desktop GUI for the four analysis tools.

Parity target: gui/tmat.py:35-213 — a four-tab window ("Analyze
Microvessels" / "Z Project" / "Estimate Cell Coverage Area" / "Predict
Depth of Invasion"), shared in_root/out_root directory pickers plus
--channel/--time, tool-specific options, dispatching each run to the
tool's main(args) in-process. Implemented with tkinter (bundled with
CPython) instead of the reference's patched Gooey fork.

Run with: python -m tmat_tpu.gui
"""

from __future__ import annotations

import argparse
import threading
import traceback
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple


@dataclass
class Field:
    """One GUI option mapping to an argparse attribute."""

    name: str  # argparse attribute name
    label: str
    kind: str = "str"  # str | int | float | bool | dir | floats
    default: object = None
    help: str = ""


@dataclass
class ToolTab:
    title: str
    tool: str  # module name under tmat_tpu.tools
    fields: List[Field] = field(default_factory=list)


_COMMON = [
    Field("in_root", "Input folder", "dir"),
    Field("out_root", "Output folder", "dir"),
    Field("channel", "Color channel index", "int"),
    Field("time", "Time index", "int"),
]

TABS: List[ToolTab] = [
    ToolTab(
        "Analyze Microvessels",
        "compute_branches",
        _COMMON
        + [
            Field("image_width_microns", "Image width (microns)", "float"),
            Field("detect_well", "Detect well boundary", "bool", False),
            Field("graph_thresh_1", "Graph threshold 1", "floats"),
            Field("graph_thresh_2", "Graph threshold 2", "floats"),
            Field("min_branch_length", "Min branch length (µm)", "float"),
            Field("max_branch_length", "Max branch length (µm)", "float"),
            Field("graph_smoothing_window", "Smoothing window (µm)", "float"),
            Field("remove_isolated_branches", "Remove isolated branches", "bool", False),
            Field("model_cfg_path", "Model config path", "str"),
            Field("tta", "TTA variants (8/4/1; 8 = reference parity)", "int"),
            Field("config", "Config file", "str"),
        ],
    ),
    ToolTab(
        "Z Project",
        "compute_zproj",
        _COMMON
        + [
            Field("method", "Projection method (min/max/med/avg/fs)", "str", "max"),
            Field("area", "Compute cell area after projection", "bool", False),
        ],
    ),
    ToolTab(
        "Estimate Cell Coverage Area",
        "compute_cell_area",
        _COMMON
        + [
            Field("detect_well", "Detect well boundary", "bool", False),
            Field("sd_coef", "SD coefficient", "float"),
            Field("config", "Config file", "str"),
        ],
    ),
    ToolTab(
        "Predict Depth of Invasion",
        "compute_inv_depth",
        _COMMON + [Field("config", "Config file", "str")],
    ),
    # batch surface beyond the reference's four tabs: whole-plate
    # zproj -> area -> branches in one streamed run (tools/plate_pipeline)
    ToolTab(
        "Process Plate (batch)",
        "plate_pipeline",
        [
            Field("in_root", "Plate folder", "dir"),
            Field("out_root", "Output folder", "dir"),
            Field("image_width_microns", "Image width (microns)", "float"),
            Field("method", "Projection method (min/max/med/avg/fs)", "str", "max"),
            Field("detect_well", "Detect well boundary", "bool", False),
            Field("sd_coef", "SD coefficient", "float"),
            Field("model_cfg", "Model config path", "str"),
            Field("tta", "TTA variants (8/4/1; 8 = reference parity)", "int"),
        ],
    ),
]


def build_namespace(tab: ToolTab, values: Dict[str, object]) -> argparse.Namespace:
    """Convert GUI field values into the argparse Namespace a tool expects."""
    ns = argparse.Namespace()
    for f in tab.fields:
        raw = values.get(f.name, f.default)
        if raw in ("", None):
            val = f.default if f.kind == "bool" else None
        elif f.kind == "int":
            val = int(raw)
        elif f.kind == "float":
            val = float(raw)
        elif f.kind == "floats":
            val = [float(v) for v in str(raw).split()]
        elif f.kind == "bool":
            val = bool(raw)
        else:
            val = str(raw)
        setattr(ns, f.name, val)
    return ns


def run_tool(tab: ToolTab, ns: argparse.Namespace) -> None:
    """Dispatch to the tool's main(args) in-process (gui/tmat.py:200-209)."""
    import importlib

    module = importlib.import_module(f"tmat_tpu.tools.{tab.tool}")
    module.main(args=ns)


def main():  # pragma: no cover - interactive
    import tkinter as tk
    from tkinter import filedialog, ttk

    root = tk.Tk()
    root.title("Tissue Model Analysis Tools (TPU)")
    notebook = ttk.Notebook(root)
    notebook.pack(fill="both", expand=True)

    status = tk.StringVar(value="Ready.")

    for tab in TABS:
        frame = ttk.Frame(notebook)
        notebook.add(frame, text=tab.title)
        variables: Dict[str, tk.Variable] = {}

        for row, f in enumerate(tab.fields):
            ttk.Label(frame, text=f.label).grid(row=row, column=0, sticky="w", padx=4, pady=2)
            if f.kind == "bool":
                var = tk.BooleanVar(value=bool(f.default))
                ttk.Checkbutton(frame, variable=var).grid(row=row, column=1, sticky="w")
            else:
                var = tk.StringVar(value="" if f.default is None else str(f.default))
                entry = ttk.Entry(frame, textvariable=var, width=48)
                entry.grid(row=row, column=1, sticky="we", padx=4)
                if f.kind == "dir":
                    def browse(v=var):
                        path = filedialog.askdirectory()
                        if path:
                            v.set(path)
                    ttk.Button(frame, text="Browse", command=browse).grid(
                        row=row, column=2, padx=2
                    )
            variables[f.name] = var

        def launch(tab=tab, variables=variables):
            values = {k: v.get() for k, v in variables.items()}
            ns = build_namespace(tab, values)
            status.set(f"Running {tab.title}...")

            def work():
                try:
                    run_tool(tab, ns)
                    status.set(f"{tab.title} finished.")
                except SystemExit as exc:
                    status.set(f"{tab.title} exited with code {exc.code}.")
                except Exception:
                    traceback.print_exc()
                    status.set(f"{tab.title} failed (see terminal).")

            threading.Thread(target=work, daemon=True).start()

        ttk.Button(frame, text="Run", command=launch).grid(
            row=len(tab.fields), column=1, pady=8
        )

    ttk.Label(root, textvariable=status).pack(fill="x", padx=4, pady=2)
    root.mainloop()


if __name__ == "__main__":
    main()
