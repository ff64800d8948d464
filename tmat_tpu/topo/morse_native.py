"""Native Morse-graph statistics: ctypes binding to csrc/morse.cpp.

The plate pipeline's per-well branch analysis (smooth -> trim -> forest ->
branch labels -> barcode -> filter) is pure host work that dominated the
Morse stage in Python (np.median per trim segment, per-edge hypot calls);
csrc/morse.cpp runs the identical algorithms ~2 orders of magnitude
faster. Outputs are BIT-COMPATIBLE with topo.morse.MorseGraph — including
the CPython set iteration/pop orders the trim walks depend on — which is
asserted over randomized and vessel images by tests/test_morse_native.py
(and MorseGraph itself is reference-parity-proven against
fl_tissue_model_tools/topology.py by tests/test_reference_parity.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from tmat_tpu.topo.dmtgraph import compute_dmt_graph

_CSRC = Path(__file__).resolve().parent / "csrc" / "morse.cpp"
_SO_PATH = Path(__file__).resolve().parent / "csrc" / "_morse.so"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False


def _build_library() -> Optional[ctypes.CDLL]:
    global _BUILD_FAILED
    if _BUILD_FAILED:
        return None
    try:
        if (not _SO_PATH.exists()) or _SO_PATH.stat().st_mtime < _CSRC.stat().st_mtime:
            cmd = [
                os.environ.get("CXX", "g++"),
                "-O3",
                "-march=native",
                "-funroll-loops",
                "-std=c++17",
                "-shared",
                "-fPIC",
                str(_CSRC),
                "-o",
                str(_SO_PATH),
            ]
            try:
                subprocess.run(cmd, check=True, capture_output=True)
            except subprocess.CalledProcessError:
                cmd.remove("-march=native")
                subprocess.run(cmd, check=True, capture_output=True)
        lib = ctypes.CDLL(str(_SO_PATH))
    except (subprocess.CalledProcessError, OSError) as exc:
        print(
            f"morse_native: native build unavailable ({exc}); "
            "using Python MorseGraph",
            file=sys.stderr,
        )
        _BUILD_FAILED = True
        return None

    lib.morse_analyze.restype = ctypes.c_int64
    lib.morse_analyze.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_double,
        ctypes.c_double,
        ctypes.c_int32,
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.pyset_trace.restype = ctypes.c_int64
    lib.pyset_trace.argtypes = [
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
    ]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is None and not _BUILD_FAILED:
        with _LOCK:
            if _LIB is None and not _BUILD_FAILED:
                _LIB = _build_library()
    return _LIB


def morse_barcode_native(
    img: np.ndarray,
    thresholds: Tuple[float, float] = (1, 4),
    smoothing_window: int = 15,
    min_branch_length: float = 15,
    max_branch_length: Optional[float] = None,
    remove_isolated_branches: bool = False,
    pruning_mask: Optional[np.ndarray] = None,
) -> Optional[np.ndarray]:
    """Filtered persistence barcode of the Morse skeleton, or None when
    the native library is unavailable (callers fall back to MorseGraph)."""
    lib = _get_lib()
    if lib is None:
        return None
    verts, edges = compute_dmt_graph(
        np.asarray(img, np.float32), thresholds[0], thresholds[1]
    )
    verts = np.ascontiguousarray(verts, np.int32)
    edges = np.ascontiguousarray(edges, np.int32)
    if len(verts) == 0 or len(edges) == 0:
        return np.zeros((0, 2), np.float64)

    mask_ptr, mask_h, mask_w = None, 0, 0
    if pruning_mask is not None:
        mask = np.ascontiguousarray(pruning_mask > 0, np.uint8)
        mask_ptr = mask.ctypes.data_as(ctypes.c_void_p)
        mask_h, mask_w = mask.shape

    out = np.empty(2 * len(verts), np.float64)
    n_bars = lib.morse_analyze(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(verts),
        edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(edges),
        int(smoothing_window),
        float(min_branch_length),
        float(max_branch_length) if max_branch_length else -1.0,
        1 if remove_isolated_branches else 0,
        mask_ptr,
        mask_h,
        mask_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if n_bars < 0:
        return None
    return out[: 2 * n_bars].reshape(-1, 2)


def morse_stats_native(img, **kwargs) -> Optional[Tuple[int, float, float]]:
    """(n_branches, total_len, avg_len) matching MorseGraph.get_* methods,
    or None when the native path is unavailable."""
    bars = morse_barcode_native(img, **kwargs)
    if bars is None:
        return None
    lengths = bars[:, 1] - bars[:, 0]
    lengths = lengths[~np.isinf(lengths)]
    total = float(np.sum(lengths))
    avg = 0.0 if total == 0 else float(total / len(lengths))
    return len(bars), total, avg
