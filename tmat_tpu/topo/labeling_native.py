"""Native CCL + region statistics: ctypes binding to csrc/labeling.cpp.

The plate pipeline's host postprocess (component labeling, per-region
perimeter/circularity, skeleton fork detection — topo/regionprops.py and
filter_branch_seg_mask) was the dominant aggregate cost at round-2 end
(BENCH_r02: 6.85s postprocess vs 1.26s device). This module collapses it
to one or two C calls per well; every function returns None when no C++
toolchain is available and callers fall back to the NumPy path, which
remains the semantic oracle (tests/test_labeling_native.py asserts exact
label-raster equality vs scipy.ndimage.label and allclose props vs the
NumPy implementations).
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

_CSRC = Path(__file__).resolve().parent / "csrc" / "labeling.cpp"
_SO_PATH = Path(__file__).resolve().parent / "csrc" / "_labeling.so"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False

_I32P = ctypes.POINTER(ctypes.c_int32)
_U8P = ctypes.POINTER(ctypes.c_uint8)
_F64P = ctypes.POINTER(ctypes.c_double)


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
            f"labeling_native: native build unavailable ({exc}); "
            "using NumPy regionprops",
            file=sys.stderr,
        )
        _BUILD_FAILED = True
        return None

    lib.ccl_label.restype = ctypes.c_int64
    lib.ccl_label.argtypes = [_U8P, ctypes.c_int64, ctypes.c_int64,
                              ctypes.c_int32, _I32P]
    lib.region_props.restype = None
    lib.region_props.argtypes = [_I32P, ctypes.c_int64, ctypes.c_int64,
                                 ctypes.c_int32, _F64P, _F64P, _F64P, _F64P]
    lib.branch_filter.restype = ctypes.c_int64
    lib.branch_filter.argtypes = [_U8P, _U8P, ctypes.c_int64, ctypes.c_int64,
                                  ctypes.c_int32, _U8P]
    lib.drop_small_regions.restype = None
    lib.drop_small_regions.argtypes = [_I32P, ctypes.c_int64, ctypes.c_int64,
                                       ctypes.c_int32, ctypes.c_int64]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is None and not _BUILD_FAILED:
        with _LOCK:
            if _LIB is None and not _BUILD_FAILED:
                _LIB = _build_library()
    return _LIB


def available() -> bool:
    return _get_lib() is not None


def _f64p(a: Optional[np.ndarray]):
    return a.ctypes.data_as(_F64P) if a is not None else None


def label_native(
    mask: np.ndarray, connectivity: int = 2
) -> Optional[Tuple[np.ndarray, int]]:
    """(labels int32, n_labels) matching scipy.ndimage.label numbering."""
    lib = _get_lib()
    if lib is None:
        return None
    m = np.ascontiguousarray(np.asarray(mask) > 0, np.uint8)
    h, w = m.shape
    labels = np.empty((h, w), np.int32)
    n = lib.ccl_label(m.ctypes.data_as(_U8P), h, w, int(connectivity),
                      labels.ctypes.data_as(_I32P))
    return labels, int(n)


def region_props_native(
    labels: np.ndarray, n_labels: int, props=("area", "perimeter")
) -> Optional[dict]:
    """Per-region stats dict (index i = label i+1), or None."""
    lib = _get_lib()
    if lib is None:
        return None
    lab = np.ascontiguousarray(labels, np.int32)
    h, w = lab.shape
    want_ecc = "eccentricity" in props
    want_perim = "perimeter" in props
    area = np.zeros(max(n_labels, 1), np.float64)
    perim = np.zeros(max(n_labels, 1), np.float64) if want_perim else None
    ecc = np.zeros(max(n_labels, 1), np.float64) if want_ecc else None
    eqd = (
        np.zeros(max(n_labels, 1), np.float64)
        if "equivalent_diameter_area" in props
        else None
    )
    lib.region_props(lab.ctypes.data_as(_I32P), h, w, int(n_labels),
                     _f64p(area), _f64p(perim), _f64p(ecc), _f64p(eqd))
    out = {}
    if "area" in props:
        out["area"] = area[:n_labels]
    if want_perim:
        out["perimeter"] = perim[:n_labels]
    if want_ecc:
        out["eccentricity"] = ecc[:n_labels]
    if eqd is not None:
        out["equivalent_diameter_area"] = eqd[:n_labels]
    return out


def branch_filter_native(
    mask: np.ndarray, skeleton: np.ndarray, remove_isolated: bool
) -> Optional[np.ndarray]:
    """filter_branch_seg_mask's label/filter pass in one C call, or None.

    ``mask`` must already be median-filtered (or footprint=None
    semantics); ``skeleton`` is its Zhang-Suen skeleton. Returns the
    filtered mask (same dtype as input).
    """
    lib = _get_lib()
    if lib is None:
        return None
    if mask.dtype not in (np.uint8, np.bool_) and mask.max(initial=0) > 255:
        return None  # uint8 transport would truncate preserved values
    m = np.ascontiguousarray(mask, np.uint8)
    s = np.ascontiguousarray(np.asarray(skeleton) > 0, np.uint8)
    h, w = m.shape
    out = np.empty((h, w), np.uint8)
    lib.branch_filter(m.ctypes.data_as(_U8P), s.ctypes.data_as(_U8P), h, w,
                      1 if remove_isolated else 0, out.ctypes.data_as(_U8P))
    return out.astype(mask.dtype, copy=False)


def remove_small_objects_native(
    labels: np.ndarray, n_labels: int, min_size: int
) -> Optional[np.ndarray]:
    """skimage remove_small_objects over a label raster, or None."""
    lib = _get_lib()
    if lib is None:
        return None
    out = np.ascontiguousarray(labels, np.int32).copy()
    h, w = out.shape
    lib.drop_small_regions(out.ctypes.data_as(_I32P), h, w, int(n_labels),
                           int(min_size))
    return out.astype(labels.dtype, copy=False)
