"""Native Morse engine (csrc/morse.cpp) vs the Python MorseGraph.

The Python MorseGraph is reference-parity-proven (test_reference_parity),
so bit-equality here transfers that proof to the native fast path. The
CPython set emulation the trim order depends on is fuzz-tested directly.
"""

import ctypes
import random

import numpy as np
import pytest

from tmat_tpu.topo import morse_native as mn
from tmat_tpu.topo.morse import MorseGraph


@pytest.fixture(scope="module")
def lib():
    lib = mn._get_lib()
    if lib is None:
        pytest.skip("native morse library unavailable")
    return lib


def _vessel_image(seed, size=96):
    from tmat_tpu.models.synthetic import synth_vessel_image

    img, _ = synth_vessel_image(np.random.RandomState(seed), size)
    img = img.astype(np.float32)
    rng = img.max() - img.min()
    return (img - img.min()) / (rng if rng else 1.0) * 255.0


# --------------------------------------------------------------------------
# CPython set emulation fuzz
# --------------------------------------------------------------------------


def _run_trace_c(lib, ops):
    arr = np.array(ops, dtype=np.int64).ravel()
    out = np.zeros(200000, np.int64)
    n = lib.pyset_trace(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(ops),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(out),
    )
    return list(out[:n])


def _run_trace_py(ops):
    s = set()
    out = []
    for op, val in ops:
        if op == 0:
            s.add(val)
        elif op == 1:
            out.append(s.pop() if s else -1)
        elif op == 2:
            keys = list(s)
            out.append(len(keys))
            out.extend(keys)
    return out


@pytest.mark.parametrize("seed", range(5))
def test_pyset_emulation_matches_cpython(lib, seed):
    rng = random.Random(seed)
    for _ in range(40):
        n_vals = rng.randint(1, 400)
        vals = [rng.randint(0, 5000) for _ in range(n_vals)]
        if rng.random() < 0.5:
            vals = sorted(vals)
        ops = [(0, v) for v in vals]
        ops.append((2, 0))
        ops += [(1, 0)] * rng.randint(0, n_vals + 2)
        ops.append((2, 0))
        assert _run_trace_c(lib, ops) == _run_trace_py(ops)


# --------------------------------------------------------------------------
# Full-pipeline equality vs Python MorseGraph
# --------------------------------------------------------------------------


def _assert_native_matches_python(img, **kwargs):
    bars_native = mn.morse_barcode_native(img, **kwargs)
    assert bars_native is not None
    mg = MorseGraph(img, **kwargs)
    bars_py = np.asarray(mg.barcode, np.float64).reshape(-1, 2)
    assert len(bars_native) == len(bars_py), (
        f"branch count: native {len(bars_native)} vs python {len(bars_py)}"
    )
    # same leaf iteration order -> same bar order; exact float equality
    np.testing.assert_array_equal(bars_native, bars_py)

    stats = mn.morse_stats_native(img, **kwargs)
    assert stats[0] == len(mg.barcode)
    np.testing.assert_allclose(stats[1], mg.get_total_branch_length(), rtol=0)
    np.testing.assert_allclose(stats[2], mg.get_average_branch_length(), rtol=0)


@pytest.mark.parametrize("seed", range(6))
def test_native_matches_python_vessels(lib, seed):
    img = _vessel_image(seed)
    _assert_native_matches_python(
        img,
        thresholds=(5, 10),
        smoothing_window=12,
        min_branch_length=12,
    )


@pytest.mark.parametrize("seed", range(4))
def test_native_matches_python_random(lib, seed):
    rng = np.random.RandomState(seed + 100)
    img = (rng.rand(64, 72) * 200).astype(np.float32)
    img[img < 30] = 0
    _assert_native_matches_python(
        img,
        thresholds=(3, 8),
        smoothing_window=8,
        min_branch_length=6,
    )


def test_native_matches_python_pruning_mask(lib):
    img = _vessel_image(2)
    yy, xx = np.mgrid[0 : img.shape[0], 0 : img.shape[1]]
    mask = ((yy - 48) ** 2 + (xx - 48) ** 2) > 40**2
    _assert_native_matches_python(
        img,
        thresholds=(5, 10),
        smoothing_window=12,
        min_branch_length=12,
        pruning_mask=mask,
    )


def test_native_matches_python_remove_isolated(lib):
    img = _vessel_image(3)
    _assert_native_matches_python(
        img,
        thresholds=(5, 10),
        smoothing_window=12,
        min_branch_length=12,
        remove_isolated_branches=True,
    )


def test_native_empty_image(lib):
    img = np.zeros((32, 32), np.float32)
    bars = mn.morse_barcode_native(img, thresholds=(5, 10))
    assert bars is not None and len(bars) == 0
    assert mn.morse_stats_native(img, thresholds=(5, 10)) == (0, 0.0, 0.0)
