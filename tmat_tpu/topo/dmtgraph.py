"""Discrete Morse graph: ctypes binding to the C++ kernel + NumPy fallback.

The native kernel (csrc/dmtgraph.cpp) implements the semantics of the
reference's dmtgraph (fl_tissue_model_tools/dmtgraph.py:38-453). It is
compiled on first use with the system C++ toolchain and cached next to the
source; if no compiler is available the pure-NumPy implementation below is
used (identical outputs, used in tests as a cross-check oracle).
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
from numpy.typing import NDArray

_CSRC = Path(__file__).resolve().parent / "csrc" / "dmtgraph.cpp"
_SO_PATH = Path(__file__).resolve().parent / "csrc" / "_dmtgraph.so"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False


def _build_library() -> Optional[ctypes.CDLL]:
    """Compile the kernel if needed and load it."""
    global _BUILD_FAILED
    if _BUILD_FAILED:
        return None
    try:
        if (not _SO_PATH.exists()) or _SO_PATH.stat().st_mtime < _CSRC.stat().st_mtime:
            cmd = [
                os.environ.get("CXX", "g++"),
                "-O3",
                "-march=native",  # built per-machine on demand; 24% faster
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
                # -march=native unsupported on some toolchains
                cmd.remove("-march=native")
                subprocess.run(cmd, check=True, capture_output=True)
        lib = ctypes.CDLL(str(_SO_PATH))
    except (subprocess.CalledProcessError, OSError) as exc:
        print(f"dmtgraph: native build unavailable ({exc}); using NumPy fallback",
              file=sys.stderr)
        _BUILD_FAILED = True
        return None

    lib.dmt_compute_graph.restype = ctypes.c_int
    lib.dmt_compute_graph.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.dmt_free.argtypes = [ctypes.c_void_p]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is None and not _BUILD_FAILED:
        with _LOCK:
            if _LIB is None and not _BUILD_FAILED:
                _LIB = _build_library()
    return _LIB


def compute_dmt_graph(
    img: NDArray[np.float32], delta1: float, delta2: float = 0.0
) -> Tuple[NDArray[np.int32], NDArray[np.int32]]:
    """Discrete-Morse graph of a grayscale image (dmtgraph.py:38-99).

    Returns (vertex positions (V, 2) int32, edge index pairs (E, 2) int32).
    """
    img = np.ascontiguousarray(img, dtype=np.float32)
    if img.ndim != 2:
        raise ValueError("img must be 2-D grayscale")

    lib = _get_lib()
    if lib is None:
        return compute_dmt_graph_numpy(img, delta1, delta2)

    verts_p = ctypes.POINTER(ctypes.c_int32)()
    edges_p = ctypes.POINTER(ctypes.c_int32)()
    n_verts = ctypes.c_int32()
    n_edges = ctypes.c_int32()
    status = lib.dmt_compute_graph(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        img.shape[0],
        img.shape[1],
        ctypes.c_float(delta1),
        ctypes.c_float(delta2),
        ctypes.byref(verts_p),
        ctypes.byref(n_verts),
        ctypes.byref(edges_p),
        ctypes.byref(n_edges),
    )
    if status != 0:
        raise RuntimeError(f"dmt_compute_graph failed with status {status}")
    try:
        nv, ne = n_verts.value, n_edges.value
        verts = np.ctypeslib.as_array(verts_p, shape=(max(nv, 1), 2))[:nv].copy()
        edges = np.ctypeslib.as_array(edges_p, shape=(max(ne, 1), 2))[:ne].copy()
    finally:
        lib.dmt_free(verts_p)
        lib.dmt_free(edges_p)
    return verts.astype(np.int32), edges.astype(np.int32)


# ---------------------------------------------------------------------------
# Pure-NumPy implementation (oracle / fallback)
# ---------------------------------------------------------------------------


def compute_dmt_graph_numpy(
    img: NDArray[np.float32], delta1: float, delta2: float = 0.0
) -> Tuple[NDArray[np.int32], NDArray[np.int32]]:
    """Reference-semantics implementation in NumPy + Python loops."""
    img = np.asarray(img, np.float32)
    nrows, ncols = img.shape
    vval = (-img).ravel().astype(np.float32)
    n_verts = vval.size
    n_dual = (nrows - 1) * (ncols - 1) * 2

    neg = -img
    max0 = np.maximum.reduce([neg[:-1, :-1], neg[:-1, 1:], neg[1:, :-1]])
    max1 = np.maximum.reduce([neg[:-1, 1:], neg[1:, :-1], neg[1:, 1:]])
    dvval = np.empty(n_dual + 1, np.float32)
    dvval[0:n_dual:2] = max0.ravel()
    dvval[1 : n_dual + 1 : 2] = max1.ravel()
    dvval[n_dual] = np.inf

    edges = []  # (v1, v2, dv1, dv2)
    # vertical
    for r in range(nrows - 1):
        for c in range(ncols):
            dual = r * 2 * (ncols - 1) + c * 2
            dv1 = n_dual if c == 0 else dual - 1
            dv2 = n_dual if c == ncols - 1 else dual
            edges.append((r * ncols + c, (r + 1) * ncols + c, dv1, dv2))
    # horizontal
    for r in range(nrows):
        for c in range(ncols - 1):
            dual = r * 2 * (ncols - 1) + c * 2
            dv1 = n_dual if r == 0 else dual - 2 * (ncols - 1) + 1
            dv2 = n_dual if r == nrows - 1 else dual
            edges.append((r * ncols + c, r * ncols + c + 1, dv1, dv2))
    # anti-diagonal
    for r in range(nrows - 1):
        for c in range(ncols - 1):
            dual = r * 2 * (ncols - 1) + c * 2
            edges.append((r * ncols + c + 1, (r + 1) * ncols + c, dual, dual + 1))

    E = np.array(edges, np.int64)
    nz = np.abs(vval) > 1e-8
    keep = nz[E[:, 0]] & nz[E[:, 1]]
    E = E[keep]
    max_val = np.maximum(vval[E[:, 0]], vval[E[:, 1]])

    idx = np.arange(len(E))
    perm = np.lexsort((idx, max_val))
    E = E[perm]
    max_val = max_val[perm]

    pair_type = np.zeros(len(E), np.uint8)
    persistence = np.full(len(E), np.inf, np.float32)

    def make_uf(n):
        return np.arange(n, dtype=np.int64)

    def find(parent, v):
        root = v
        while parent[root] != root:
            root = parent[root]
        while parent[v] != root:
            parent[v], v = root, parent[v]
        return root

    def merge(parent, values, v1, v2, flip):
        p1, p2 = find(parent, v1), find(parent, v2)
        if p1 == p2:
            return np.nan
        if flip:
            p1_wins = values[p1] > values[p2] or (
                values[p1] == values[p2] and p1 > p2
            )
        else:
            p1_wins = values[p1] < values[p2] or (
                values[p1] == values[p2] and p1 < p2
            )
        if p1_wins:
            parent[p2] = p1
            return values[p2]
        parent[p1] = p2
        return values[p1]

    parent = make_uf(n_verts)
    for i in range(len(E)):
        birth = merge(parent, vval, E[i, 0], E[i, 1], False)
        if not np.isnan(birth):
            persistence[i] = max_val[i] - birth
            pair_type[i] = 1

    dparent = make_uf(n_dual + 1)
    for i in range(len(E) - 1, -1, -1):
        if pair_type[i] != 0:
            continue
        death = merge(dparent, dvval, E[i, 2], E[i, 3], True)
        if not np.isnan(death):
            persistence[i] = death - max_val[i]
            pair_type[i] = 2

    # collect (iterate descending (value, index))
    neighbors = np.full((n_verts, 4), -1, np.int64)
    for i in range(len(E) - 1, -1, -1):
        if pair_type[i] == 1 and persistence[i] < delta1:
            for a, b in ((E[i, 0], E[i, 1]), (E[i, 1], E[i, 0])):
                slots = neighbors[a]
                for k in range(4):
                    if slots[k] == -1:
                        slots[k] = b
                        break

    morse_parent = np.full(n_verts, -1, np.int64)
    explored = np.full(n_verts, -1, np.int64)
    queue = np.zeros(n_verts, np.int64)
    for i in range(n_verts):
        if morse_parent[i] != -1:
            continue
        qs, qe = 0, 1
        queue[0] = i
        min_v = i
        while qs < qe:
            curr = queue[qs]
            qs += 1
            explored[curr] = i
            if vval[curr] < vval[min_v] or (
                vval[curr] == vval[min_v] and curr < min_v
            ):
                min_v = curr
            for nb in neighbors[curr]:
                if nb == -1:
                    break
                if explored[nb] != i:
                    queue[qe] = nb
                    qe += 1
        morse_parent[min_v] = min_v
        qs, qe = 0, 1
        queue[0] = min_v
        while qs < qe:
            curr = queue[qs]
            qs += 1
            for nb in neighbors[curr]:
                if nb == -1:
                    break
                if morse_parent[nb] == -1:
                    morse_parent[nb] = curr
                    queue[qe] = nb
                    qe += 1

    in_manifold = np.zeros(n_verts, bool)
    mn_edges = []

    def collect_path(v):
        curr = v
        while (
            not in_manifold[curr]
            and morse_parent[curr] != curr
            and morse_parent[curr] != -1
        ):
            in_manifold[curr] = True
            mn_edges.append((curr, morse_parent[curr]))
            curr = morse_parent[curr]

    for i in range(len(E) - 1, -1, -1):
        edge_val = max(vval[E[i, 0]], vval[E[i, 1]])
        if persistence[i] > delta1 and edge_val < -delta2:
            collect_path(E[i, 0])
            collect_path(E[i, 1])
            mn_edges.append((int(E[i, 0]), int(E[i, 1])))

    index_map = np.full(n_verts, -1, np.int64)
    verts_out = []
    edges_out = np.zeros((len(mn_edges), 2), np.int32)
    vp = 0
    for i, (a, b) in enumerate(mn_edges):
        if index_map[a] == -1:
            index_map[a] = vp
            verts_out.append((a // ncols, a % ncols))
            vp += 1
        if index_map[b] == -1:
            index_map[b] = vp
            verts_out.append((b // ncols, b % ncols))
            vp += 1
        edges_out[i] = (index_map[a], index_map[b])

    verts_arr = np.array(verts_out, np.int32).reshape(-1, 2)
    return verts_arr, edges_out
