"""Segmentation-mask post-processing and skeleton graphs.

Parity target: fl_tissue_model_tools/transforms.py:170-361 —
nx_graph_from_binary_skeleton (vectorized 4-direction shift-intersection
edge extraction with sqrt(2) diagonal weights), filter_branch_seg_mask
(median filter + drop circular / fork-free components), and
remove_small_islands.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import networkx as nx
import numpy as np
import numpy.typing as npt
from scipy import ndimage

from tmat_tpu.ops.morphology import disk, skeletonize
from tmat_tpu.topo import regionprops as rp


def median_filter_footprint(img: np.ndarray, footprint: np.ndarray) -> np.ndarray:
    """Rank-median over an arbitrary footprint (skimage.filters.median,
    mode='nearest'). Device kernel: taps are static shifted slices."""
    fp = np.asarray(footprint) > 0
    kh, kw = fp.shape
    ry, rx = (kh - 1) // 2, (kw - 1) // 2
    x = jnp.asarray(img)
    pads = [(ry, kh - 1 - ry), (rx, kw - 1 - rx)]
    padded = jnp.pad(x, pads, mode="edge")
    h, w = x.shape
    taps = [
        padded[dy : dy + h, dx : dx + w]
        for dy in range(kh)
        for dx in range(kw)
        if fp[dy, dx]
    ]
    return np.asarray(jnp.median(jnp.stack(taps), axis=0))


@jax.jit
def _median_filter_disk2_batch(x: jnp.ndarray) -> jnp.ndarray:
    """disk(2) median over a (B, H, W) batch in one device program."""
    fp = disk(2) > 0
    kh, kw = fp.shape
    ry, rx = (kh - 1) // 2, (kw - 1) // 2
    padded = jnp.pad(x, [(0, 0), (ry, kh - 1 - ry), (rx, kw - 1 - rx)], mode="edge")
    h, w = x.shape[-2:]
    taps = [
        padded[:, dy : dy + h, dx : dx + w]
        for dy in range(kh)
        for dx in range(kw)
        if fp[dy, dx]
    ]
    return jnp.median(jnp.stack(taps), axis=0)


def median_filter_batch(x) -> jnp.ndarray:
    """Batched disk(2) median (the filter_branch_seg_mask pre-step), for
    plate pipelines that then call filter_branch_seg_mask(footprint=None)."""
    return _median_filter_disk2_batch(jnp.asarray(x))


# geometry-keyed fused (disk(2) median -> skeletonize) closures for the
# default filter_branch_seg_mask path: the unfused chain dispatched six
# eager device programs per image (pad/slice/stack/median + skeletonize),
# each a per-process remote XLA compile on the TPU tunnel (cold-start
# census, BASELINE.md). Closes over no weights -> safe to AOT-cache.
_MEDIAN_SKEL_JITS: dict = {}


def _skeletonize_aot(mask_bool: np.ndarray) -> np.ndarray:
    """Standalone geometry-keyed Zhang-Suen skeleton (the footprint=None
    filter_branch_seg_mask path, e.g. the 3-D Sato pipeline) through the
    cross-process executable cache — eager skeletonize was one more
    per-process remote compile."""
    key = tuple(mask_bool.shape)
    fn = _MEDIAN_SKEL_JITS.get(("skel",) + key)
    if fn is None:
        fn = _MEDIAN_SKEL_JITS[("skel",) + key] = jax.jit(skeletonize)
    from tmat_tpu.core.aot_cache import aot_call

    return np.asarray(
        aot_call(fn, (mask_bool,), ("skeletonize",) + key, label="skeletonize")
    )


def _median_skel_disk2(mask_u8: np.ndarray):
    """(disk(2)-median-filtered uint8 mask, its Zhang-Suen skeleton) as ONE
    cross-process-cached device program; bit-equal to
    median_filter_footprint(mask, disk(2)) + skeletonize(med > 0)."""
    key = tuple(mask_u8.shape)
    fn = _MEDIAN_SKEL_JITS.get(key)
    if fn is None:
        def core(m):
            med = _median_filter_disk2_batch(m[None].astype(jnp.float32))[0]
            med = med.astype(jnp.uint8)
            return med, skeletonize(med > 0)

        fn = _MEDIAN_SKEL_JITS[key] = jax.jit(core)
    from tmat_tpu.core.aot_cache import aot_call

    med, skel = aot_call(
        fn, (mask_u8,), ("median_skel_disk2",) + key, label="median_skel"
    )
    return np.asarray(med), np.asarray(skel)


def nx_graph_from_binary_skeleton(skeleton: npt.NDArray) -> nx.Graph:
    """Weighted undirected graph of a binary skeleton
    (transforms.py:209-288)."""
    skeleton = np.asarray(skeleton).astype(bool)
    g = nx.Graph()

    node_pos = np.argwhere(skeleton)
    g.graph["physical_pos"] = node_pos
    if len(node_pos) == 0:
        return g

    node_labels = np.full(skeleton.shape, -1)
    node_labels[node_pos[:, 0], node_pos[:, 1]] = np.arange(node_pos.shape[0])
    edge_connected = np.zeros(skeleton.shape, dtype=bool)
    weighted_edges = []

    def shift_2d(arr, pad_vals):
        padded = np.pad(arr, pad_vals)
        pad_bottom, pad_right = pad_vals[0, 1], pad_vals[1, 1]
        h, w = arr.shape
        return padded[pad_bottom : h + pad_bottom, pad_right : w + pad_right]

    for shift_rows, shift_cols in [(1, 0), (0, 1), (1, 1), (1, -1)]:
        pad_top, pad_bottom = (shift_rows == 1), 0
        pad_left, pad_right = (shift_cols == 1), (shift_cols == -1)
        pad_vals = np.array([[pad_top, pad_bottom], [pad_left, pad_right]])
        shifted = shift_2d(skeleton, pad_vals)

        dest_nodes = skeleton * shifted
        if not np.any(dest_nodes):
            continue
        src_nodes = shift_2d(dest_nodes, np.flip(pad_vals, axis=1))
        edge_connected += src_nodes + dest_nodes

        src_ids = node_labels[(node_labels > -1) & src_nodes]
        dest_ids = node_labels[(node_labels > -1) & dest_nodes]
        weight = np.linalg.norm((shift_rows, shift_cols))
        weighted_edges.extend(zip(src_ids, dest_ids, np.full(src_ids.shape, weight)))

    g.add_weighted_edges_from(weighted_edges)

    isolated = skeleton * np.logical_not(edge_connected)
    if np.any(isolated):
        g.add_nodes_from(node_labels[(node_labels > -1) & isolated].tolist())
    return g


def filter_branch_seg_mask(
    mask: npt.NDArray,
    footprint: Optional[npt.NDArray] = "default",
    remove_isolated: bool = True,
    precomputed_skeleton: Optional[npt.NDArray] = None,
) -> npt.NDArray:
    """Drop components that are too circular or contain no forks
    (transforms.py:306-361).

    ``precomputed_skeleton`` lets plate pipelines pass a device-batched
    skeleton of the (already median-filtered) mask instead of this call
    dispatching a per-well skeletonize.
    """
    mask = np.asarray(mask)
    if isinstance(footprint, str) and footprint == "default":
        footprint = disk(2)
    if precomputed_skeleton is not None and footprint is not None:
        raise ValueError(
            "precomputed_skeleton requires footprint=None: the skeleton must "
            "correspond to the mask actually labeled (post-median)"
        )
    seg_skel = None
    if (
        footprint is not None
        and mask.dtype == np.uint8
        and mask.ndim == 2
        and footprint.shape == (5, 5)
        and np.array_equal(footprint > 0, disk(2) > 0)
    ):
        # default disk(2) path: median + skeletonize fused into one
        # AOT-cached program (the skeleton is needed below either way)
        mask, seg_skel = _median_skel_disk2(mask)
    elif footprint is not None:
        mask = median_filter_footprint(mask, footprint).astype(mask.dtype)
    else:
        mask = mask.copy()

    # native one-call path: label + circularity + skeleton fork detection
    # + apply, all in csrc/labeling.cpp (the NumPy body below is the
    # fallback/oracle — tests/test_labeling_native.py pins equality)
    from tmat_tpu.topo import labeling_native as ln

    if ln.available():
        if precomputed_skeleton is not None:
            seg_skel = np.asarray(precomputed_skeleton)
        elif seg_skel is None:
            seg_skel = _skeletonize_aot(np.asarray(mask > 0))
        native = ln.branch_filter_native(mask, seg_skel, remove_isolated)
        if native is not None:
            return native

    labeled, n_labels = rp.label(mask, connectivity=2)
    if n_labels == 0:
        return mask
    props = rp.region_properties(labeled, n_labels, props=("area", "perimeter"))
    circularities = (
        4 * np.pi * props["area"] / (props["perimeter"] ** 2 + 1e-7)
    )

    if precomputed_skeleton is not None:
        seg_skel = np.asarray(precomputed_skeleton)
    elif seg_skel is None:
        seg_skel = _skeletonize_aot(np.asarray(mask > 0))

    # Only per-component max degree and the owning seg label are needed;
    # both are vectorized raster reductions (the graph-building path cost
    # ~50ms/well and dominated the plate postprocess stage). Degree of a
    # skeleton pixel = its 8-neighbor count; skeleton components = 8-conn
    # ndimage.label; every skeleton component lies inside exactly one
    # labeled mask component, so a max over `labeled` recovers its label.
    skel_b = seg_skel.astype(bool)
    skel_labels, n_sk = ndimage.label(skel_b, structure=np.ones((3, 3), int))
    if n_sk:
        deg = (
            ndimage.correlate(
                skel_b.astype(np.uint8), np.ones((3, 3), np.uint8), mode="constant"
            )
            - 1
        )
        # scatter-reduce by label (ndimage.maximum argsorts internally)
        sk_px = skel_labels[skel_b]
        max_deg = np.zeros(n_sk + 1, deg.dtype)
        np.maximum.at(max_deg, sk_px, deg[skel_b])
        seg_lbl = np.zeros(n_sk + 1, np.int64)
        seg_lbl[sk_px] = labeled[skel_b]  # constant within a component
        keep = np.ones(n_labels + 1, bool)
        for k in range(1, n_sk + 1):
            lbl = seg_lbl[k]
            if lbl == 0:
                continue
            has_fork = max_deg[k] > 2
            if (remove_isolated and not has_fork) or circularities[lbl - 1] > 0.8:
                keep[lbl] = False
        mask[~keep[labeled]] = 0

    return mask


def _skeleton_components(skeleton: np.ndarray):
    """(node positions, degree array, components) of a skeleton raster.

    Matches nx_graph_from_binary_skeleton's node numbering (argwhere order)
    and edge set (8-connectivity via 4 shift directions); the representative
    node checked per component is any member, and component labels are
    consistent because every node of a skeleton component lies in the same
    labeled mask component.
    """
    from tmat_tpu.topo.lightgraph import LightGraph

    skeleton = skeleton.astype(bool)
    node_pos = np.argwhere(skeleton)
    node_labels = np.full(skeleton.shape, -1)
    node_labels[node_pos[:, 0], node_pos[:, 1]] = np.arange(node_pos.shape[0])

    g = LightGraph()
    n_nodes = node_pos.shape[0]
    degrees = np.zeros(n_nodes, np.int32)
    h, w = skeleton.shape
    for dr, dc in [(1, 0), (0, 1), (1, 1), (1, -1)]:
        src_r = slice(max(0, -dr), h - max(0, dr))
        src_c = slice(max(0, -dc), w - max(0, dc))
        dst_r = slice(max(0, dr), h + min(0, dr) or h)
        dst_c = slice(max(0, dc), w + min(0, dc) or w)
        pair = skeleton[src_r, src_c] & skeleton[dst_r, dst_c]
        srcs = node_labels[src_r, src_c][pair]
        dsts = node_labels[dst_r, dst_c][pair]
        for u, v in zip(srcs.tolist(), dsts.tolist()):
            g.add_edge(u, v)
            degrees[u] += 1
            degrees[v] += 1

    components = list(g.connected_components())
    # isolated skeleton pixels form their own 1-node components
    in_graph = set(g.nodes)
    components.extend([i] for i in range(n_nodes) if i not in in_graph)
    return node_pos, degrees, components


def remove_small_islands(
    mask: npt.NDArray,
    min_area0: int = 100,
    min_area1: int = 100,
    connectivity0: int = 1,
    connectivity1: int = 1,
) -> npt.NDArray:
    """Fill small holes then drop small islands (transforms.py:170-206)."""
    mask = np.asarray(mask)
    if mask.min() != 0 or mask.max() > 1:
        raise ValueError("this function expects a binary mask of values 0 and 1")
    mask = mask.copy()

    inverse = 1 - mask
    labeled_inv, _ = rp.label(inverse, connectivity=connectivity0)
    labeled_inv = rp.remove_small_objects(labeled_inv, min_area0)
    mask[labeled_inv == 0] = 1

    labeled, _ = rp.label(mask, connectivity=connectivity1)
    labeled = rp.remove_small_objects(labeled, min_area1)
    mask[labeled == 0] = 0
    return mask
