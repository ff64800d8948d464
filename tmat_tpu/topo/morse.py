"""Morse skeleton forest analysis.

Parity target: fl_tissue_model_tools/topology.py:15-706 — MorseGraph:
sliding-window vertex smoothing with fixed leaves/junctions, two-pass
iterated trimming (short/long/isolated/pruning-masked segments), BFS
minimum spanning forest rooted at the max-degree node per component,
farthest-descendant-leaf branch labeling, branch decomposition with a
persistence barcode (birth = -dist_to_root(leaf), death = birth + branch
length), post-filtering of short branches, and colored tree/barcode plots.

This is deliberately host-side graph code: the device produces the dense
vesselness raster; the graph (thousands of vertices at the 384-px working
width) is pure Python over a lightweight insertion-ordered graph (lightgraph.py),
matching the architecture cut in SURVEY §7.
"""

from __future__ import annotations

import math
from numbers import Number
from typing import Optional, Tuple

import numpy as np
import numpy.typing as npt

from tmat_tpu.topo.dmtgraph import compute_dmt_graph
from tmat_tpu.topo.lightgraph import LightGraph


def _cv2_hsv_to_bgr_unit(h: float, s: float, v: float) -> tuple:
    """cv2 COLOR_HSV2BGR for uint8 inputs, returned as floats in [0, 1].

    cv2's uint8 HSV uses H in [0, 180) (2-degree units), S/V in [0, 255].
    Reproduces topology.py:517-527's golden-ratio branch colors.
    """
    h = float(h % 256) * 2.0  # uint8 wrap, then to degrees (can exceed 360)
    s_f = s / 255.0
    v_f = v / 255.0
    c = v_f * s_f
    hp = (h / 60.0) % 6.0  # wrap hue like cv2 (H in (180, 255] -> >360 deg)
    x = c * (1 - abs(hp % 2 - 1))
    if hp < 1:
        r, g, b = c, x, 0
    elif hp < 2:
        r, g, b = x, c, 0
    elif hp < 3:
        r, g, b = 0, c, x
    elif hp < 4:
        r, g, b = 0, x, c
    elif hp < 5:
        r, g, b = x, 0, c
    else:
        r, g, b = c, 0, x
    m = v_f - c
    r, g, b = r + m, g + m, b + m
    # reference returns BGR/255 (fed to matplotlib as-is)
    return (b, g, r)


class MorseGraph:
    """Morse skeleton of an image represented as a forest
    (topology.py:15-50)."""

    def __init__(
        self,
        img: npt.NDArray,
        thresholds: Tuple[Number, Number] = (1, 4),
        min_branch_length: int = 15,
        max_branch_length: Optional[int] = None,
        remove_isolated_branches: bool = False,
        smoothing_window: int = 15,
        pruning_mask: Optional[npt.NDArray] = None,
    ):
        self.smoothing_window = smoothing_window
        self.thresholds = thresholds
        self.min_branch_length = min_branch_length
        self.max_branch_length = max_branch_length
        self.remove_isolated_branches = remove_isolated_branches
        self.pruning_mask = pruning_mask
        self._shape = img.shape[:2]
        self.barcode = None
        self._leaves = None
        self._branches = None
        self._parent = None
        self._dist_to_root = None
        self._edges_and_colors = None
        self._barcode_and_colors = None
        self._G = None
        self._branch_label = None
        self._vertices = None
        self.__compute_graph(img, thresholds)
        self.__get_branch_labels()
        self.__compute_branches_and_barcode()
        self.__filter_graph()

    # ---------------------------------------------------------------- public

    def get_total_branch_length(self) -> float:
        """Sum of persistence interval lengths (topology.py:54-57)."""
        return float(np.sum(self.__barcode_interval_lengths()))

    def get_average_branch_length(self) -> float:
        """Average bar length (topology.py:59-65)."""
        lengths = self.__barcode_interval_lengths()
        total = np.sum(lengths)
        if total == 0:
            return 0
        return float(total / len(lengths))

    def plot_colored_barcode(self, scaling_factor=1.0, ax=None, **kwargs):
        """Horizontal barcode plot colored per branch (topology.py:67-107)."""
        import matplotlib.pyplot as plt

        if not self._barcode_and_colors:
            self.__compute_colored_tree_and_barcode(scaling_factor)
        ax_provided = ax is not None
        ax = ax if ax_provided else plt.gca()
        if self._barcode_and_colors:
            self._barcode_and_colors.sort(reverse=True, key=lambda pair: pair[0])
            heights = [*range(len(self._barcode_and_colors))]
            barcode, colors = zip(*self._barcode_and_colors)
            births, widths = zip(*[(bar[0], bar[1] - bar[0]) for bar in barcode])
        else:
            heights, widths, births, colors = [], [], [], []
        ax.barh(heights, widths, left=births, color=colors, **kwargs)
        ax.set_yticks([])
        ax.set_xlabel("Barcode")
        if not ax_provided:
            plt.show()

    def plot_colored_tree(self, scaling_factor=1.0, ax=None, **kwargs):
        """Tree plot with per-branch colors (topology.py:109-144)."""
        import matplotlib.pyplot as plt
        from matplotlib.collections import LineCollection

        if not self._edges_and_colors:
            self.__compute_colored_tree_and_barcode(scaling_factor)
        ax_provided = ax is not None
        ax = ax if ax_provided else plt.gca()
        if self._edges_and_colors:
            edges, colors = zip(*self._edges_and_colors)
            colors = [(*c, 1.0) for c in colors]
            ax.add_collection(LineCollection(edges, colors=colors, **kwargs))
        ax.set_axis_off()
        ax.autoscale()
        if not ax_provided:
            plt.show()

    # --------------------------------------------------------------- private

    def __compute_graph(self, img, thresholds):
        G, vertices = self.__compute_nx_graph(img, *thresholds)
        vertices = self.__smooth_graph(G, vertices, self.smoothing_window)
        G = self.__trim_graph(
            G,
            vertices,
            self._shape,
            self.min_branch_length,
            self.max_branch_length,
            self.pruning_mask,
            self.remove_isolated_branches,
        )
        self._G, self._parent, self._dist_to_root = self.__get_forest(
            G, vertices, self.remove_isolated_branches
        )
        self._vertices = vertices

    def __get_branch_labels(self):
        """Farthest-descendant-leaf branch labeling (topology.py:181-222)."""
        parent = self._parent
        verts = self._vertices
        leaves = [n for n in self._G.nodes if self._G.degree[n] == 1]
        max_dist_to_leaf = {v: -np.inf for v in self._G.nodes}
        branch_label = {}
        for leaf in leaves:
            current_vertex = leaf
            current_parent = parent[current_vertex]
            max_dist_to_leaf[leaf] = current_distance = 0
            branch_label[leaf] = leaf
            while current_parent != current_vertex:
                current_distance += self.__edge_len(
                    verts, current_parent, current_vertex
                )
                if current_distance < max_dist_to_leaf[current_parent]:
                    break
                current_vertex = current_parent
                current_parent = parent[current_vertex]
                max_dist_to_leaf[current_vertex] = current_distance
                branch_label[current_vertex] = leaf
        self._leaves = leaves
        self._branch_label = branch_label

    def __compute_branches_and_barcode(self):
        """Branch decomposition + barcode (topology.py:224-271)."""
        branches = []
        barcode = []
        verts = self._vertices
        for leaf in self._leaves:
            current_vertex = leaf
            current_label = leaf
            current_parent = self._parent[leaf]
            current_distance = 0
            current_branch = []
            while current_label == leaf and current_vertex != current_parent:
                current_distance += self.__edge_len(
                    verts, current_parent, current_vertex
                )
                current_branch.append((current_vertex, current_parent))
                current_vertex = current_parent
                current_parent = self._parent[current_vertex]
                current_label = self._branch_label[current_vertex]
            branches.append(np.array(current_branch))
            birth = -self._dist_to_root[leaf]
            death = birth + current_distance
            barcode.append((birth, death))
        self._branches = branches
        self.barcode = barcode

    def __smooth_graph(self, G, vertices, window_size):
        """Sliding-window smoothing, leaves/junctions fixed
        (topology.py:273-316)."""
        if window_size <= 1:
            return vertices
        vertices = vertices.copy()
        fixed_verts = {v for v in G.nodes if G.degree[v] != 2}
        visited = set()
        for fixed_vert_start in fixed_verts:
            for segment_base_vert in G.neighbors(fixed_vert_start):
                branch_vert = segment_base_vert
                if branch_vert in visited:
                    continue
                segment_vertices = [fixed_vert_start, branch_vert]
                branch_verts_visited = set()
                while G.degree[branch_vert] == 2:
                    neighbors = list(G.neighbors(branch_vert))
                    next_vert = (
                        neighbors[0] if neighbors[0] != branch_vert else neighbors[1]
                    )
                    if next_vert in branch_verts_visited:
                        break
                    branch_vert = next_vert
                    branch_verts_visited.add(branch_vert)
                    segment_vertices.append(branch_vert)
                segment_pos = vertices[segment_vertices]
                smoothed = self.__moving_average_fixed_ends(segment_pos, window_size)
                vertices[segment_vertices] = smoothed
                visited.update([segment_vertices[0], segment_vertices[-1]])
        return vertices

    def __filter_graph(self):
        """Drop branches shorter than min_branch_length (topology.py:318-347)."""
        filtered_branches = []
        filtered_barcode = []
        edges_to_remove = []
        for branch, bar in zip(self._branches, self.barcode):
            birth, death = bar
            if death - birth >= self.min_branch_length:
                filtered_branches.append(branch)
                filtered_barcode.append(bar)
            else:
                edges_to_remove.extend(branch)
        self._branches = filtered_branches
        self.barcode = filtered_barcode
        self._G.remove_edges_from(edges_to_remove)
        self._G.remove_nodes_from(self._G.isolates())

    def __barcode_interval_lengths(self):
        if not self.barcode:
            return np.array([])
        barcode = np.array(self.barcode)
        lengths = barcode[:, 1] - barcode[:, 0]
        return lengths[~np.isinf(lengths)]

    def __compute_colored_tree_and_barcode(self, scaling_factor=1.0):
        """Per-branch colors for tree + barcode plots (topology.py:358-389)."""
        edges_and_colors = []
        barcode_and_colors = []
        for i, (branch, bar) in enumerate(zip(self._branches, self.barcode)):
            color = self.__random_color(i)
            bar = (bar[0] * scaling_factor, bar[1] * scaling_factor)
            barcode_and_colors.append((bar, color))
            branch_vertices = [b[0] for b in branch] + [branch[-1][1]]
            branch_pos = self._vertices[branch_vertices] * scaling_factor
            branch_pos = self.__moving_average_fixed_ends(branch_pos, 3)
            for j in range(len(branch_pos) - 1):
                v1 = branch_pos[j]
                v2 = branch_pos[j + 1]
                # mpl uses (x, y) image coordinates -> reverse
                edges_and_colors.append(([v1[::-1], v2[::-1]], color))
        self._edges_and_colors = edges_and_colors
        self._barcode_and_colors = barcode_and_colors

    # -------------------------------------------------------------- utilities

    @staticmethod
    def __compute_nx_graph(im, threshold1=0.5, threshold2=0.0):
        V, E = compute_dmt_graph(im.astype(np.float32), threshold1, threshold2)
        G = LightGraph.from_edges(E)
        # An empty Morse graph flows through like the reference: the forest,
        # branch list and barcode all come out empty and branch statistics
        # report 0 (topology.py writes a 0-branch result, it does not raise).
        return G, V.astype(np.float32)

    @staticmethod
    def __prep_moving_avg_fixed_endpoints(A, n):
        """Endpoint-repeat transform (topology.py:420-448)."""
        assert n >= 2
        assert min(n, math.ceil(len(A) / 2)) == n
        A_transformed = A[n - 1 : -(n - 1)]
        for i in reversed(range(n - 1)):
            idx1, idx2 = i, -i - 1
            repeat = n - i
            A_transformed = np.concatenate(
                ([A[idx1]] * repeat, A_transformed, [A[idx2]] * repeat)
            )
        return A_transformed

    @staticmethod
    def __moving_average(A, n=3):
        ret = np.cumsum(A, axis=0, dtype=float)
        ret[n:] = ret[n:] - ret[:-n]
        return ret[n - 1 :] / n

    @staticmethod
    def __moving_average_fixed_ends(A, n):
        """Moving average fixed at original endpoints (topology.py:457-476)."""
        n = min(n, math.ceil(len(A) / 2))
        assert n != 0
        if n == 1:
            return A
        A_transformed = MorseGraph.__prep_moving_avg_fixed_endpoints(A, n)
        moving_avg = MorseGraph.__moving_average(A_transformed, n)
        return MorseGraph.__interp_n_verts_uniform_spacing(moving_avg, len(A))

    @staticmethod
    def __interp_n_verts_uniform_spacing(verts, n):
        """Uniform-arclength resample of a polyline (topology.py:479-515)."""
        assert len(verts) >= 2
        assert n >= 2
        dists = np.linalg.norm(verts[1:] - verts[:-1], axis=1)
        total_dist = np.sum(dists)
        accum = np.cumsum(np.concatenate(([0], dists)))
        interp_step = total_dist / (n - 1)
        interp_verts = [verts[0]]
        for i in range(1, n - 1):
            interp_dist = i * interp_step
            idx = np.searchsorted(accum, interp_dist, side="right") - 1
            denom = accum[idx + 1] - accum[idx]
            prop = 0.0 if denom == 0 else (interp_dist - accum[idx]) / denom
            interp_verts.append(verts[idx] + (verts[idx + 1] - verts[idx]) * prop)
        interp_verts.append(verts[-1])
        return np.array(interp_verts)

    @staticmethod
    def __random_color(i: int):
        """Golden-ratio HSV color wheel (topology.py:517-527)."""
        phi = 0.618033988749895
        step = 180 * phi
        # np.uint8 cast truncates then wraps mod 256
        return _cv2_hsv_to_bgr_unit(int(step * i) % 256, 220, 255)

    @staticmethod
    def __get_forest(G, verts, remove_isolated_branches):
        """BFS spanning forest per component (topology.py:541-581)."""
        from collections import deque

        forest = LightGraph()
        parent = {n: None for n in G.nodes}
        dist_to_root = {}
        n_total = G.number_of_nodes()
        for comp in G.connected_components():
            # root = first max-degree node in nx's subgraph-view iteration
            # order. FilterAtlas.__iter__ iterates the component SET itself
            # when 2*len(set) < len(graph) (CPython set order, insertion
            # sequence = _plain_bfs BFS order, which our BFS reproduces),
            # and the graph's node order filtered by membership otherwise.
            # Degree ties across components are common on real rasters —
            # wrong order here silently changes the branch decomposition.
            if 2 * len(comp) < n_total:
                cset = set()
                for v in comp:
                    cset.add(v)
                # nx show_nodes REBUILDS the set from nbunch_iter (a
                # generator), i.e. element-by-element in the BFS set's own
                # iteration order with incremental growth — a different
                # table layout (and thus iteration order) than the BFS
                # set itself. Emulate exactly: re-add one by one.
                order = set()
                for v in cset:
                    order.add(v)
            else:
                member = set(comp)
                order = [v for v in G.nodes if v in member]
            root = max(order, key=lambda n: G.degree[n])
            if remove_isolated_branches and G.degree[root] <= 2:
                continue
            parent[root] = root
            dist_to_root[root] = 0
            unvisited = deque([root])
            while unvisited:
                v = unvisited.popleft()
                for n in G.neighbors(v):
                    if parent[n] is None:
                        forest.add_edge(v, n)
                        parent[n] = v
                        dist_to_root[n] = dist_to_root[v] + MorseGraph.__edge_len(
                            verts, v, n
                        )
                        unvisited.append(n)
        return forest, parent, dist_to_root

    @staticmethod
    def __edge_len(verts, v1_idx, v2_idx):
        # hot path (called per edge in BFS/labeling): plain sqrt beats
        # np.linalg.norm's ufunc machinery on 2-vectors by ~10x. sqrt of
        # the explicit sum (NOT math.hypot, whose correctly-rounded
        # algorithm differs from libm's in the last ulp) keeps this
        # bit-identical to the native engine (csrc/morse.cpp): IEEE 754
        # +, * and sqrt are correctly rounded, so C++ and Python agree.
        a = verts[v1_idx]
        b = verts[v2_idx]
        dx = float(a[0]) - float(b[0])
        dy = float(a[1]) - float(b[1])
        return math.sqrt(dx * dx + dy * dy)

    @staticmethod
    def __trim_graph(
        G,
        vertices,
        shape,
        min_branch_length,
        max_branch_length=None,
        pruning_mask=None,
        remove_isolated_branches=False,
    ):
        """Two-pass iterated segment pruning (topology.py:588-706)."""
        G = G.copy()
        if pruning_mask is None:
            pruning_mask = np.zeros(shape, dtype=bool)
        elif pruning_mask.dtype != bool:
            pruning_mask = pruning_mask > 0

        def get_segment_length(segment):
            seg = vertices[segment]
            bbox_min = seg.min(axis=0)
            bbox_max = seg.max(axis=0)
            return np.sqrt(np.sum((bbox_max - bbox_min) ** 2))

        pass_num = 1
        pruning_complete = False
        while not pruning_complete:
            junctions = {n for n in G.nodes if G.degree[n] > 2}
            base_nodes = (
                {n for n in G.nodes if G.degree[n] == 1}
                if pass_num == 1
                else junctions
            )
            unmarked_nodes = {n for n in G.nodes if n not in junctions}
            segments = []
            short_segments = []
            long_segments = []
            isolated_segments = []

            while base_nodes:
                starting_node = base_nodes.pop()
                neighbors = {
                    n for n in G.neighbors(starting_node) if n in unmarked_nodes
                }
                while neighbors:
                    node = neighbors.pop()
                    segment = [starting_node, node] if pass_num == 1 else [node]
                    while True:
                        nbr = [n for n in G.neighbors(node) if n in unmarked_nodes]
                        if not nbr:
                            break
                        node = nbr[0]
                        segment.append(node)
                        unmarked_nodes.remove(node)
                    n_leaf = (G.degree[segment[0]] == 1) + (G.degree[segment[-1]] == 1)
                    if (
                        remove_isolated_branches
                        and n_leaf == 2
                        and not any(G.degree[v] > 2 for v in segment)
                    ):
                        isolated_segments.append(segment)
                    elif n_leaf > 0:
                        seg_len = get_segment_length(segment)
                        if seg_len < min_branch_length:
                            short_segments.append(segment)
                        elif max_branch_length and seg_len > max_branch_length:
                            long_segments.append(segment)
                        else:
                            segments.append(segment)
                    else:
                        segments.append(segment)

            if segments:
                segment_pos = [
                    np.round(np.median(vertices[s], axis=0)).astype(int)
                    for s in segments
                ]
                remove_idx = np.argwhere(
                    pruning_mask[tuple(zip(*segment_pos))]
                ).flatten()
                segments_to_remove = [segments[i] for i in remove_idx]
            else:
                segments_to_remove = []
            segments_to_remove.extend(short_segments)
            segments_to_remove.extend(long_segments)
            segments_to_remove.extend(isolated_segments)

            for segment in segments_to_remove:
                G.remove_edges_from(set(G.edges(segment)))
                G.remove_nodes_from(segment)
            G.remove_nodes_from(G.isolates())

            pruning_complete = pass_num == 2 and not segments_to_remove
            pass_num = 2 if pass_num == 1 else 1

        return G
