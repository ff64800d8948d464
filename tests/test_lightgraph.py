"""LightGraph property tests vs networkx (order semantics included)."""

import networkx as nx
import numpy as np
import pytest

from tmat_tpu.topo.lightgraph import LightGraph
from tmat_tpu.topo import transforms as tf


def _random_edges(rng, n_nodes=30, n_edges=60):
    return [
        (int(rng.randint(n_nodes)), int(rng.randint(n_nodes))) for _ in range(n_edges)
    ]


@pytest.mark.parametrize("seed", range(5))
def test_matches_networkx_structure(seed):
    rng = np.random.RandomState(seed)
    edges = [(u, v) for u, v in _random_edges(rng) if u != v]
    lg = LightGraph.from_edges(edges)
    g = nx.Graph(edges)

    assert set(lg.nodes) == set(g.nodes)
    for n in g.nodes:
        assert lg.degree[n] == g.degree[n]
        assert set(lg.neighbors(n)) == set(g.neighbors(n))
    lg_comps = sorted(sorted(c) for c in lg.connected_components())
    nx_comps = sorted(sorted(c) for c in nx.connected_components(g))
    assert lg_comps == nx_comps


def test_insertion_order_semantics():
    edges = [(5, 2), (2, 9), (9, 5), (1, 7)]
    lg = LightGraph.from_edges(edges)
    g = nx.Graph()
    g.add_edges_from(edges)
    # node iteration order = first appearance; neighbor order = edge order
    assert list(lg.nodes) == list(g.nodes)
    for n in g.nodes:
        assert list(lg.neighbors(n)) == list(g.neighbors(n))


def test_removal_and_isolates():
    lg = LightGraph.from_edges([(0, 1), (1, 2), (3, 4)])
    lg.remove_edges_from([(0, 1)])
    assert lg.degree[0] == 0
    assert 0 in lg.isolates()
    lg.remove_nodes_from([1])
    assert 1 not in lg.nodes
    assert lg.degree[2] == 0


def test_skeleton_components_matches_nx(rng):
    skel = rng.rand(32, 32) > 0.75
    node_pos, degrees, comps = tf._skeleton_components(skel)
    G = tf.nx_graph_from_binary_skeleton(skel)
    for n in G.nodes():
        assert degrees[n] == G.degree[n]
    assert sorted(sorted(c) for c in comps) == sorted(
        sorted(c) for c in nx.connected_components(G)
    )
