"""Differential tests: Brankovic linear superbubbles == Onodera oracle.

SURVEY.md §3.1 row 4 / VERDICT r1 #9: the linear algorithm must report
exactly the oracle's bubbles on random DAGs, random cyclic graphs, and
simulated assembly unitig graphs.
"""
import numpy as np
import pytest

from phasm_tpu.bubbles import find_superbubbles
from phasm_tpu.bubbles_linear import find_superbubbles_linear
from tests.test_bubbles import make_ug


def _as_set(bubbles):
    return {(b.entrance, b.exit, b.interior) for b in bubbles}


def random_dag_edges(rng, n, p):
    """Random DAG via forward edges on a random permutation."""
    perm = rng.permutation(n)
    edges = []
    for i in range(n):
        for j in range(i + 1, min(i + 12, n)):
            if rng.random() < p:
                edges.append((int(perm[i]), int(perm[j])))
    return edges


@pytest.mark.parametrize("seed", range(30))
def test_random_dags_match_oracle(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(6, 60))
    p = float(rng.uniform(0.05, 0.5))
    edges = sorted(set(random_dag_edges(rng, n, p)))
    if not edges:
        return
    g = make_ug(edges, n)
    assert _as_set(find_superbubbles_linear(g)) == _as_set(find_superbubbles(g))


@pytest.mark.parametrize("seed", range(30))
def test_random_cyclic_graphs_match_oracle(seed):
    rng = np.random.default_rng(1000 + seed)
    n = int(rng.integers(6, 50))
    m = int(rng.integers(n, 4 * n))
    edges = set()
    while len(edges) < m:
        u, v = int(rng.integers(0, n)), int(rng.integers(0, n))
        if u != v or rng.random() < 0.05:  # occasional self-loop
            edges.add((u, v))
    g = make_ug(sorted(edges), n)
    assert _as_set(find_superbubbles_linear(g)) == _as_set(find_superbubbles(g))


def test_known_shapes():
    # diamond
    g = make_ug([(0, 1), (0, 2), (1, 3), (2, 3)], 4)
    got = find_superbubbles_linear(g)
    assert len(got) == 1 and (got[0].entrance, got[0].exit) == (0, 3)
    assert got[0].interior == frozenset({1, 2})
    # nested
    g = make_ug([(0, 1), (1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (0, 6), (6, 5)], 7)
    pairs = {(b.entrance, b.exit) for b in find_superbubbles_linear(g)}
    assert (1, 4) in pairs and (0, 5) in pairs
    # external entry kills the bubble
    g = make_ug([(0, 1), (0, 2), (1, 3), (2, 3), (9, 2)], 10)
    assert find_superbubbles_linear(g) == []
    # bubble whose anchors sit on a cycle (entrance+exit in one SCC)
    g = make_ug([(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (4, 0)], 5)
    got = find_superbubbles_linear(g)
    want = find_superbubbles(g)
    assert _as_set(got) == _as_set(want)


def test_sim_unitig_graph_matches_oracle():
    from phasm_tpu.graph import (
        build_string_graph, merge_unambiguous_paths, remove_transitive_edges,
    )
    from phasm_tpu.sim import simulate_reads, truth_alignments

    rs, truth = simulate_reads(
        seed=11, genome_len=40_000, ploidy=2, coverage=10, mean_read_len=2500,
        error_rate=0.0, indel_rate=0.0, snv_rate=0.0, hotspots=3,
        hotspot_rate=0.12, hotspot_width=1500, read_len_spread=0.2,
    )
    t = truth_alignments(rs, truth, min_overlap=500)
    types = t.classify(rs.lengths)
    g = build_string_graph(t, types, rs.lengths)
    g = remove_transitive_edges(g, fuzz=300)
    ug = merge_unambiguous_paths(g)
    got = find_superbubbles_linear(ug)
    want = find_superbubbles(ug)
    assert _as_set(got) == _as_set(want)
    assert len(want) >= 1, "fixture should produce bubbles"


def test_linear_scales_on_long_bubble_chain():
    """1000-bubble chain: linear impl must match the oracle (and this is the
    shape where per-entrance search goes quadratic if exploration overlaps)."""
    edges = []
    v = 0
    for _ in range(1000):
        edges += [(v, v + 1), (v, v + 2), (v + 1, v + 3), (v + 2, v + 3)]
        v += 3
    n = v + 1
    g = make_ug(edges, n)
    got = find_superbubbles_linear(g)
    assert len(got) == 1000
    assert _as_set(got) == _as_set(find_superbubbles(g))
