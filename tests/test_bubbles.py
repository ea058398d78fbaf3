"""Superbubble detection tests on known graphs (SURVEY.md §5 test model)."""
import numpy as np

from phasm_tpu.bubbles import (
    build_chains,
    enumerate_paths,
    find_superbubbles,
    superbubble_from,
)
from phasm_tpu.graph.unitigs import UnitigGraph


def make_ug(edges, n_nodes, rc=None):
    src = np.array([e[0] for e in edges], dtype=np.int32)
    dst = np.array([e[1] for e in edges], dtype=np.int32)
    order = np.lexsort((dst, src))
    if rc is None:
        rc = np.arange(n_nodes, dtype=np.int64)  # self-dual placeholder
    return UnitigGraph(
        members=[np.array([2 * i]) for i in range(n_nodes)],
        offsets=[np.zeros(1, dtype=np.int64) for _ in range(n_nodes)],
        length=np.full(n_nodes, 100, dtype=np.int64),
        rc=np.asarray(rc, dtype=np.int64),
        src=src[order],
        dst=dst[order],
        elen=np.full(len(edges), 50, dtype=np.int32)[order],
        ovl=np.full(len(edges), 50, dtype=np.int32)[order],
    )


def test_simple_diamond():
    # 0 -> {1,2} -> 3
    g = make_ug([(0, 1), (0, 2), (1, 3), (2, 3)], 4)
    bubbles = find_superbubbles(g)
    assert len(bubbles) == 1
    b = bubbles[0]
    assert (b.entrance, b.exit) == (0, 3)
    assert b.interior == frozenset({1, 2})
    assert enumerate_paths(g, b) == [(1,), (2,)]


def test_longer_arm_paths():
    # 0 -> 1 -> 2 -> 5 ; 0 -> 3 -> 4 -> 5
    g = make_ug([(0, 1), (1, 2), (2, 5), (0, 3), (3, 4), (4, 5)], 6)
    bubbles = find_superbubbles(g)
    assert len(bubbles) == 1
    assert bubbles[0].interior == frozenset({1, 2, 3, 4})
    assert enumerate_paths(g, bubbles[0]) == [(1, 2), (3, 4)]


def test_not_a_bubble_external_entry():
    # interior node 2 has an external parent 9 -> not a superbubble
    g = make_ug([(0, 1), (0, 2), (1, 3), (2, 3), (9, 2)], 10)
    assert find_superbubbles(g) == []


def test_tip_inside_aborts():
    # arm 2 dead-ends
    g = make_ug([(0, 1), (0, 2), (1, 3)], 4)
    assert find_superbubbles(g) == []


def test_cycle_aborts():
    g = make_ug([(0, 1), (0, 2), (1, 3), (2, 3), (3, 0)], 4)
    assert find_superbubbles(g) == []


def test_nested_inner_bubble_found():
    # outer 0..5 with inner diamond 1 -> {2,3} -> 4 on one arm:
    # 0 -> 1, 1 -> 2, 1 -> 3, 2 -> 4, 3 -> 4, 4 -> 5, 0 -> 6, 6 -> 5
    g = make_ug([(0, 1), (1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (0, 6), (6, 5)], 7)
    bubbles = find_superbubbles(g)
    pairs = {(b.entrance, b.exit) for b in bubbles}
    assert (1, 4) in pairs  # inner bubble
    assert (0, 5) in pairs  # outer bubble


def test_chain_linking_and_dual_dedup():
    # two consecutive diamonds 0->{1,2}->3->{4,5}->6 plus an RC dual copy
    # nodes 7..13 with rc mapping
    fwd = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (3, 5), (4, 6), (5, 6)]
    rc = [13, 12, 11, 10, 9, 8, 7, 6, 5, 4, 3, 2, 1, 0]
    dual = [(rc[v], rc[u]) for (u, v) in fwd]
    g = make_ug(fwd + dual, 14, rc=rc)
    bubbles = find_superbubbles(g)
    assert len(bubbles) == 4  # 2 fwd + 2 dual
    chains = build_chains(g, bubbles)
    assert len(chains) == 1  # dual chain dropped
    c = chains[0]
    assert len(c.bubbles) == 2
    assert (c.entrance, c.exit) in {(0, 6), (7, 13)}


def test_paths_deterministic_and_capped():
    g = make_ug([(0, 1), (0, 2), (0, 3), (1, 4), (2, 4), (3, 4)], 5)
    b = find_superbubbles(g)[0]
    assert enumerate_paths(g, b) == [(1,), (2,), (3,)]
    assert enumerate_paths(g, b, max_paths=2) == [(1,), (2,)]
