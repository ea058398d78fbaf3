"""String-graph layer tests: build, transitive reduction, tips, unitigs.

Strategy per SURVEY.md §5: hand-built known graphs (Myers-paper style
a->b->c plus a->c) + property tests of every vectorized pass against the
slow oracle on random graphs + an end-to-end stage-2 integration test on
error-free simulated reads.
"""
import numpy as np
import pytest

from phasm_tpu.alignments import AlignmentTable
from phasm_tpu.graph import (
    StringGraph,
    build_string_graph,
    merge_unambiguous_paths,
    remove_tips,
    remove_transitive_edges,
)
from phasm_tpu.graph.oracle import tips_oracle, transitive_edges_oracle
from phasm_tpu.graph.tips import _tip_reads_one_round, isolated_read_mask
from phasm_tpu.graph.transitive import reduce_mask_jax, reduce_mask_np
from phasm_tpu.sim import simulate_reads, truth_alignments
from phasm_tpu.filter import FilterChain, MinOverlapLength, ProperOverlapsOnly


def line_alignments():
    """3 reads tiling a 2500bp genome: r0[0,1500) r1[500,2000) r2[1000,2500)."""
    rows = [
        # a, b, strand, a_start, a_end, b_start, b_end, diffs
        (0, 1, 0, 500, 1500, 0, 1000, 0),
        (1, 2, 0, 500, 1500, 0, 1000, 0),
        (0, 2, 0, 1000, 1500, 0, 500, 0),
    ]
    t = AlignmentTable.from_rows(rows)
    lengths = np.array([1500, 1500, 1500], dtype=np.int32)
    return t, lengths


def test_build_line_graph():
    t, lengths = line_alignments()
    types = t.classify(lengths)
    g = build_string_graph(t, types, lengths)
    assert g.check_symmetric()
    edges = g.to_edge_set()
    # fwd chain 0->2->4 (+ transitive 0->4) and dual 5->3->1 (+5->1)
    assert (0, 2) in edges and (2, 4) in edges and (0, 4) in edges
    assert (5, 3) in edges and (3, 1) in edges and (5, 1) in edges
    assert g.n_edges == 6
    # elen on 0->2: appended suffix of r1 = 500
    i = [k for k in range(g.n_edges) if (g.src[k], g.dst[k]) == (0, 2)][0]
    assert g.elen[i] == 500
    i = [k for k in range(g.n_edges) if (g.src[k], g.dst[k]) == (0, 4)][0]
    assert g.elen[i] == 1000


def test_transitive_reduction_line():
    t, lengths = line_alignments()
    types = t.classify(lengths)
    g = build_string_graph(t, types, lengths)
    r = remove_transitive_edges(g, fuzz=10)
    edges = r.to_edge_set()
    assert (0, 4) not in edges and (5, 1) not in edges
    assert (0, 2) in edges and (2, 4) in edges
    assert r.n_edges == 4
    assert r.check_symmetric()


def random_graph(rng, n_reads=12, n_edges=40, max_elen=50):
    n_nodes = 2 * n_reads
    src = rng.integers(0, n_nodes, size=n_edges)
    dst = rng.integers(0, n_nodes, size=n_edges)
    ok = (src != dst) & (src != (dst ^ 1))
    src, dst = src[ok], dst[ok]
    elen = rng.integers(1, max_elen, size=src.shape[0])
    g = StringGraph(
        n_nodes,
        src,
        dst,
        elen,
        np.full(src.shape[0], 100),
        np.full(n_nodes, 1000, dtype=np.int32),
    )
    return g.canonicalize()


@pytest.mark.parametrize("seed", range(8))
def test_transitive_property_vs_oracle(seed):
    rng = np.random.default_rng(seed)
    g = random_graph(rng)
    for fuzz in (0, 10, 1000):
        mask = reduce_mask_np(g, fuzz)
        got = {(int(g.src[i]), int(g.dst[i])) for i in np.nonzero(mask)[0]}
        want = transitive_edges_oracle(g, fuzz)
        assert got == want, f"fuzz={fuzz}"


@pytest.mark.parametrize("seed", range(4))
def test_transitive_jax_matches_np(seed):
    rng = np.random.default_rng(100 + seed)
    g = random_graph(rng, n_reads=20, n_edges=80)
    for fuzz in (0, 25):
        assert np.array_equal(reduce_mask_np(g, fuzz), reduce_mask_jax(g, fuzz))


def test_transitive_jax_beyond_int32_key_cap():
    """Node counts beyond the round-4 int32 pair-key cap (46,340) run on
    device: the jit pass bisects CSR rows instead of composing scalar keys.
    Line graph (node i -> i+1, i+2 with additive elens: every +2 edge is
    transitive) at 60k nodes, checked bit-identical to the numpy oracle."""
    n = 60_000
    s = np.arange(n, dtype=np.int64)
    pos = np.cumsum(np.full(n + 2, 100, dtype=np.int64))
    src = np.concatenate([s, s])
    dst = np.concatenate([s + 1, s + 2])
    elen = np.concatenate([pos[s + 1] - pos[s], pos[s + 2] - pos[s]])
    order = np.lexsort((dst, src))
    g = StringGraph(
        n + 2, src[order].astype(np.int32), dst[order].astype(np.int32),
        elen[order].astype(np.int32),
        np.ones(2 * n, dtype=np.int32),
        np.full(n + 2, 1000, np.int32),
    )
    m_np = reduce_mask_np(g, fuzz=10)
    m_jx = reduce_mask_jax(g, fuzz=10)
    # every +2 edge transitive except the last (its witness edge n -> n+1
    # does not exist); no +1 edge removable
    assert int(m_np.sum()) == n - 1
    assert np.array_equal(m_np, np.asarray(m_jx))


def graph_from_edges(edges, n_reads):
    src = np.array([e[0] for e in edges], dtype=np.int32)
    dst = np.array([e[1] for e in edges], dtype=np.int32)
    g = StringGraph(
        2 * n_reads,
        src,
        dst,
        np.full(src.shape[0], 10, dtype=np.int32),
        np.full(src.shape[0], 100, dtype=np.int32),
        np.full(2 * n_reads, 1000, dtype=np.int32),
    )
    return g.canonicalize()


def test_tips_simple_spur():
    # long main chain 0->2->4->6->8->10, spur 12->8 makes 8 a junction;
    # node 12 is a 1-node tip; the main head chain exceeds max_tip_len -> kept
    main = [(0, 2), (2, 4), (4, 6), (6, 8), (8, 10)]
    g = graph_from_edges(main + [(12, 8)], n_reads=7)
    g2, removed = remove_tips(g, max_tip_len=2)
    assert sorted(np.nonzero(removed)[0].tolist()) == [6]
    assert (12, 8) not in g2.to_edge_set()
    assert set(main) <= g2.to_edge_set()


def test_tips_isolated_path_not_removed():
    g = graph_from_edges([(0, 2), (2, 4)], n_reads=3)
    g2, removed = remove_tips(g, max_tip_len=5)
    assert not removed.any()
    assert g2.n_edges == 2


def test_tips_too_long_kept():
    # spur of 3 nodes (12->14->16) feeding junction 10 of a 5-node main chain:
    # kept at max_tip_len=2, clipped at max_tip_len=3 (main chain long -> kept)
    edges = [(0, 2), (2, 4), (4, 6), (6, 8), (8, 10), (10, 18),
             (12, 14), (14, 16), (16, 10)]
    g = graph_from_edges(edges, n_reads=10)
    g2, removed = remove_tips(g, max_tip_len=2)
    assert not removed.any()
    g3, removed3 = remove_tips(g, max_tip_len=3)
    assert sorted(np.nonzero(removed3)[0].tolist()) == [6, 7, 8]


@pytest.mark.parametrize("seed", range(8))
def test_tips_property_vs_oracle(seed):
    rng = np.random.default_rng(200 + seed)
    g = random_graph(rng, n_reads=15, n_edges=30)
    for T in (1, 2, 4):
        got = set(np.nonzero(_tip_reads_one_round(g, T))[0].tolist())
        want = tips_oracle(g, T)
        assert got == want, f"T={T}"


def test_unitig_merge_line():
    t, lengths = line_alignments()
    types = t.classify(lengths)
    g = build_string_graph(t, types, lengths)
    g = remove_transitive_edges(g, fuzz=10)
    ug = merge_unambiguous_paths(g)
    assert ug.n_nodes == 2  # unitig + its rc dual
    assert ug.n_edges == 0
    assert ug.rc.tolist() in ([1, 0],)
    assert ug.length[0] == 2500 and ug.length[1] == 2500
    # members: one direction is [0,2,4], dual [5,3,1]
    mem = {tuple(m.tolist()) for m in ug.members}
    assert mem == {(0, 2, 4), (5, 3, 1)}


def test_stage2_end_to_end_haploid():
    """Error-free haploid sim -> truth alignments -> graph -> unitig == genome."""
    from phasm_tpu import dna
    from phasm_tpu.reads import ReadSet

    rs, truth = simulate_reads(
        seed=3, genome_len=15_000, ploidy=1, coverage=12, mean_read_len=3000,
        error_rate=0.0, indel_rate=0.0,
    )
    t = truth_alignments(rs, truth, min_overlap=300)
    chain = FilterChain([MinOverlapLength(300), ProperOverlapsOnly()])
    ft, types, contained = chain.apply(t, rs.lengths)
    g = build_string_graph(ft, types, rs.lengths)
    assert g.check_symmetric()
    g = remove_transitive_edges(g, fuzz=100)
    g, _ = remove_tips(g, max_tip_len=4)
    ug = merge_unambiguous_paths(g)
    # a clean haploid line: exactly one unitig pair
    assert ug.n_nodes == 2, f"got {ug.n_nodes} unitigs"
    seq = ug.spell(0, rs)
    genome = truth.haplotypes[0]
    s = dna.decode(seq)
    gstr = dna.decode(genome)
    grc = dna.decode(dna.revcomp(genome))
    # unitig spans the covered genome region -> must be a substring of genome
    assert s in gstr or s in grc
    assert seq.shape[0] > 0.9 * genome.shape[0]


# ---------------------------------------------------------------------------
# marginal-edge (dirty) veto in transitive reduction: a witness path through
# a marginal cross-haplotype edge must not eliminate a clean parallel edge
# (the round-2 "zipper" purity mechanism — transitive.reduce_mask_np veto)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", range(6))
def test_transitive_dirty_veto_property(seed):
    rng = np.random.default_rng(300 + seed)
    g = random_graph(rng, n_reads=20, n_edges=80)
    dirty = rng.random(g.n_edges) < 0.3
    for fuzz in (0, 25, 1000):
        m_np = reduce_mask_np(g, fuzz, dirty)
        m_jx = reduce_mask_jax(g, fuzz, dirty)
        got = {(int(g.src[i]), int(g.dst[i])) for i in np.nonzero(m_np)[0]}
        want = transitive_edges_oracle(g, fuzz, dirty)
        assert got == want, f"fuzz={fuzz}"
        assert np.array_equal(m_np, m_jx), f"fuzz={fuzz}"
        # veto never REMOVES more than the unvetoed rule
        assert not np.any(m_np & ~reduce_mask_np(g, fuzz))


def test_transitive_dirty_veto_rescues_parallel_arm():
    # anchor A -> {arm0, arm1} -> B with a marginal zipper edge arm0 -> arm1:
    # unvetoed reduction eliminates A->arm1 (and arm0->B) via the zipper,
    # serializing the two arms; the veto keeps the parallel bubble intact.
    A, arm0, arm1, B = 0, 2, 4, 6
    edges = [
        (A, arm0, 100), (A, arm1, 200),
        (arm0, arm1, 100), (arm0, B, 300),
        (arm1, B, 200),
    ]
    src, dst, elen = (np.array(x) for x in zip(*edges))
    g = StringGraph(8, src, dst, elen, np.full(5, 500),
                    np.full(8, 1000, np.int32)).canonicalize()
    zipper = (g.src == arm0) & (g.dst == arm1)
    assert zipper.sum() == 1

    m_plain = reduce_mask_np(g, fuzz=10)
    removed_plain = {(int(g.src[i]), int(g.dst[i])) for i in np.nonzero(m_plain)[0]}
    assert (A, arm1) in removed_plain and (arm0, B) in removed_plain

    m_veto = reduce_mask_np(g, fuzz=10, dirty=zipper)
    removed_veto = {(int(g.src[i]), int(g.dst[i])) for i in np.nonzero(m_veto)[0]}
    assert (A, arm1) not in removed_veto and (arm0, B) not in removed_veto
    assert np.array_equal(m_veto, reduce_mask_jax(g, fuzz=10, dirty=zipper))


def test_cut_dirty_chords():
    from phasm_tpu.graph.pop import cut_dirty_chords

    # post-veto bubble with a dirty chord arm0 -> arm1: both endpoints keep
    # clean connectivity (arm0 -> B out, A -> arm1 in) -> chord cut
    A, arm0, arm1, B = 0, 2, 4, 6
    edges = [(A, arm0, 100), (A, arm1, 200), (arm0, arm1, 100),
             (arm0, B, 300), (arm1, B, 200)]
    src, dst, elen = (np.array(x) for x in zip(*edges))
    g = StringGraph(8, src, dst, elen, np.full(5, 500),
                    np.full(8, 1000, np.int32)).canonicalize()
    dirty = (g.src == arm0) & (g.dst == arm1)
    out, n = cut_dirty_chords(g, dirty)
    assert n == 1 and out.n_edges == 4
    assert not np.any((out.src == arm0) & (out.dst == arm1))

    # an arm reachable ONLY through the dirty edge keeps it (connectivity
    # dominates): remove A -> arm1 so the chord is arm1's only in-edge
    keep_mask = ~((g.src == A) & (g.dst == arm1))
    g2 = g.take_edges(keep_mask)
    dirty2 = (g2.src == arm0) & (g2.dst == arm1)
    out2, n2 = cut_dirty_chords(g2, dirty2)
    assert n2 == 0 and out2.n_edges == g2.n_edges
