"""Error-bubble popping tests: weak arms pop, het (balanced) arms survive."""
import numpy as np

from phasm_tpu.graph import StringGraph, pop_error_bubbles


def graph_from(edges, n_reads):
    src = np.array([e[0] for e in edges], dtype=np.int32)
    dst = np.array([e[1] for e in edges], dtype=np.int32)
    g = StringGraph(
        2 * n_reads, src, dst,
        np.full(src.shape[0], 10, dtype=np.int32),
        np.full(src.shape[0], 100, dtype=np.int32),
        np.full(2 * n_reads, 1000, dtype=np.int32),
    )
    return g.canonicalize()


def chain(nodes):
    return [(nodes[i], nodes[i + 1]) for i in range(len(nodes) - 1)]


def test_weak_arm_popped():
    # entrance 0, strong arm reads 1..5 (nodes 2..10), weak arm read 6
    # (node 12), exit 14
    strong = chain([0] + [2 * r for r in range(1, 6)] + [14])
    weak = [(0, 12), (12, 14)]
    g = graph_from(strong + weak, n_reads=8)
    g2, removed = pop_error_bubbles(g)
    assert sorted(np.nonzero(removed)[0].tolist()) == [6]
    assert (0, 12) not in g2.to_edge_set()
    assert set(strong) <= g2.to_edge_set()


def test_balanced_het_bubble_kept():
    # two arms with 3 reads each: balanced -> heterozygous, must survive
    armA = chain([0, 2, 4, 6, 16])
    armB = chain([0, 8, 10, 12, 16])
    g = graph_from(armA + armB, n_reads=9)
    g2, removed = pop_error_bubbles(g)
    assert not removed.any()
    assert g2.n_edges == g.n_edges


def test_dominance_threshold():
    # weak arm 1 read vs strong arm 4 reads: 4 < 5*1 -> kept (could be het)
    strong = chain([0] + [2 * r for r in range(1, 5)] + [12])
    weak = [(0, 14), (14, 12)]
    g = graph_from(strong + weak, n_reads=8)
    g2, removed = pop_error_bubbles(g, dominance=5.0)
    assert not removed.any()
    # stronger dominance setting pops it
    g3, removed3 = pop_error_bubbles(g, dominance=3.0)
    assert sorted(np.nonzero(removed3)[0].tolist()) == [7]


def test_noisy_haploid_bubbles_disappear():
    """6%-error haploid: popping collapses error bubbles (the c3 artifact)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from phasm_tpu.bubbles import find_superbubbles
    from phasm_tpu.graph import (
        build_string_graph, merge_unambiguous_paths, remove_tips,
        remove_transitive_edges,
    )
    from phasm_tpu.overlap import OverlapConfig, overlap_reads
    from phasm_tpu.sim import simulate_reads

    rs, truth = simulate_reads(
        seed=9, genome_len=25_000, ploidy=1, coverage=18, mean_read_len=4000,
        error_rate=0.06, read_len_spread=0.25,
    )
    t = overlap_reads(rs, OverlapConfig(min_overlap=700, backend="jnp"))
    types = t.classify(rs.lengths)
    keep = (t.diffs <= 0.16 * np.maximum(t.overlap_length(), 1))
    g = build_string_graph(t.take(keep), types[keep], rs.lengths)
    g = remove_transitive_edges(g, fuzz=700)
    g, _ = remove_tips(g, max_tip_len=4)

    before = len(find_superbubbles(merge_unambiguous_paths(g)))
    from phasm_tpu.filter import estimate_read_errors
    g2, popped = pop_error_bubbles(
        g, aln=t, e_read=estimate_read_errors(t, rs.n_reads)
    )
    g2, _ = remove_tips(g2, max_tip_len=4)
    after = len(find_superbubbles(merge_unambiguous_paths(g2)))
    assert before > 0
    assert after < before, (before, after)


def test_window_filter_improves_allele_purity():
    """Windowed-divergence STACK (the round-2+ purity machinery: edge
    filter, marginal-edge veto / dirty chords, zipper cuts, anchor
    refinement): diploid haplotig allele purity with the stack on must beat
    the pure global-threshold baseline with ALL of it off.  (The baseline
    originally disabled only the edge filter; by round 4 the other three
    window-statistic consumers closed the purity gap on their own, which is
    the stack doing its job — the honest comparison is all-on vs all-off.)
    (Supersedes the round-1 AdaptiveErrorRate
    comparison: whole-overlap adaptive thresholds are flank-diluted, the
    window statistic is not — see filter.window_excess_mask.)"""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from phasm_tpu import dna
    from phasm_tpu.overlap import OverlapConfig, overlap_reads
    from phasm_tpu.phasing import PhaseConfig
    from phasm_tpu.pipeline import PipelineConfig, assemble
    from phasm_tpu.sim import simulate_reads

    rs, truth = simulate_reads(
        seed=2, genome_len=60_000, ploidy=2, coverage=18, mean_read_len=5000,
        error_rate=0.04, indel_rate=0.0, snv_rate=0.0,
        hotspots=4, hotspot_rate=0.10, hotspot_width=2000, read_len_spread=0.2,
    )
    t = overlap_reads(rs, OverlapConfig(min_overlap=800, backend="jnp"))

    def purity(res):
        h0g, h1g = truth.haplotypes
        diff_sites = np.nonzero(h0g != h1g)[0]
        ps = []
        for name, h in res.haplotigs:
            hs = dna.decode(h)
            votes = {0: 0, 1: 0}
            for site in diff_sites[::5]:
                lo = max(int(site) - 8, 0)
                p0 = dna.decode(h0g[lo : lo + 17])
                p1 = dna.decode(h1g[lo : lo + 17])
                rc0 = dna.decode(dna.revcomp(h0g[lo : lo + 17]))
                rc1 = dna.decode(dna.revcomp(h1g[lo : lo + 17]))
                in0 = (p0 in hs) or (rc0 in hs)
                in1 = (p1 in hs) or (rc1 in hs)
                if in0 and not in1:
                    votes[0] += 1
                elif in1 and not in0:
                    votes[1] += 1
            tot = votes[0] + votes[1]
            if tot >= 10:
                ps.append(max(votes.values()) / tot)
        return ps

    base_cfg = PipelineConfig(
        min_overlap_length=800, max_error_rate=0.12, length_fuzz=400,
        evidence_max_error=0.5, phase=PhaseConfig(ploidy=2),
        window_filter=False, cut_zippers=False,
        refine_anchor_assignment=False,
    )
    win_cfg = PipelineConfig(
        min_overlap_length=800, max_error_rate=0.12, length_fuzz=400,
        evidence_max_error=0.5, phase=PhaseConfig(ploidy=2),
    )
    p_base = purity(assemble(rs, t, base_cfg))
    p_win = purity(assemble(rs, t, win_cfg))
    assert p_win, "windowed run produced no measurable haplotigs"
    assert np.mean(p_win) > np.mean(p_base) + 0.05, (p_base, p_win)
    # regression floor (measured 0.73-0.90 at round 2; baseline ~0.55-0.70)
    assert np.mean(p_win) >= 0.70, p_win


def test_consensus_polish_improves_accuracy():
    """Pileup polish (C++ racon-lite): per-base accuracy must jump from
    raw-read level (~95%) to >= 99% on the noisy haploid config."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import pytest

    from phasm_tpu import dna, native
    from phasm_tpu.overlap import OverlapConfig, overlap_reads
    from phasm_tpu.pipeline import PipelineConfig, assemble
    from phasm_tpu.sim import simulate_reads

    if native.get_lib() is None:
        pytest.skip("native library unavailable")

    def accuracy_est(seq, genome, k=21, step=97):
        gs = dna.decode(genome) + " " + dna.decode(dna.revcomp(genome))
        hits = tot = 0
        for off in range(0, len(seq) - k, step):
            tot += 1
            if dna.decode(seq[off : off + k]) in gs:
                hits += 1
        p = hits / max(tot, 1)
        return p ** (1.0 / k) if p > 0 else 0.0

    rs, truth = simulate_reads(
        seed=9, genome_len=25_000, ploidy=1, coverage=18, mean_read_len=4000,
        error_rate=0.05, read_len_spread=0.25,
    )
    t = overlap_reads(rs, OverlapConfig(min_overlap=700, backend="jnp"))
    accs = {}
    for pol in (False, True):
        cfg = PipelineConfig(
            min_overlap_length=700, max_error_rate=0.16, length_fuzz=700,
            polish=pol,
        )
        res = assemble(rs, t, cfg)
        accs[pol] = accuracy_est(res.contigs[0][1], truth.haplotypes[0])
    assert accs[True] >= 0.99, accs
    assert accs[True] > accs[False] + 0.02, accs


# ---------------------------------------------------------------------------
# zipper cut: unitig-level pooled window statistics (graph/pop.py
# :: cut_zipper_edges) — the per-row 6-sigma filter cannot separate marginal
# cross-haplotype junction edges; the pooled junction evidence can.
# ---------------------------------------------------------------------------

def _zipper_fixture(rows, n_edges=2):
    """Two unitigs (plus rc duals) joined by edge u0->u2 and its dual u3->u1."""
    import dataclasses

    from phasm_tpu.alignments import AlignmentTable
    from phasm_tpu.graph.unitigs import UnitigGraph

    members = [
        np.array([0, 2, 4]),     # u0: reads 0,1,2 fwd
        np.array([5, 3, 1]),     # u1 = rc(u0)
        np.array([6, 8, 10]),    # u2: reads 3,4,5 fwd
        np.array([11, 9, 7]),    # u3 = rc(u2)
    ]
    offsets = [np.array([0, 100, 200])] * 4
    ug = UnitigGraph(
        members=members, offsets=offsets,
        length=np.array([300, 300, 300, 300]),
        rc=np.array([1, 0, 3, 2]),
        src=np.array([0, 3][:n_edges], dtype=np.int32),
        dst=np.array([2, 1][:n_edges], dtype=np.int32),
        elen=np.arange(n_edges, dtype=np.int32) + 250,
        ovl=np.arange(n_edges, dtype=np.int32) + 50,
    )
    r = np.array(rows, dtype=np.int32)
    z = np.zeros(r.shape[0], dtype=np.int32)
    aln = AlignmentTable(
        a_id=r[:, 0], b_id=r[:, 1], strand=z, a_start=z, a_end=z + 400,
        b_start=z, b_end=z + 400, diffs=z + 8, win=r[:, 2],
    )
    e_read = np.full(6, 0.01)  # mu per row = 0.02 * 256 = 5.12 window edits
    return ug, aln, e_read


def test_zipper_edge_cut_with_dual():
    from phasm_tpu.graph.pop import cut_zipper_edges

    # two DISJOINT cross-junction pairs, both ~4 sigma over expectation
    # (win 14 vs mu 5.12, sd 2.26): pooled ~5.6 sigma -> cut edge AND dual
    ug, aln, e = _zipper_fixture([(0, 3, 14), (1, 4, 14)])
    out, n_cut = cut_zipper_edges(ug, aln, e, n_reads=6)
    assert n_cut == 2
    assert out.n_edges == 0


def test_zipper_kept_when_clean_supporter_exists():
    from phasm_tpu.graph.pop import cut_zipper_edges

    # one clean row (win 5 ~ expectation) among the junction evidence:
    # a legitimate same-haplotype junction always has one -> keep
    ug, aln, e = _zipper_fixture([(0, 3, 14), (1, 4, 14), (2, 5, 5)])
    out, n_cut = cut_zipper_edges(ug, aln, e, n_reads=6)
    assert n_cut == 0
    assert out.n_edges == 2


def test_zipper_kept_without_disjoint_corroboration():
    from phasm_tpu.graph.pop import cut_zipper_edges

    # both excess rows share read 0 (a single read's dense-error patch can
    # flag every row it participates in) -> not corroborated -> keep
    ug, aln, e = _zipper_fixture([(0, 3, 14), (0, 4, 14)])
    out, n_cut = cut_zipper_edges(ug, aln, e, n_reads=6)
    assert n_cut == 0
    assert out.n_edges == 2


def test_zipper_kept_single_row():
    from phasm_tpu.graph.pop import cut_zipper_edges

    ug, aln, e = _zipper_fixture([(0, 3, 20)])
    out, n_cut = cut_zipper_edges(ug, aln, e, n_reads=6)
    assert n_cut == 0
    assert out.n_edges == 2
