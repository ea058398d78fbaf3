"""Phasing DP tests: controlled-linkage fixtures + end-to-end sim.

The fixtures build a unitig bubble chain directly with hand-placed read
evidence, so branch/score/prune and cross-bubble linkage are verified
exactly (the reference's phasing was validated only end-to-end on sims —
SURVEY.md §5; we test tighter).
"""
import numpy as np
import pytest

from phasm_tpu.alignments import AlignmentTable
from phasm_tpu.bubbles import build_chains, find_superbubbles
from phasm_tpu.graph.unitigs import UnitigGraph
from phasm_tpu.phasing import PhaseConfig, phase_all, phase_chain, read_touch_errs
from phasm_tpu.reads import ReadSet


def chain_fixture(n_arms=2, link="parallel"):
    """Two-bubble chain A -> {B_i} -> C -> {D_j} -> E (+ RC dual), one member
    read per unitig, plus evidence reads:

    * per-arm support reads (one per arm) for the coverage model,
    * two linking reads: with link="parallel" they tie B_i to D_i; with
      link="crossed" they tie B_0 to D_1 and B_1 to D_0.
    """
    n_anchor = 3
    n_units = n_anchor + 2 * n_arms  # A, C, E + arms
    # unit ids (fwd only): A=0, B_i=1..n_arms, C=n_arms+1, D_j=.., E=last
    A = 0
    B = [1 + i for i in range(n_arms)]
    C = 1 + n_arms
    D = [C + 1 + i for i in range(n_arms)]
    E = C + 1 + n_arms

    edges = []
    for b in B:
        edges += [(A, b), (b, C)]
    for d in D:
        edges += [(C, d), (d, E)]
    # duals: unit u's dual is u + n_units
    rc = list(range(n_units, 2 * n_units)) + list(range(n_units))
    dual_edges = [(rc[v], rc[u]) for (u, v) in edges]
    all_edges = edges + dual_edges

    n_member_reads = n_units
    # evidence reads: per-arm support + 2 linkers
    n_support = 2 * n_arms
    n_link = 2
    n_reads = n_member_reads + n_support + n_link
    seqs = ["ACGT" * 25] * n_reads
    reads = ReadSet.from_sequences(seqs)

    members = [np.array([2 * i]) for i in range(n_member_reads)]
    members += [np.array([2 * i + 1]) for i in range(n_member_reads)]  # duals
    offsets = [np.zeros(1, dtype=np.int64)] * (2 * n_member_reads)
    length = np.full(2 * n_units, 100, dtype=np.int64)

    src = np.array([e[0] for e in all_edges], dtype=np.int32)
    dst = np.array([e[1] for e in all_edges], dtype=np.int32)
    order = np.lexsort((dst, src))
    ug = UnitigGraph(
        members=members,
        offsets=offsets,
        length=length,
        rc=np.array(rc, dtype=np.int64),
        src=src[order],
        dst=dst[order],
        elen=np.full(len(all_edges), 50, dtype=np.int32)[order],
        ovl=np.full(len(all_edges), 50, dtype=np.int32)[order],
    )

    LOW, HIGH = 0, 10  # diffs over ovl 50 -> err 0 vs 0.2
    rows = []
    rid = n_member_reads
    # support reads: touch exactly one arm each
    for i in range(n_arms):
        rows.append((rid, B[i], 0, 0, 50, 50, 100, LOW)); rid += 1
    for j in range(n_arms):
        rows.append((rid, D[j], 0, 0, 50, 50, 100, LOW)); rid += 1
    # linking reads: each touches one B arm and one D arm at LOW err,
    # all other arms at HIGH err
    for li in range(n_link):
        bi = li % n_arms
        dj = bi if link == "parallel" else (n_arms - 1 - bi)
        for i in range(n_arms):
            rows.append((rid, B[i], 0, 0, 50, 50, 100, LOW if i == bi else HIGH))
        for j in range(n_arms):
            rows.append((rid, D[j], 0, 0, 50, 50, 100, LOW if j == dj else HIGH))
        rid += 1
    aln = AlignmentTable.from_rows(rows)
    return ug, reads, aln, dict(A=A, B=B, C=C, D=D, E=E)


def phase_fixture(ug, reads, aln, k=2, **cfg_kw):
    bubbles = find_superbubbles(ug)
    chains = build_chains(ug, bubbles)
    assert len(chains) == 1
    assert len(chains[0].bubbles) == 2
    cfg = PhaseConfig(ploidy=k, **cfg_kw)
    return phase_chain(ug, reads, aln, chains[0], cfg)


def arms_of(res, ids):
    """Per-haplotype (B_arm, D_arm) actually chosen (walks are A,b,C,d,E)."""
    return [(nodes[1], nodes[3]) for nodes in res.haplotype_paths]


def test_parallel_linkage():
    ug, reads, aln, ids = chain_fixture(link="parallel")
    res = phase_fixture(ug, reads, aln)
    chosen = arms_of(res, ids)
    # each haplotype pairs B_i with D_i (up to global hap order + RC orientation)
    pairs = set(chosen)
    B, D = ids["B"], ids["D"]
    rcB = [int(ug.rc[b]) for b in B]
    rcD = [int(ug.rc[d]) for d in D]
    ok_fwd = pairs == {(B[0], D[0]), (B[1], D[1])}
    # chain may be phased in RC orientation: then arms appear as rc(D), rc(B)
    ok_rc = pairs == {(rcD[0], rcB[0]), (rcD[1], rcB[1])}
    assert ok_fwd or ok_rc, pairs


def test_crossed_linkage():
    ug, reads, aln, ids = chain_fixture(link="crossed")
    res = phase_fixture(ug, reads, aln)
    pairs = set(arms_of(res, ids))
    B, D = ids["B"], ids["D"]
    rcB = [int(ug.rc[b]) for b in B]
    rcD = [int(ug.rc[d]) for d in D]
    ok_fwd = pairs == {(B[0], D[1]), (B[1], D[0])}
    ok_rc = pairs == {(rcD[1], rcB[0]), (rcD[0], rcB[1])}
    assert ok_fwd or ok_rc, pairs


def test_linkage_beats_no_linkage_score():
    """The winning candidate must be strictly better than alternatives."""
    ug, reads, aln, ids = chain_fixture(link="parallel")
    res = phase_fixture(ug, reads, aln)
    assert res.n_candidates_final >= 1
    assert np.isfinite(res.score)


def test_coverage_model_splits_arms_without_linkage():
    """With no linking reads, coverage still forces opposite arms."""
    ug, reads, aln, ids = chain_fixture(link="parallel")
    # drop the linking reads' rows (they are the last 2*2*n_arms rows)
    n_keep = len(aln) - 2 * 2 * len(ids["B"])
    aln2 = aln.take(np.arange(n_keep))
    res = phase_fixture(ug, reads, aln2)
    chosen = [(p[1], p[3]) for p in res.haplotype_paths]
    # arms within each bubble must differ between haplotypes
    assert chosen[0][0] != chosen[1][0]
    assert chosen[0][1] != chosen[1][1]


def test_prune_factor_tightens_frontier():
    ug, reads, aln, ids = chain_fixture(link="parallel")
    loose = phase_fixture(ug, reads, aln, prune_factor=1e-9)
    tight = phase_fixture(ug, reads, aln, prune_factor=0.9)
    assert tight.n_candidates_final <= loose.n_candidates_final


def test_ploidy3_parallel():
    ug, reads, aln, ids = chain_fixture(n_arms=3, link="parallel")
    res = phase_fixture(ug, reads, aln, k=3)
    chosen = set((p[1], p[3]) for p in res.haplotype_paths)
    B, D = ids["B"], ids["D"]
    rcB = [int(ug.rc[b]) for b in B]
    rcD = [int(ug.rc[d]) for d in D]
    ok_fwd = chosen == {(B[i], D[i]) for i in range(3)}
    ok_rc = chosen == {(rcD[i], rcB[i]) for i in range(3)}
    # linking reads only tie arms 0 and 1 (2 linkers); arm 2 pairs by coverage
    assert ok_fwd or ok_rc, chosen


def test_many_arm_bubble_cap_counted_and_recoverable():
    """SURVEY.md §8.3 item 2: the max_paths cap must never SILENTLY lose a
    haplotype.  An 18-arm bubble at the default cap (16) must increment the
    truncation counter; with the cap raised, all 18 paths enumerate and the
    linked arms still win the DP."""
    from phasm_tpu import metrics
    from phasm_tpu.bubbles import enumerate_paths

    ug, reads, aln, ids = chain_fixture(n_arms=18, link="parallel")
    bubbles = find_superbubbles(ug)
    b = next(bb for bb in bubbles if bb.entrance == ids["A"])

    metrics.reset()
    p16 = enumerate_paths(ug, b, max_paths=16)
    assert len(p16) == 16
    assert metrics.report()["counters"].get("phasing.paths_truncated", 0) == 1

    p32 = enumerate_paths(ug, b, max_paths=32)
    assert len(p32) == 18

    metrics.reset()
    res = phase_fixture(ug, reads, aln, k=2, max_paths=32)
    assert metrics.report()["counters"].get("phasing.paths_truncated", 0) == 0
    pairs = set((p[1], p[3]) for p in res.haplotype_paths)
    B, D = ids["B"], ids["D"]
    rcB = [int(ug.rc[x]) for x in B]
    rcD = [int(ug.rc[x]) for x in D]
    ok_fwd = pairs == {(B[0], D[0]), (B[1], D[1])}
    ok_rc = pairs == {(rcD[0], rcB[0]), (rcD[1], rcB[1])}
    assert ok_fwd or ok_rc, pairs


def test_read_assignment_follows_linkage():
    ug, reads, aln, ids = chain_fixture(link="parallel")
    res = phase_fixture(ug, reads, aln)
    # the two linking reads are the last two read ids
    n_member = 7
    link_reads = [n_member + 4, n_member + 4 + 1]
    a0 = res.read_assignment[link_reads[0]]
    a1 = res.read_assignment[link_reads[1]]
    assert len(a0) == 1 and len(a1) == 1
    assert a0 != a1  # linker 0 -> hap with B0; linker 1 -> hap with B1


def test_end_to_end_spaced_diploid_sim():
    """60 kb diploid with 4 hotspot bubbles: haplotigs >= 99.5% identity and
    arms anti-correlated in every bubble (SURVEY.md §5 thesis-style check)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from phasm_tpu import dna
    from phasm_tpu.filter import (
        FilterChain,
        MaxErrorRate,
        MinOverlapLength,
        ProperOverlapsOnly,
    )
    from phasm_tpu.graph import (
        build_string_graph,
        merge_unambiguous_paths,
        remove_tips,
        remove_transitive_edges,
    )
    from phasm_tpu.sim import simulate_reads, truth_alignments

    rs, truth = simulate_reads(
        seed=1, genome_len=60_000, ploidy=2, coverage=16, mean_read_len=5000,
        error_rate=0.0, indel_rate=0.0, snv_rate=0.0,
        hotspots=4, hotspot_rate=0.08, hotspot_width=2000, read_len_spread=0.2,
    )
    t = truth_alignments(rs, truth, min_overlap=800, cross_hap=True)
    fc = FilterChain([MinOverlapLength(800), MaxErrorRate(0.005), ProperOverlapsOnly()])
    ft, types, cont = fc.apply(t, rs.lengths)
    g = build_string_graph(ft, types, rs.lengths)
    g = remove_transitive_edges(g, fuzz=200)
    g, _ = remove_tips(g, max_tip_len=4)
    ug = merge_unambiguous_paths(g)
    chains = build_chains(ug, find_superbubbles(ug))
    assert len(chains) == 1 and len(chains[0].bubbles) == 4

    ev = t.take(t.diffs <= 0.02 * np.maximum(t.overlap_length(), 1))
    res = phase_all(ug, rs, ev, chains, PhaseConfig(ploidy=2))[0]

    # arms differ between haplotypes at every bubble
    p0, p1 = res.haplotype_paths
    assert len(p0) == len(p1)
    for a, b in zip(p0[1::2], p1[1::2]):  # interior positions
        assert a != b

    # identity vs best-matching truth haplotype
    for h in res.haplotigs:
        best = None
        for gseq in truth.haplotypes:
            for gg in (gseq, dna.revcomp(gseq)):
                off = dna.decode(gg).find(dna.decode(h[:400]))
                if off >= 0:
                    L = min(h.shape[0], gg.shape[0] - off)
                    mism = int((h[:L] != gg[off : off + L]).sum())
                    if best is None or mism < best[0]:
                        best = (mism, L)
        assert best is not None, "haplotig does not anchor on any haplotype"
        assert best[0] / best[1] < 0.005, f"identity too low: {best}"


def test_pipeline_assemble_spaced_diploid():
    """One-call pipeline on the spaced diploid config."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from phasm_tpu.pipeline import PipelineConfig, assemble
    from phasm_tpu.sim import simulate_reads, truth_alignments

    rs, truth = simulate_reads(
        seed=1, genome_len=60_000, ploidy=2, coverage=16, mean_read_len=5000,
        error_rate=0.0, indel_rate=0.0, snv_rate=0.0,
        hotspots=4, hotspot_rate=0.08, hotspot_width=2000, read_len_spread=0.2,
    )
    t = truth_alignments(rs, truth, min_overlap=800, cross_hap=True)
    # split_phase_blocks=False: this test exercises the chain-level path
    # (genome-spanning haplotigs); evidence-free gaps between hotspots would
    # otherwise split honestly into per-hotspot phase blocks (test_purity)
    cfg = PipelineConfig(min_overlap_length=800, max_error_rate=0.005,
                         length_fuzz=200, evidence_max_error=0.02,
                         split_phase_blocks=False)
    res = assemble(rs, t, cfg)
    assert res.stats["n_chains"] == 1
    assert res.stats["n_haplotigs"] == 2
    assert all(len(s) > 50_000 for _, s in res.haplotigs)


def test_pipeline_assemble_haploid_contig(tmp_path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from phasm_tpu.pipeline import PipelineConfig, assemble
    from phasm_tpu.sim import simulate_reads, truth_alignments
    from phasm_tpu.io import fasta

    rs, truth = simulate_reads(seed=3, genome_len=15_000, ploidy=1, coverage=12,
                               mean_read_len=3000, error_rate=0.0, indel_rate=0.0)
    t = truth_alignments(rs, truth, min_overlap=300)
    cfg = PipelineConfig(min_read_length=300, min_overlap_length=300,
                         max_error_rate=0.01, length_fuzz=100)
    res = assemble(rs, t, cfg)
    assert res.stats["n_chains"] == 0
    assert res.stats["n_contigs"] == 1
    out = str(tmp_path / "asm.fa")
    res.write_fasta(out)
    rs2 = fasta.read_fasta(out)
    assert rs2.n_reads == 1
    assert rs2.lengths[0] > 13_000


def test_noisy_diploid_full_production_path():
    """Noisy diploid through the REAL pipeline (engine included): must build
    a bubble-chain assembly with two genome-spanning haplotigs,
    deterministically.  (Haplotype separation quality at 4% read error is a
    known round-2 target — see ARCHITECTURE.md; this pins structure.)"""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from phasm_tpu.overlap import OverlapConfig, overlap_reads
    from phasm_tpu.pipeline import PipelineConfig, assemble
    from phasm_tpu.sim import simulate_reads

    rs, truth = simulate_reads(
        seed=2, genome_len=60_000, ploidy=2, coverage=18, mean_read_len=5000,
        error_rate=0.04, indel_rate=0.0, snv_rate=0.0,
        hotspots=4, hotspot_rate=0.10, hotspot_width=2000, read_len_spread=0.2,
    )
    t = overlap_reads(rs, OverlapConfig(min_overlap=800, backend="jnp"))
    cfg = PipelineConfig(
        min_overlap_length=800, max_error_rate=0.12, length_fuzz=400,
        evidence_max_error=0.5,
    )
    res = assemble(rs, t, cfg)
    assert res.stats["n_chains"] >= 1
    assert res.stats["n_haplotigs"] >= 2
    # production defaults split at evidence-free gaps (phase blocks); each
    # HAPLOTYPE's blocks together must still span (nearly) the whole genome
    per_hap: dict[str, int] = {}
    for name, s in res.haplotigs:
        hap = name.split("_b")[0]
        per_hap[hap] = per_hap.get(hap, 0) + len(s)
    assert len(per_hap) >= 2, per_hap
    total_two = sum(sorted(per_hap.values())[-2:])
    assert total_two > 1.5 * 60_000, per_hap

    res2 = assemble(rs, t, cfg)
    assert [(n, s.tobytes()) for n, s in res.haplotigs] == [
        (n, s.tobytes()) for n, s in res2.haplotigs
    ]


def test_ploidy3_error_free_end_to_end():
    """Triploid spaced-hotspot sim (config-5 analogue, error-free): 3
    haplotigs, arms fully split at every bubble."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from phasm_tpu import dna
    from phasm_tpu.filter import (
        FilterChain, MaxErrorRate, MinOverlapLength, ProperOverlapsOnly,
    )
    from phasm_tpu.graph import (
        build_string_graph, merge_unambiguous_paths, remove_tips,
        remove_transitive_edges,
    )
    from phasm_tpu.sim import simulate_reads, truth_alignments

    rs, truth = simulate_reads(
        seed=4, genome_len=40_000, ploidy=3, coverage=14, mean_read_len=5000,
        error_rate=0.0, indel_rate=0.0, snv_rate=0.0,
        hotspots=2, hotspot_rate=0.08, hotspot_width=2000, read_len_spread=0.2,
    )
    t = truth_alignments(rs, truth, min_overlap=800, cross_hap=True)
    fc = FilterChain([MinOverlapLength(800), MaxErrorRate(0.005), ProperOverlapsOnly()])
    ft, types, cont = fc.apply(t, rs.lengths)
    g = build_string_graph(ft, types, rs.lengths)
    g = remove_transitive_edges(g, fuzz=200)
    g, _ = remove_tips(g, max_tip_len=4)
    ug = merge_unambiguous_paths(g)
    chains = build_chains(ug, find_superbubbles(ug))
    assert chains, "triploid fixture must produce a bubble chain"
    ev = t.take(t.diffs <= 0.02 * np.maximum(t.overlap_length(), 1))
    res = phase_all(ug, rs, ev, chains, PhaseConfig(ploidy=3))[0]
    assert len(res.haplotigs) == 3
    # arms fully split at each bubble (per-bubble path choices all distinct)
    n_b = len(res.chain.bubbles)
    for bi in range(n_b):
        choices = {res.haplotype_choices[m][bi] for m in range(3)}
        assert len(choices) == 3, f"bubble {bi} not fully split: {choices}"
    # each haplotig matches one truth haplotype at high identity
    matched = set()
    for h in res.haplotigs:
        best = None
        for gi, gseq in enumerate(truth.haplotypes):
            for gg in (gseq, dna.revcomp(gseq)):
                off = dna.decode(gg).find(dna.decode(h[:400]))
                if off >= 0:
                    L = min(h.shape[0], gg.shape[0] - off)
                    mism = int((h[:L] != gg[off : off + L]).sum())
                    if best is None or mism < best[1]:
                        best = (gi, mism, L)
        assert best is not None
        assert best[1] / best[2] < 0.01, f"identity too low: {best}"
        matched.add(best[0])
    assert matched == {0, 1, 2}, f"haplotigs collapse onto {matched}"


def test_aneuploid_region_duplicate_arm_choice():
    """Aneuploidy semantics (SURVEY §1: k varies per region): in a k=3 run,
    a bubble with only TWO arms must assign two haplotypes to the
    better-supported arm — duplicate choices are how regional ploidy loss is
    represented (the coverage model arbitrates)."""
    n_units = 4  # A, B0, B1, C
    A, B0, B1, C = 0, 1, 2, 3
    edges = [(A, B0), (A, B1), (B0, C), (B1, C)]
    rc = list(range(n_units, 2 * n_units)) + list(range(n_units))
    dual = [(rc[v], rc[u]) for (u, v) in edges]
    all_edges = edges + dual

    n_member = n_units
    n_support = 9  # 6 reads on B0 (double coverage), 3 on B1
    reads = ReadSet.from_sequences(["ACGT" * 25] * (n_member + n_support))
    members = [np.array([2 * i]) for i in range(n_member)]
    members += [np.array([2 * i + 1]) for i in range(n_member)]
    src = np.array([e[0] for e in all_edges], dtype=np.int32)
    dst = np.array([e[1] for e in all_edges], dtype=np.int32)
    order = np.lexsort((dst, src))
    ug = UnitigGraph(
        members=members,
        offsets=[np.zeros(1, dtype=np.int64)] * (2 * n_member),
        length=np.full(2 * n_units, 100, dtype=np.int64),
        rc=np.array(rc, dtype=np.int64),
        src=src[order],
        dst=dst[order],
        elen=np.full(len(all_edges), 50, dtype=np.int32)[order],
        ovl=np.full(len(all_edges), 50, dtype=np.int32)[order],
    )
    rows = []
    rid = n_member
    for _ in range(6):
        rows.append((rid, B0, 0, 0, 50, 50, 100, 0)); rid += 1
    for _ in range(3):
        rows.append((rid, B1, 0, 0, 50, 50, 100, 0)); rid += 1
    aln = AlignmentTable.from_rows(rows)

    chains = build_chains(ug, find_superbubbles(ug))
    assert len(chains) == 1
    res = phase_chain(ug, reads, aln, chains[0], PhaseConfig(ploidy=3))
    arms = sorted(p[1] for p in res.haplotype_paths)
    # two haplotypes on the 2x-covered arm, one on the other (up to RC frame)
    rcB0, rcB1 = int(ug.rc[B0]), int(ug.rc[B1])
    assert arms in ([B0, B0, B1], sorted([rcB0, rcB0, rcB1])), arms


def _with_win(aln, win_high):
    """Attach a win column: HIGH-err rows get win_high, LOW rows 0."""
    win = np.where(aln.diffs > 0, win_high, 0).astype(np.int32)
    return AlignmentTable(
        aln.a_id, aln.b_id, aln.strand, aln.a_start, aln.a_end,
        aln.b_start, aln.b_end, aln.diffs, win=win,
    )


def test_linkage_requires_window_discrimination():
    """With a win column present, only reads whose cross-arm touches carry
    corroborated window excess may LINK bubbles
    (PhaseConfig.link_discrimination).  Same fixture, two win colorings:

      * discriminating (HIGH rows window-suspect): genuine het evidence on
        both sides -> joined, no phase break;
      * flat (every window clean): the linkers' arm preference is then
        indistinguishable from background noise — measured on the c4
        ladder rung, such "linkers" impose identical constraint rows for
        reads of either haplotype, so the cross-gap phase they license is
        a coin flip -> the gap must break.
    """
    ug, reads, aln, ids = chain_fixture(link="parallel")
    res = phase_fixture(ug, reads, _with_win(aln, 200))
    assert res.phase_breaks == []
    # linkage still pairs the arms correctly (parallel rails)
    pairs = set(arms_of(res, ids))
    B, D = ids["B"], ids["D"]
    rcB = [int(ug.rc[b]) for b in B]
    rcD = [int(ug.rc[d]) for d in D]
    ok_fwd = pairs == {(B[0], D[0]), (B[1], D[1])}
    ok_rc = pairs == {(rcD[0], rcB[0]), (rcD[1], rcB[1])}
    assert ok_fwd or ok_rc, pairs

    res2 = phase_fixture(ug, reads, _with_win(aln, 0))
    assert res2.phase_breaks == [1]

    # opting out restores the permissive rule
    res3 = phase_fixture(
        ug, reads, _with_win(aln, 0), link_discrimination=False
    )
    assert res3.phase_breaks == []
