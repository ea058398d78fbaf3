"""Phasing DP stress suite (VERDICT r2 #8): long chains (100+ bubbles),
k = 4, regional ploidy variation, and the no-silent-truncation guarantee.

Ref: phasm/phasing.py :: BubbleChainPhaser (SURVEY.md §3.1, §8.3 item 2) —
the reference was validated only end-to-end on sims; these fixtures place
read evidence by hand so the branch-score-prune DP is verified exactly at
chain scale.
"""
import numpy as np
import pytest

from phasm_tpu import metrics
from phasm_tpu.alignments import AlignmentTable
from phasm_tpu.bubbles import build_chains, find_superbubbles
from phasm_tpu.graph.unitigs import UnitigGraph
from phasm_tpu.phasing import PhaseConfig, phase_chain
from phasm_tpu.reads import ReadSet

LOW, HIGH = 0, 10  # diffs over ovl 50 -> err 0.0 vs 0.2


def long_chain_fixture(n_bubbles, arms_per_bubble, k, unlink_junctions=()):
    """Chain of ``n_bubbles`` bubbles; bubble i has ``arms_per_bubble[i]``
    arms.  k haplotype "rails" run down the chain: rail h takes arm
    h % arms_i at bubble i (so bubbles with fewer arms than k model a
    REGIONAL PLOIDY COLLAPSE — several rails share an arm there, the
    aneuploid duplicate-arm case).

    Evidence: one support read per arm (coverage model), and per junction
    (i, i+1) one linking read per rail touching its arm in both bubbles at
    LOW error and every other arm at HIGH — except junctions listed in
    ``unlink_junctions``, which get no linkers (the relative phase across
    them is data-free and MUST surface as a phase break).

    Returns (ug, reads, aln, arms) with arms[i] = list of fwd unitig ids.
    """
    n_b = n_bubbles
    anchors = []
    arms = []
    uid = 0
    for i in range(n_b + 1):
        anchors.append(uid)
        uid += 1
        if i < n_b:
            arms.append(list(range(uid, uid + arms_per_bubble[i])))
            uid += arms_per_bubble[i]
    n_units = uid

    edges = []
    for i in range(n_b):
        for a in arms[i]:
            edges += [(anchors[i], a), (a, anchors[i + 1])]
    rc = list(range(n_units, 2 * n_units)) + list(range(n_units))
    all_edges = edges + [(rc[v], rc[u]) for (u, v) in edges]

    n_support = sum(arms_per_bubble)
    n_link = sum(
        k for j in range(n_b - 1) if j + 1 not in unlink_junctions
    )
    n_reads = n_units + n_support + n_link
    reads = ReadSet.from_sequences(["ACGT" * 25] * n_reads)

    members = [np.array([2 * i]) for i in range(n_units)]
    members += [np.array([2 * i + 1]) for i in range(n_units)]
    offsets = [np.zeros(1, dtype=np.int64)] * (2 * n_units)
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

    rows = []
    rid = n_units
    for i in range(n_b):
        for a in arms[i]:
            rows.append((rid, a, 0, 0, 50, 50, 100, LOW))
            rid += 1
    for j in range(n_b - 1):  # junction between bubble j and j+1
        if j + 1 in unlink_junctions:
            continue
        for h in range(k):
            for i in (j, j + 1):
                mine = arms[i][h % len(arms[i])]
                for a in arms[i]:
                    rows.append(
                        (rid, a, 0, 0, 50, 50, 100,
                         LOW if a == mine else HIGH)
                    )
            rid += 1
    aln = AlignmentTable.from_rows(rows)
    return ug, reads, aln, arms


def run_chain(ug, reads, aln, k, **cfg_kw):
    bubbles = find_superbubbles(ug)
    chains = build_chains(ug, bubbles)
    assert len(chains) == 1
    cfg = PhaseConfig(ploidy=k, **cfg_kw)
    return phase_chain(ug, reads, aln, chains[0], cfg), chains[0]


def chosen_arm_tuples(res):
    """Per-haplotype tuple of chosen arm unitig ids (walks alternate
    anchor, arm, anchor, arm, ...)."""
    return [tuple(nodes[1::2]) for nodes in res.haplotype_paths]


def rails_expected(arms, k, ug):
    """The planted rails, in both chain orientations."""
    n_b = len(arms)
    fwd = {
        tuple(arms[i][h % len(arms[i])] for i in range(n_b))
        for h in range(k)
    }
    rev = {
        tuple(int(ug.rc[arms[n_b - 1 - i][h % len(arms[n_b - 1 - i])]])
              for i in range(n_b))
        for h in range(k)
    }
    return fwd, rev


def assert_rails(res, arms, k, ug):
    got = set(chosen_arm_tuples(res))
    fwd, rev = rails_expected(arms, k, ug)
    assert got == fwd or got == rev, (
        f"haplotypes do not follow the planted rails:\n got={sorted(got)}\n"
        f" fwd={sorted(fwd)}\n rev={sorted(rev)}"
    )


def test_chain_120_bubbles_k2():
    """120-bubble diploid chain, fully linked: rails recovered end to end,
    no phase breaks, and the frontier cap never drops an above-threshold
    candidate (counter must stay 0 — the no-silent-loss guarantee)."""
    n_b = 120
    ug, reads, aln, arms = long_chain_fixture(n_b, [2] * n_b, k=2)
    metrics.reset()
    res, chain = run_chain(ug, reads, aln, k=2)
    assert len(chain.bubbles) == n_b
    assert_rails(res, arms, 2, ug)
    assert res.phase_breaks == []
    c = metrics.report()["counters"]
    assert c.get("phasing.candidates_dropped_above_threshold", 0) == 0
    assert c.get("phasing.paths_truncated", 0) == 0


def test_chain_k4():
    """30-bubble tetraploid chain (4 arms, 4 rails): the DP tracks 4
    haplotypes through 4^4 = 256 extensions per bubble."""
    n_b = 30
    ug, reads, aln, arms = long_chain_fixture(n_b, [4] * n_b, k=4)
    metrics.reset()
    res, _ = run_chain(ug, reads, aln, k=4)
    assert_rails(res, arms, 4, ug)
    assert res.phase_breaks == []
    c = metrics.report()["counters"]
    assert c.get("phasing.candidates_dropped_above_threshold", 0) == 0


def test_chain_regional_ploidy_variation():
    """k=3 chain where bubbles 5..9 collapse to 2 arms (regional aneuploidy,
    SURVEY §1: "k can vary per region"): in the collapsed region two rails
    must share an arm (duplicate choice), elsewhere all three separate."""
    n_b = 15
    apb = [3] * n_b
    for i in range(5, 10):
        apb[i] = 2
    ug, reads, aln, arms = long_chain_fixture(n_b, apb, k=3)
    res, _ = run_chain(ug, reads, aln, k=3)
    assert_rails(res, arms, 3, ug)
    tup = chosen_arm_tuples(res)
    n_bb = len(arms)
    # identify orientation by checking membership of the first haplotype
    fwd, _rev = rails_expected(arms, 3, ug)
    flipped = set(tup) != fwd
    for pos in range(n_bb):
        i = n_bb - 1 - pos if flipped else pos
        picks = [t[pos] for t in tup]
        if apb[i] == 2:
            assert len(set(picks)) == 2, (i, picks)  # duplicate arm chosen
        else:
            assert len(set(picks)) == 3, (i, picks)


def test_chain_phase_breaks_honest():
    """Junctions with no linking evidence MUST be reported as phase breaks
    (the reference joins unconditionally; honest blocks are the round-2
    fix), and junctions with evidence must not."""
    n_b = 24
    gaps = {8, 16}
    ug, reads, aln, arms = long_chain_fixture(
        n_b, [2] * n_b, k=2, unlink_junctions=gaps
    )
    metrics.reset()
    res, _ = run_chain(ug, reads, aln, k=2)
    got = set(res.phase_breaks)
    fwd_ok = got == gaps
    rc_ok = got == {n_b - g for g in gaps}  # chain phased in RC orientation
    assert fwd_ok or rc_ok, (got, gaps)


def test_frontier_cap_fires_loudly(caplog):
    """When the frontier IS too small, the drop must be counted and warned —
    never silent (SURVEY §8.3 item 2).  A flat-evidence wide bubble chain
    with max_candidates=2 forces it."""
    import logging

    n_b = 6
    ug, reads, aln, arms = long_chain_fixture(n_b, [3] * n_b, k=3)
    # strip ALL evidence rows -> every extension scores identically, so the
    # above-threshold set is the full extension space >> max_candidates
    aln0 = aln.take(np.zeros(0, dtype=np.int64))
    metrics.reset()
    with caplog.at_level(logging.WARNING, logger="phasm_tpu.phasing"):
        res, _ = run_chain(
            ug, reads, aln0, k=3, max_candidates=2, prune_factor=0.5
        )
    c = metrics.report()["counters"]
    assert c.get("phasing.candidates_truncated", 0) > 0
    assert c.get("phasing.candidates_dropped_above_threshold", 0) > 0
    assert any("frontier" in r.message for r in caplog.records)
    # still emits k syntactically valid haplotypes
    assert len(res.haplotigs) == 3
