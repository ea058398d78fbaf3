"""Lockstep-batched phase_all (VERDICT r3 #5): many independent chains
advance together with the scorer vmapped over same-shape buckets.  The
contract is bit-identity with the sequential driver plus a real dispatch
reduction at ~1000 small chains.

Ref: phasm/phasing.py :: BubbleChainPhaser — the reference loops chains
sequentially; SURVEY.md §4.3 "independent per chain -> embarrassingly
parallel in rebuild".
"""
import time

import numpy as np

from phasm_tpu import metrics
from phasm_tpu.alignments import AlignmentTable
from phasm_tpu.bubbles import build_chains
from phasm_tpu.bubbles_linear import find_superbubbles_linear
from phasm_tpu.graph.unitigs import UnitigGraph
from phasm_tpu.phasing import PhaseConfig, phase_all
from phasm_tpu.reads import ReadSet

LOW, HIGH = 0, 10


def many_chains_fixture(n_chains: int, n_bubbles: int = 3, k: int = 2,
                        arms: int = 2, vary: bool = False):
    """Block-diagonal union of ``n_chains`` independent chain components
    (same rail construction as tests/test_phasing_stress.long_chain_fixture,
    minus regional variation).  vary=True staggers bubble counts so chains
    retire from the lockstep at different steps."""
    members, offsets = [], []
    rc_all, src_all, dst_all = [], [], []
    aln_rows = []
    rid = 0
    planted = []  # per chain: list of k rail arm tuples (fwd ids)
    ubase = 0
    for ci in range(n_chains):
        n_b = n_bubbles + (ci % 3 if vary else 0)
        anchors, arm_ids = [], []
        uid = 0
        for i in range(n_b + 1):
            anchors.append(uid)
            uid += 1
            if i < n_b:
                arm_ids.append(list(range(uid, uid + arms)))
                uid += arms
        n_units = uid
        edges = []
        for i in range(n_b):
            for a in arm_ids[i]:
                edges += [(anchors[i], a), (a, anchors[i + 1])]
        rc = list(range(n_units, 2 * n_units)) + list(range(n_units))
        all_edges = edges + [(rc[v], rc[u]) for (u, v) in edges]

        # support reads (one per arm) + k linkers per junction
        unit_reads = n_units
        rb = rid  # read id of unitig u's member = rb + u
        for u in range(n_units):
            members.append(np.array([2 * (rid + u)]))
        for u in range(n_units):
            members.append(np.array([2 * (rid + u) + 1]))
        offsets.extend([np.zeros(1, dtype=np.int64)] * (2 * n_units))
        rc_all.extend([r + ubase for r in rc])
        src_all.extend(e[0] + ubase for e in all_edges)
        dst_all.extend(e[1] + ubase for e in all_edges)
        rid += unit_reads
        for i in range(n_b):
            for a in arm_ids[i]:
                aln_rows.append((rid, rb + a, 0, 0, 50, 50, 100, LOW))
                rid += 1
        for j in range(n_b - 1):
            for h in range(k):
                for i in (j, j + 1):
                    mine = arm_ids[i][h % arms]
                    for a in arm_ids[i]:
                        aln_rows.append(
                            (rid, rb + a, 0, 0, 50, 50, 100,
                             LOW if a == mine else HIGH)
                        )
                rid += 1
        planted.append(
            [
                tuple(arm_ids[i][h % arms] + ubase for i in range(n_b))
                for h in range(k)
            ]
        )
        ubase += 2 * n_units

    reads = ReadSet.from_sequences(["ACGT" * 25] * rid)
    n_total = ubase
    length = np.full(n_total, 100, dtype=np.int64)
    src = np.array(src_all, dtype=np.int32)
    dst = np.array(dst_all, dtype=np.int32)
    order = np.lexsort((dst, src))
    ug = UnitigGraph(
        members=members,
        offsets=offsets,
        length=length,
        rc=np.array(rc_all, dtype=np.int64),
        src=src[order],
        dst=dst[order],
        elen=np.full(src.shape[0], 50, dtype=np.int32)[order],
        ovl=np.full(src.shape[0], 50, dtype=np.int32)[order],
    )
    aln = AlignmentTable.from_rows(aln_rows)
    return ug, reads, aln, planted


def _result_key(r):
    return (
        r.haplotype_choices,
        [tuple(p) for p in r.haplotype_paths],
        [h.tobytes() for h in r.haplotigs],
        r.score,
        r.n_candidates_final,
        sorted((k, tuple(v)) for k, v in r.read_assignment.items()),
        r.phase_breaks,
    )


def test_batched_equals_sequential_small():
    ug, reads, aln, planted = many_chains_fixture(7, n_bubbles=3, vary=True)
    bubbles = find_superbubbles_linear(ug)
    chains = build_chains(ug, bubbles)
    assert len(chains) == 7
    cfg = PhaseConfig(ploidy=2)
    seq = phase_all(ug, reads, aln, chains, cfg, batch=False)
    bat = phase_all(ug, reads, aln, chains, cfg, batch=True)
    for a, b in zip(seq, bat):
        assert _result_key(a) == _result_key(b)


def test_batched_recovers_rails():
    ug, reads, aln, planted = many_chains_fixture(5, n_bubbles=4)
    bubbles = find_superbubbles_linear(ug)
    chains = build_chains(ug, bubbles)
    res = phase_all(ug, reads, aln, chains, PhaseConfig(ploidy=2))
    # each chain's chosen arm tuples must equal its planted rails (either
    # orientation / labeling order)
    by_entrance = {r.chain.bubbles[0].entrance: r for r in res}
    for ci, rails in enumerate(planted):
        # locate this component's result by planted entrance anchor ids
        cands = [
            r for r in res
            if set(sum((list(p) for p in r.haplotype_paths), []))
            & set(rails[0])
        ]
        assert len(cands) == 1
        got = {tuple(nodes[1::2]) for nodes in cands[0].haplotype_paths}
        want = {tuple(r) for r in rails}
        rcm = {tuple(int(ug.rc[x]) for x in reversed(r)) for r in rails}
        assert got == want or got == rcm, (ci, got, want)


def test_batched_1000_chains_speedup_and_identity():
    """~1000 small chains: the VERDICT r3 #5 scale point.  Identity is a
    hard assert; the dispatch-count reduction is the mechanism (asserted),
    wall speedup is printed (machine-dependent, typically >2x on CPU)."""
    ug, reads, aln, planted = many_chains_fixture(1000, n_bubbles=2)
    bubbles = find_superbubbles_linear(ug)
    chains = build_chains(ug, bubbles)
    assert len(chains) == 1000
    cfg = PhaseConfig(ploidy=2)

    metrics.reset()
    t0 = time.time()
    seq = phase_all(ug, reads, aln, chains, cfg, batch=False)
    t_seq = time.time() - t0
    d_seq = metrics.report()["counters"]["phasing.score_dispatches"]
    metrics.reset()
    t0 = time.time()
    bat = phase_all(ug, reads, aln, chains, cfg, batch=True)
    t_bat = time.time() - t0
    d_bat = metrics.report()["counters"]["phasing.score_dispatches"]
    for a, b in zip(seq, bat):
        assert _result_key(a) == _result_key(b)
    print(
        f"\nphase_all 1000 chains: sequential {t_seq:.2f}s/{d_seq:.0f} "
        f"dispatches, batched {t_bat:.2f}s/{d_bat:.0f} dispatches, "
        f"speedup {t_seq / t_bat:.2f}x"
    )
    # the mechanism: 2000 per-bubble scorer dispatches collapse to a
    # handful of bucket dispatches (what matters on TPU, where each
    # dispatch pays ~5 ms tunnel RTT); CPU wall speedup is a side effect
    assert d_seq == 2000
    assert d_bat <= 20, d_bat
    assert t_bat < t_seq * 1.2
