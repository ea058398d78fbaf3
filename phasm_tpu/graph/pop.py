"""Error-bubble popping on the string graph.

North-star graph cleaning is "transitive-reduction, tip/bubble
simplification" (BASELINE.json); the reference keeps heterozygous bubbles
(they carry phasing signal) but sequencing-error artifacts also appear as
bubbles whose weak arm has near-zero read support.  This pass pops only
those:

  a superbubble arm is popped when its read support is <= max_weak_reads
  AND the strongest sibling arm has >= dominance x that support.

Heterozygous arms have balanced coverage (support ratio ~1) and are never
touched; haploid error bubbles (1-2 reads vs full depth) are. Removal
deletes the weak arm's reads (both orientations), like tip clipping;
iterate with tip removal to a fixpoint before unitig merging.
"""
from __future__ import annotations

import numpy as np

from phasm_tpu.graph.structure import StringGraph


def _adj(g: StringGraph):
    succ: dict[int, list[int]] = {}
    pred: dict[int, list[int]] = {}
    for s, d in zip(g.src.tolist(), g.dst.tolist()):
        succ.setdefault(int(s), []).append(int(d))
        pred.setdefault(int(d), []).append(int(s))
    return succ, pred


def _arm_paths(succ, interior, s, t, cap=16):
    """Simple s->t paths through interior (node-id lists, excl. anchors)."""
    out = []
    stack = [(s, ())]
    while stack and len(out) < cap:
        v, path = stack.pop()
        for c in sorted(succ.get(v, []), reverse=True):
            if c == t:
                out.append(path)
            elif c in interior and c not in path:
                stack.append((c, path + (c,)))
    return sorted(out)


def pop_error_bubbles(
    g: StringGraph,
    max_weak_reads: int = 2,
    dominance: float = 5.0,
    max_rounds: int = 8,
    aln=None,
    e_read=None,
    factor: float = 1.25,
    margin: float = 0.01,
    veto_z: float = 3.5,
    veto_min_excess: float = 8.0,
) -> tuple[StringGraph, np.ndarray]:
    """Iteratively pop spurious bubble arms.  Two rules:

    1. support: weak arm has <= max_weak_reads reads AND the strongest arm
       has >= dominance x that (error bubbles in deep haploid regions);
    2. similarity (when `aln` + per-read error estimates given): two arms
       whose reads align to each other WITHIN their pair error expectation
       (err <= (e_a + e_b)*factor + margin, the AdaptiveErrorRate rule) are
       the same locus split by a filter threshold ("threshold-fragmentation"
       bubbles); the weaker arm is popped.  Heterozygous arms diverge beyond
       their pair expectation, so they are untouched for ANY config — a
       fixed global pop threshold cannot make that guarantee (it regressed
       the ladder's diploid rungs).

    Returns (graph, removed_reads_mask).
    """
    from phasm_tpu.bubbles import superbubble_from  # deferred: avoids cycle

    # read-pair -> min alignment error (for the similarity rule) + the set
    # of GLOBALLY CORROBORATED window-excess pairs (for the veto rule).
    # Corroboration is computed ONCE over the full table with the filter's
    # own statistic: a flagged row only counts when another flagged row at
    # the same locus involves disjoint reads (filter.corroborate_window_
    # excess).  A het boundary is covered by many independent cross-
    # haplotype pairs, so its vetoes survive even when THIS bubble's arms
    # hold a single read each; a lone read's dense-error cluster — the
    # honest >6-sigma Poisson tail — flags only its own pairs at an
    # isolated locus and is discarded (it fabricated phantom het arms on
    # the haploid ladder rung).
    pair_err: dict[tuple[int, int], float] = {}
    pair_veto: set[tuple[int, int]] = set()
    if aln is not None and e_read is not None and len(aln):
        from phasm_tpu.filter import (  # numpy-only module
            corroborate_window_excess,
            window_excess_mask,
        )

        errs = aln.diffs / np.maximum(aln.overlap_length(), 1)
        for a, b, e in zip(aln.a_id.tolist(), aln.b_id.tolist(), errs.tolist()):
            k = (a, b) if a < b else (b, a)
            if e < pair_err.get(k, np.inf):
                pair_err[k] = e
        # veto at the MARGINAL threshold (veto_z, matching the zipper/dirty
        # machinery), not the 6-sigma REJECT threshold: cross-haplotype arm
        # pairs at dense-het loci sit 1-2 edits UNDER the filter cut (that is
        # why they survived into the graph) but far above veto_z — flagging
        # only >= 6 sigma let the same-locus rule pop real het arms, merging
        # both haplotypes' reads into mixed unitigs (round-2 60 kb fixture).
        # Corroboration still gates the veto, so a lone read's dense-error
        # cluster cannot fabricate het arms on haploid data.
        excess = window_excess_mask(
            aln, e_read, z=veto_z, min_excess=veto_min_excess
        )
        corr = corroborate_window_excess(aln, excess)
        for i in np.nonzero(corr)[0]:
            a, b = int(aln.a_id[i]), int(aln.b_id[i])
            pair_veto.add((a, b) if a < b else (b, a))

    def arms_same_locus(reads1: set[int], reads2: set[int]) -> bool:
        """Same-locus iff >= 1 cross-arm pair aligns within its joint error
        expectation AND no corroborated windowed-divergence excess exists
        between the arms.

        The veto clause is what protects het arms: a cross-haplotype arm
        pair always contains SOME read pair whose overlap spans divergent
        sites (arm membership requires covering them), and that pair's
        window statistic blows its Poisson expectation even when its
        whole-overlap error is diluted by identical flanks.  Requires the
        caller to pass the FULL alignment table (window-suspect rows
        included) — the engine annotates rather than rejects for exactly
        this reason.
        """
        if not pair_err:
            return False
        # coverage-depth qualifier (VERDICT r1 #4): the het-protection veto
        # only applies when BOTH arms carry >= 2 reads.  A real het arm at
        # any usable coverage has several same-haplotype reads; a 1-read
        # "arm" is an error-burst artifact, and at the marginal veto
        # threshold (veto_z ~3.5 sigma) two independent bursty reads at one
        # locus otherwise corroborate each other into a phantom het bubble
        # (observed: haploid 25 kb fixture phased its error bubbles).
        het_protect = min(len(reads1), len(reads2)) >= 2
        support = False
        for r1 in reads1:
            for r2 in reads2:
                k = (r1, r2) if r1 < r2 else (r2, r1)
                if het_protect and k in pair_veto:
                    return False  # corroborated divergence: genuinely het
                e = pair_err.get(k, np.inf)
                if e <= (e_read[r1] + e_read[r2]) * factor + margin:
                    support = True
        return support

    removed = np.zeros(g.n_nodes // 2, dtype=bool)
    for _ in range(max_rounds):
        succ, pred = _adj(g)
        dead_reads: set[int] = set()
        for s in sorted(succ):
            if len(succ.get(s, [])) < 2:
                continue
            b = superbubble_from(succ, pred, s)
            if b is None or not b.interior:
                continue
            paths = _arm_paths(succ, b.interior, b.entrance, b.exit)
            if len(paths) < 2:
                continue
            arm_reads = [{n >> 1 for n in p} for p in paths]
            supports = [len(rr) for rr in arm_reads]
            strongest = max(supports)
            for pi, (p, sup) in enumerate(zip(paths, supports)):
                if not p:
                    continue  # direct edge: nothing to remove
                if sup <= max_weak_reads and strongest >= dominance * sup:
                    dead_reads.update(n >> 1 for n in p)
                    continue
                # similarity rule: weaker arm vs any stronger same-locus arm
                for pj in range(len(paths)):
                    if pj == pi or not paths[pj]:
                        continue
                    stronger = (supports[pj], -min(arm_reads[pj], default=0)) > (
                        sup, -min(arm_reads[pi], default=0)
                    )
                    if stronger and arms_same_locus(arm_reads[pi], arm_reads[pj]):
                        dead_reads.update(n >> 1 for n in p)
                        break
        if not dead_reads:
            break
        mask = np.zeros(g.n_nodes // 2, dtype=bool)
        mask[sorted(dead_reads)] = True
        removed |= mask
        keep = ~(mask[g.src >> 1] | mask[g.dst >> 1])
        g = g.take_edges(keep)
    return g, removed


def cut_dirty_chords(
    g: StringGraph, dirty: np.ndarray
) -> tuple[StringGraph, int]:
    """Cut marginal (dirty) edges that have clean connectivity alternatives.

    Runs AFTER the vetoed transitive reduction (transitive.reduce_mask_np):
    the veto keeps clean parallel arms alive, but the marginal cross-hap
    "zipper" edges themselves survive as CHORDS inside the het bubble —
    they explode the bubble's simple-path count (path enumeration truncates
    and can lose a pure haplotype path) and feed mixed paths to the phaser.

    Cut rule (vectorized): dirty edge (u, v) is cut iff u keeps a CLEAN
    out-edge to some w != v AND v keeps a CLEAN in-edge from some w' != u —
    i.e. removal never disconnects either endpoint from the clean backbone.
    A het arm reachable ONLY through a marginal edge keeps it (connectivity
    dominates).  By edge symmetry the rc-dual chord satisfies the mirrored
    condition, so cuts stay symmetric.

    Reference: no counterpart — phasm/filter.py is row-at-a-time; this is
    graph-level arbitration demanded by the bit-identical north star on
    clustered-het data (BASELINE.md).
    """
    from phasm_tpu import metrics

    if g.n_edges == 0 or not dirty.any():
        return g, 0
    clean = ~dirty
    # clean out-degree per src / clean in-degree per dst (dirty edge's own
    # endpoints: (u,v) itself is dirty, so it never counts toward them)
    clean_out = np.bincount(g.src[clean], minlength=g.n_nodes)
    clean_in = np.bincount(g.dst[clean], minlength=g.n_nodes)
    cut = dirty & (clean_out[g.src] > 0) & (clean_in[g.dst] > 0)
    n_cut = int(cut.sum())
    if n_cut:
        metrics.incr("graph.dirty_chords_cut", n_cut)
    return g.take_edges(~cut), n_cut


def cut_zipper_edges(
    ug, aln, e_read: np.ndarray, n_reads: int,
    z_min: float = 3.0, z_pool: float = 5.0,
):
    """Cut heterozygous "zipper" junctions between unitigs.

    Failure mode (round-2 purity diagnosis on the dense-het config): a
    cross-haplotype overlap whose worst window sits 1-2 edits UNDER the
    per-row 6-sigma threshold survives filtering, becomes a string-graph
    edge, and transitive reduction then ELIMINATES the true same-haplotype
    continuation it implies — the two haplotypes' arms end up concatenated
    in SERIES (u_h0 -> u_h1) and every bubble path carries both, a phase
    swap no phaser can fix.

    Per-row statistics cannot separate these (SNR ~6 sigma by
    construction), but the UNITIG-level pool can: a zipper junction is
    crossed by SEVERAL cross-haplotype member pairs, each ~6 sigma, so the
    pooled excess sum((win - mu)) / sqrt(sum(mu)) sits at ~10-12 sigma,
    while a legitimate anchor->arm junction always has clean same-hap
    supporting pairs (min-z low).  Cut edge (u, v) iff over the alignment
    rows between u's and v's member reads:
      * every row's standardized excess >= z_min (no clean supporter),
      * the pooled excess >= z_pool,
      * >= 2 rows with DISJOINT read pairs corroborate (a single read's
        dense-error patch flags only rows sharing that read).
    The rc-dual edge is cut symmetrically.

    Reference: no counterpart — phasm's filter stage (phasm/filter.py) is
    row-at-a-time; this is a graph-level arbitration required by the
    bit-identical-output north star on clustered-het data.
    """
    from phasm_tpu import metrics
    from phasm_tpu.overlap.extend import WINDOW

    if getattr(aln, "win", None) is None or ug.n_edges == 0 or len(aln) == 0:
        return ug, 0

    o2u = ug.read_to_unitig(n_reads)
    pair_u = np.full(n_reads, -1, dtype=np.int64)
    for r in range(n_reads):
        u = o2u[2 * r]
        if u < 0:
            u = o2u[2 * r + 1]
        if u >= 0:
            pair_u[r] = min(int(u), int(ug.rc[u]))

    # bucket rows by the unordered canonical unitig pair they connect
    mu = (e_read[aln.a_id] + e_read[aln.b_id]) * WINDOW
    z = (aln.win - mu) / np.sqrt(np.maximum(mu, 1e-6))
    ua = pair_u[aln.a_id]
    ub = pair_u[aln.b_id]
    rows: dict = {}
    ok = (ua >= 0) & (ub >= 0) & (ua != ub)
    for i in np.nonzero(ok)[0]:
        key = (min(int(ua[i]), int(ub[i])), max(int(ua[i]), int(ub[i])))
        rows.setdefault(key, []).append(i)

    cut = np.zeros(ug.n_edges, dtype=bool)
    for ei in range(ug.n_edges):
        u, v = int(ug.src[ei]), int(ug.dst[ei])
        key = (min(min(u, int(ug.rc[u])), min(v, int(ug.rc[v]))),
               max(min(u, int(ug.rc[u])), min(v, int(ug.rc[v]))))
        idx = rows.get(key)
        if not idx or len(idx) < 2:
            continue
        zz = z[idx]
        if zz.min() < z_min:
            continue
        pooled = float((aln.win[idx] - mu[idx]).sum()) / max(
            float(np.sqrt(mu[idx].sum())), 1e-6
        )
        if pooled < z_pool:
            continue
        # disjoint-pair corroboration
        pairs = [(int(aln.a_id[i]), int(aln.b_id[i])) for i in idx]
        corrob = any(
            not ({a1, b1} & {a2, b2})
            for k1, (a1, b1) in enumerate(pairs)
            for a2, b2 in pairs[k1 + 1:]
        )
        if not corrob:
            continue
        cut[ei] = True

    if not cut.any():
        return ug, 0
    # symmetric cut: edge (u, v) and its dual (rc[v], rc[u])
    dual_key = {(int(ug.src[e]), int(ug.dst[e])): e for e in range(ug.n_edges)}
    for ei in np.nonzero(cut)[0]:
        d = dual_key.get((int(ug.rc[ug.dst[ei]]), int(ug.rc[ug.src[ei]])))
        if d is not None:
            cut[d] = True
    n_cut = int(cut.sum())
    metrics.incr("graph.zipper_edges_cut", n_cut)
    keep = ~cut
    import dataclasses as _dc

    return _dc.replace(
        ug, src=ug.src[keep], dst=ug.dst[keep],
        elen=ug.elen[keep], ovl=ug.ovl[keep],
    ), n_cut
