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
        excess = window_excess_mask(aln, e_read)
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
        support = False
        for r1 in reads1:
            for r2 in reads2:
                k = (r1, r2) if r1 < r2 else (r2, r1)
                if k in pair_veto:
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
