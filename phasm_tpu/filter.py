"""Composable vectorized alignment filters (stage 1, `phasm filter`).

Reference: phasm/filter.py — filter *objects* applied per-alignment in a
Python loop (SURVEY.md §4.1 hot loop).  Here each filter is a callable
returning a boolean keep-mask over the whole :class:`AlignmentTable`; a
:class:`FilterChain` ANDs the masks in one pass.  Contained-read removal is
the one stateful filter (it needs a global pass to collect the contained-read
set first), exactly as in the reference.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from phasm_tpu.alignments import AlignmentTable, AlignmentType


@dataclasses.dataclass
class MinReadLength:
    """Drop alignments where either read is shorter than min_length.

    Ref: phasm/filter.py :: MinReadLength.
    """

    min_length: int

    def __call__(self, t: AlignmentTable, lengths: np.ndarray, types: np.ndarray):
        return (lengths[t.a_id] >= self.min_length) & (lengths[t.b_id] >= self.min_length)


@dataclasses.dataclass
class MinOverlapLength:
    """Ref: phasm/filter.py :: MinOverlapLength."""

    min_length: int

    def __call__(self, t: AlignmentTable, lengths: np.ndarray, types: np.ndarray):
        return t.overlap_length() >= self.min_length


@dataclasses.dataclass
class MaxErrorRate:
    """Drop alignments with diffs / overlap_length above the threshold."""

    max_rate: float

    def __call__(self, t: AlignmentTable, lengths: np.ndarray, types: np.ndarray):
        ovl = np.maximum(t.overlap_length(), 1)
        return t.diffs <= (self.max_rate * ovl)


@dataclasses.dataclass
class ProperOverlapsOnly:
    """Keep only OVERLAP_AB / OVERLAP_BA (drops INTERNAL and containments).

    Ref: phasm/filter.py :: MaxOverhang + contained handling; the overhang
    threshold itself is applied inside AlignmentTable.classify.
    """

    def __call__(self, t: AlignmentTable, lengths: np.ndarray, types: np.ndarray):
        return (types == int(AlignmentType.OVERLAP_AB)) | (
            types == int(AlignmentType.OVERLAP_BA)
        )


def contained_read_ids(
    t: AlignmentTable,
    types: np.ndarray,
    n_reads: int,
    valid: np.ndarray | None = None,
) -> np.ndarray:
    """Boolean [n_reads] — reads contained in some other read.

    Ref: phasm/filter.py :: ContainedReads (the reference tracks contained
    reads while streaming; we do it as one vectorized scatter).

    ``valid`` (optional row mask): only these rows may MARK containment —
    FilterChain passes ~window_excess so a cross-haplotype containment (the
    inner read carries divergent het sites) does not silently delete a het
    arm read from the graph.
    """
    contained = np.zeros(n_reads, dtype=bool)
    ok = np.ones(len(t), dtype=bool) if valid is None else valid
    contained[t.a_id[ok & (types == int(AlignmentType.A_CONTAINED))]] = True
    contained[t.b_id[ok & (types == int(AlignmentType.B_CONTAINED))]] = True
    return contained


def window_excess_mask(
    t: AlignmentTable,
    e_read: np.ndarray,
    z: float = 6.0,
    min_excess: float = 12.0,
) -> np.ndarray:
    """Rows whose windowed-divergence statistic exceeds the pair's Poisson
    expectation: evidence of a LOCAL divergence hotspot (cross-haplotype
    overlap) that whole-overlap error cannot see through flank dilution.

    Threshold: win > mu + max(z*sqrt(mu), min_excess), mu = (e_a+e_b)*WINDOW.
    An honest window's edit count is ~Poisson(mu); a linear-factor threshold
    sits a fixed ~3-4 sigma out and, across dozens of windows per pair x
    thousands of pairs, false positives are guaranteed — each one fabricates
    a parallel-path bubble out of same-locus reads (round-2 c3 phantom
    bubbles).  z=6 puts the honest tail at ~1e-6 per window while het
    hotspot windows sit 6-10 sigma out for every ladder error regime.

    Rows are never flagged when the producer did not measure win
    (``t.win is None`` — hand-built tables, legacy checkpoints).
    """
    from phasm_tpu.overlap.extend import WINDOW  # numpy-only module

    if t.win is None or len(t) == 0:
        return np.zeros(len(t), dtype=bool)
    mu = (e_read[t.a_id] + e_read[t.b_id]) * WINDOW
    thr = mu + np.maximum(z * np.sqrt(mu), min_excess)
    return t.win > thr


def corroborate_window_excess(t: AlignmentTable, excess: np.ndarray) -> np.ndarray:
    """Keep only window-excess rows CORROBORATED by an independent pair.

    A heterozygous hotspot is covered by many cross-haplotype read pairs, so
    its excess appears in several flagged pairs over DISJOINT read sets.  A
    single read's bad patch (dense-error cluster, the honest >6-sigma tail)
    flags only pairs sharing that read.  Row (a, b) survives iff some other
    flagged row (c, d) has {c,d} disjoint from {a,b} AND is at the same
    locus (c or d overlaps a or b somewhere in the table).  Empirically this
    removed every haploid-ladder false positive (4/44k rows, each at an
    isolated locus) while every hotspot keeps dozens of corroborating pairs.
    """
    idx = np.nonzero(excess)[0]
    if idx.shape[0] < 2:
        return np.zeros(len(t), dtype=bool)
    # read -> overlap partners (any table row: same-locus reads overlap)
    partners: dict[int, set[int]] = {}
    for a, b in zip(t.a_id.tolist(), t.b_id.tolist()):
        partners.setdefault(a, set()).add(b)
        partners.setdefault(b, set()).add(a)
    flagged = [(int(t.a_id[i]), int(t.b_id[i])) for i in idx]
    out = np.zeros(len(t), dtype=bool)
    for i, (a, b) in zip(idx, flagged):
        hood = partners.get(a, set()) | partners.get(b, set()) | {a, b}
        for c, d in flagged:
            if c in (a, b) or d in (a, b):
                continue
            if c in hood or d in hood:
                out[i] = True
                break
    return out


@dataclasses.dataclass
class FilterChain:
    """AND-composition of filters, applied in one pass + contained-read drop.

    Mirrors the reference stage-1 semantics (SURVEY.md §4.1):
      1. classify every alignment,
      2. apply per-alignment filters,
      3. collect contained reads (from the *pre-filter* classification, as
         the reference does: containment info is used even if the alignment
         itself is then dropped),
      4. drop alignments touching contained reads.
    """

    filters: list
    max_overhang_abs: int = 1000
    max_overhang_ratio: float = 0.8
    drop_contained: bool = True
    # windowed-divergence policy (requires AlignmentTable.win; see
    # window_excess_mask).  Window-excess rows are (a) dropped from edge
    # building — a cross-haplotype dovetail braids het arms into one blob —
    # and (b) barred from MARKING containment — a cross-haplotype
    # containment would silently delete the het read it covers.  The rows
    # themselves stay in the caller's full table (phasing evidence and arm
    # classification need them).
    window_filter: bool = True
    window_z: float = 6.0
    window_min_excess: float = 12.0
    # post_filters see only the SURVIVING table (e.g. RelativeBestEnd must
    # compute its per-end best over edges that actually reach the graph —
    # rescuing an edge to a contained read starves the end instead)
    post_filters: list = dataclasses.field(default_factory=list)

    def apply(self, t: AlignmentTable, lengths: np.ndarray):
        """Returns (filtered_table, types, contained_mask_over_reads)."""
        from phasm_tpu import metrics

        types = t.classify(
            lengths,
            max_overhang_abs=self.max_overhang_abs,
            max_overhang_ratio=self.max_overhang_ratio,
        )
        keep = np.ones(len(t), dtype=bool)
        for f in self.filters:
            keep &= f(t, lengths, types)
        if self.window_filter and t.win is not None and len(t):
            e_read = estimate_read_errors(t, int(lengths.shape[0]))
            excess = window_excess_mask(
                t, e_read, z=self.window_z, min_excess=self.window_min_excess
            )
            # corroboration: only excess confirmed by an independent pair at
            # the same locus acts as policy — a single read's dense-error
            # cluster (the honest tail) must not fabricate a bubble
            excess = corroborate_window_excess(t, excess)
            metrics.incr("filter.window_rejected", int((keep & excess).sum()))
            keep &= ~excess
            contained = contained_read_ids(
                t, types, int(lengths.shape[0]), valid=~excess
            )
        else:
            contained = contained_read_ids(t, types, int(lengths.shape[0]))
        if self.drop_contained:
            keep &= ~contained[t.a_id] & ~contained[t.b_id]
        ft, ftypes = t.take(keep), types[keep]
        for f in self.post_filters:
            keep2 = f(ft, lengths, ftypes)
            ft, ftypes = ft.take(keep2), ftypes[keep2]
        return ft, ftypes, contained


def estimate_read_errors(t: AlignmentTable, n_reads: int) -> np.ndarray:
    """Per-read intrinsic error: half the read's MEDIAN per-overlap divergence
    (most partners are same-haplotype, so the median tracks sequencing error,
    not haplotype distance)."""
    err = t.diffs / np.maximum(t.overlap_length(), 1)
    per_read: list[list[float]] = [[] for _ in range(n_reads)]
    for a, b, e in zip(t.a_id.tolist(), t.b_id.tolist(), err.tolist()):
        per_read[a].append(e)
        per_read[b].append(e)
    return np.array(
        [np.median(x) / 2 if x else 0.0 for x in per_read], dtype=np.float64
    )


@dataclasses.dataclass
class RelativeBestEnd:
    """Best-overlap-style relative edge selection per read end.

    Ref concept: Celera/bogart "best overlap graph" (no direct counterpart
    in phasm, which keeps every passing overlap).  For every read END
    (read x physical end), find the lowest-divergence proper dovetail using
    that end; an overlap survives only if, at BOTH of its ends,

        err <= end_best + margin_abs + margin_rel * end_best.

    Each end's best edge always survives, so graph connectivity is
    preserved.  This kills the arm-chimerism poison the global threshold
    cannot: a cross-haplotype overlap clipping 30% of a divergence hotspot
    measures ~0.10 vs same-haplotype ~0.078 — under a 0.12 cap it passes,
    but it is never the best edge at either end (measured on the diploid
    purity fixture: 1321 -> 84 surviving hotspot-spanning cross-hap edges,
    while every read end keeps its best same-hap edge).
    """

    margin_abs: float = 0.01
    margin_rel: float = 0.15

    def __call__(self, t: AlignmentTable, lengths: np.ndarray, types: np.ndarray):
        n = len(t)
        if n == 0:
            return np.ones(0, dtype=bool)
        is_ab = types == int(AlignmentType.OVERLAP_AB)
        is_ba = types == int(AlignmentType.OVERLAP_BA)
        proper = is_ab | is_ba
        err = t.diffs / np.maximum(t.overlap_length(), 1)
        # physical end used on each side: AB = suffix of a (end 1) with the
        # ORIENTED prefix of b (physical end st); BA mirrors it
        a_end = np.where(is_ab, 1, 0)
        b_end = np.where(is_ab, t.strand, 1 - t.strand)
        ka = t.a_id.astype(np.int64) * 2 + a_end
        kb = t.b_id.astype(np.int64) * 2 + b_end
        best = np.full(2 * int(lengths.shape[0]), np.inf)
        pi = np.nonzero(proper)[0]
        np.minimum.at(best, ka[pi], err[pi])
        np.minimum.at(best, kb[pi], err[pi])
        thr_a = best[ka] + self.margin_abs + self.margin_rel * best[ka]
        thr_b = best[kb] + self.margin_abs + self.margin_rel * best[kb]
        keep = (err <= thr_a) & (err <= thr_b)
        # rescue clause: every end's BEST edge survives unconditionally —
        # without it, an edge best at end A but over-threshold at end B is
        # dropped and A dead-ends (measured: fragments the diploid fixture
        # into tips).  Deterministic argmin: first minimal-err edge per end.
        is_best_a = err <= best[ka]
        is_best_b = err <= best[kb]
        first_a = np.zeros(n, dtype=bool)
        first_b = np.zeros(n, dtype=bool)
        seen_a: dict = {}
        seen_b: dict = {}
        for i in pi.tolist():
            if is_best_a[i] and seen_a.setdefault(int(ka[i]), i) == i:
                first_a[i] = True
            if is_best_b[i] and seen_b.setdefault(int(kb[i]), i) == i:
                first_b[i] = True
        keep |= first_a | first_b
        return keep | ~proper  # only proper dovetails are judged here


@dataclasses.dataclass
class AdaptiveErrorRate:
    """Per-pair adaptive divergence filter (haplotype-separation booster).

    Each read's intrinsic error is estimated as half its MEDIAN per-overlap
    divergence (most partners are same-haplotype, so the median tracks the
    sequencing error, not the haplotype distance).  An alignment is kept only
    if its divergence is within `factor` x the pair's expected joint error
    (+ margin).  Cross-haplotype overlaps clipping a divergence hotspot
    exceed their pair's expectation even when globally acceptable, which is
    exactly the arm-chimerism mechanism — no reference counterpart (the
    reference uses only global thresholds); measured to raise haplotig
    allele purity from ~0.6 to 0.75-1.0 on the noisy diploid config.
    """

    factor: float = 1.25
    margin: float = 0.01

    def __call__(self, t: AlignmentTable, lengths: np.ndarray, types: np.ndarray):
        if len(t) == 0:
            return np.ones(0, dtype=bool)
        err = t.diffs / np.maximum(t.overlap_length(), 1)
        e_read = estimate_read_errors(t, int(lengths.shape[0]))
        expected = e_read[t.a_id] + e_read[t.b_id]
        return err <= expected * self.factor + self.margin
