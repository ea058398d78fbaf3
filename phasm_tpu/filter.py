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


def contained_read_ids(t: AlignmentTable, types: np.ndarray, n_reads: int) -> np.ndarray:
    """Boolean [n_reads] — reads contained in some other read.

    Ref: phasm/filter.py :: ContainedReads (the reference tracks contained
    reads while streaming; we do it as one vectorized scatter).
    """
    contained = np.zeros(n_reads, dtype=bool)
    contained[t.a_id[types == int(AlignmentType.A_CONTAINED)]] = True
    contained[t.b_id[types == int(AlignmentType.B_CONTAINED)]] = True
    return contained


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

    def apply(self, t: AlignmentTable, lengths: np.ndarray):
        """Returns (filtered_table, types, contained_mask_over_reads)."""
        types = t.classify(
            lengths,
            max_overhang_abs=self.max_overhang_abs,
            max_overhang_ratio=self.max_overhang_ratio,
        )
        keep = np.ones(len(t), dtype=bool)
        for f in self.filters:
            keep &= f(t, lengths, types)
        contained = contained_read_ids(t, types, int(lengths.shape[0]))
        if self.drop_contained:
            keep &= ~contained[t.a_id] & ~contained[t.b_id]
        return t.take(keep), types[keep], contained


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
