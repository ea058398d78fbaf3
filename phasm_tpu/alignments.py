"""Alignment table (struct-of-arrays) + vectorized overlap classification.

Reference: phasm/alignments.py :: LocalAlignment, AlignmentType, .classify()
(mount empty during survey — SURVEY.md §0 — so cited by symbol).  The
reference classifies one alignment object at a time in a Python loop (the
stage-1 hot loop, SURVEY.md §4.1); here the whole alignment set is a flat
int32 table and classification/filtering are single vectorized expressions
that run under jit or in numpy.

Coordinate convention
---------------------
* ``a`` is always the forward strand of read ``a_id``.
* ``strand`` is 0 if ``b`` is forward, 1 if reverse-complemented.
* ``b_start/b_end`` are coordinates on the *oriented* b (i.e. on revcomp(b)
  when strand == 1).  This matches how the overlap engine emits alignments
  and makes suffix/prefix logic orientation-free.

Classification (same decision tree as the reference / Algorithm 5 of the
minimap-miniasm lineage that PHASM follows):

  left_a  = a_start          right_a = a_len - a_end
  left_b  = b_start          right_b = b_len - b_end
  overhang = min(left_a, left_b) + min(right_a, right_b)

  overhang too large                          -> INTERNAL   (discarded)
  left_a <= left_b and right_a <= right_b     -> A_CONTAINED
  left_a >= left_b and right_a >= right_b     -> B_CONTAINED
  left_a >  left_b                            -> OVERLAP_AB (suffix a ~ prefix b)
  otherwise                                   -> OVERLAP_BA (suffix b ~ prefix a)
"""
from __future__ import annotations

import dataclasses
import enum

import numpy as np


class AlignmentType(enum.IntEnum):
    """Ref: phasm/alignments.py :: AlignmentType."""

    OVERLAP_AB = 0
    OVERLAP_BA = 1
    A_CONTAINED = 2
    B_CONTAINED = 3
    INTERNAL = 4  # improper overlap (too much overhang); dropped by filters


_FIELDS = ("a_id", "b_id", "strand", "a_start", "a_end", "b_start", "b_end", "diffs")


@dataclasses.dataclass
class AlignmentTable:
    """Flat alignment table; every field is an int32 array of equal length.

    Ref: phasm/alignments.py :: LocalAlignment (object-per-alignment in the
    reference; struct-of-arrays here so stage-1 runs as tensor ops).
    """

    a_id: np.ndarray
    b_id: np.ndarray
    strand: np.ndarray
    a_start: np.ndarray
    a_end: np.ndarray
    b_start: np.ndarray
    b_end: np.ndarray
    diffs: np.ndarray
    # optional windowed-divergence statistic (overlap/extend.py WINDOW probe):
    # max edits forced in any fully-interior 256-column span.  Unlike
    # whole-overlap error it cannot be DILUTED by long identical flanks, so
    # downstream policy (window filter, containment gating, same-locus arm
    # classification) keys on it.  None when the producer didn't measure it
    # (hand-built tables, legacy npz checkpoints).
    win: np.ndarray | None = None

    def __post_init__(self):
        for f in _FIELDS:
            setattr(self, f, np.asarray(getattr(self, f), dtype=np.int32))
        if self.win is not None:
            self.win = np.asarray(self.win, dtype=np.int32)
            assert self.win.shape == self.a_id.shape

    @classmethod
    def empty(cls) -> "AlignmentTable":
        z = np.zeros(0, dtype=np.int32)
        return cls(z, z, z, z, z, z, z, z, win=z)

    @classmethod
    def from_rows(cls, rows) -> "AlignmentTable":
        """rows: iterable of (a_id,b_id,strand,a_start,a_end,b_start,b_end,diffs)."""
        arr = np.array(list(rows), dtype=np.int32).reshape(-1, 8)
        return cls(*(arr[:, i] for i in range(8)))

    def __len__(self) -> int:
        return int(self.a_id.shape[0])

    def take(self, mask_or_idx: np.ndarray) -> "AlignmentTable":
        return AlignmentTable(
            *(getattr(self, f)[mask_or_idx] for f in _FIELDS),
            win=None if self.win is None else self.win[mask_or_idx],
        )

    def concat(self, other: "AlignmentTable") -> "AlignmentTable":
        win = None
        if self.win is not None and other.win is not None:
            win = np.concatenate([self.win, other.win])
        return AlignmentTable(
            *(np.concatenate([getattr(self, f), getattr(other, f)]) for f in _FIELDS),
            win=win,
        )

    def as_matrix(self) -> np.ndarray:
        return np.stack([getattr(self, f) for f in _FIELDS], axis=1)

    def canonical_sort(self) -> "AlignmentTable":
        """Deterministic order: lexicographic by all fields.

        Every merge/dedup in the framework sorts canonically first so results
        are identical regardless of shard layout (SURVEY.md §8.1 determinism
        discipline).  ``win`` participates as the least-significant key so
        rows identical in the 8 core fields still order deterministically.
        """
        keys = tuple(getattr(self, f) for f in reversed(_FIELDS))
        if self.win is not None:
            keys = (self.win,) + keys
        order = np.lexsort(keys)
        return self.take(order)

    def dedup(self) -> "AlignmentTable":
        t = self.canonical_sort()
        if len(t) == 0:
            return t
        m = t.as_matrix()
        keep = np.ones(len(t), dtype=bool)
        keep[1:] = np.any(m[1:] != m[:-1], axis=1)
        return t.take(keep)

    # --- derived quantities (vectorized) ---------------------------------

    def spans(self):
        return self.a_end - self.a_start, self.b_end - self.b_start

    def overlap_length(self) -> np.ndarray:
        """Ref: phasm/alignments.py :: LocalAlignment.overlap_length.

        Defined as the mean of the two aligned spans (they differ only by
        indels).
        """
        sa, sb = self.spans()
        return (sa + sb) // 2

    def overhangs(self, lengths: np.ndarray):
        """(left_a, right_a, left_b, right_b) unaligned flank lengths."""
        a_len = lengths[self.a_id]
        b_len = lengths[self.b_id]
        return self.a_start, a_len - self.a_end, self.b_start, b_len - self.b_end

    def classify(
        self,
        lengths: np.ndarray,
        max_overhang_abs: int = 1000,
        max_overhang_ratio: float = 0.8,
    ) -> np.ndarray:
        """Vectorized AlignmentType classification.

        Ref: phasm/alignments.py :: LocalAlignment.classify — identical
        decision tree, applied to the whole table at once.
        """
        la, ra, lb, rb = self.overhangs(lengths)
        overhang = np.minimum(la, lb) + np.minimum(ra, rb)
        sa, sb = self.spans()
        maplen = np.maximum(sa, sb)
        limit = np.minimum(max_overhang_abs, (max_overhang_ratio * maplen)).astype(
            np.int64
        )

        out = np.full(len(self), int(AlignmentType.INTERNAL), dtype=np.int32)
        proper = overhang <= limit
        a_cont = proper & (la <= lb) & (ra <= rb)
        b_cont = proper & ~a_cont & (la >= lb) & (ra >= rb)
        ab = proper & ~a_cont & ~b_cont & (la > lb)
        ba = proper & ~a_cont & ~b_cont & ~ab
        out[a_cont] = int(AlignmentType.A_CONTAINED)
        out[b_cont] = int(AlignmentType.B_CONTAINED)
        out[ab] = int(AlignmentType.OVERLAP_AB)
        out[ba] = int(AlignmentType.OVERLAP_BA)
        return out
