"""Read set as flat tensors + oriented-read id arithmetic.

Reference data model (phasm/alignments.py :: Read, OrientedRead): reads are
objects and an oriented read is a (read, strand) wrapper; the string graph has
one node per orientation and reverse complement is an object-level operation.

TPU-native data model: a read set is a dense ``[N, Lpad] uint8`` code matrix
plus a length vector.  An *oriented read id* is the integer

    oid = 2 * read_id + orientation          (orientation: 0 = '+', 1 = '-')

so reverse complement is ``oid ^ 1``, read id is ``oid >> 1`` and orientation
is ``oid & 1`` — pure integer arithmetic that survives jit/vmap.  This
preserves the reference's dual-node string-graph semantics
(phasm/assembly_graph.py builds a node per OrientedRead) without objects.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

from phasm_tpu import dna


def orient_fwd(read_id: np.ndarray | int):
    return 2 * read_id


def orient_rev(read_id: np.ndarray | int):
    return 2 * read_id + 1


def rc_oid(oid: np.ndarray | int):
    """Reverse-complement an oriented read id (involution)."""
    return oid ^ 1


def oid_read(oid: np.ndarray | int):
    return oid >> 1


def oid_strand(oid: np.ndarray | int):
    return oid & 1


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass
class ReadSet:
    """Dense read-set container.

    codes    [N, Lpad] uint8 — base codes 0..3; positions >= lengths[i] are 0
             (kept at 0, not PAD, so the matrix stays 2-bit packable; use
             `lengths` as the validity mask).
    lengths  [N] int32
    names    list of N read names (host-side only; never enters jit).
    """

    codes: np.ndarray
    lengths: np.ndarray
    names: list[str]

    @classmethod
    def from_sequences(
        cls, seqs: Sequence[str], names: Sequence[str] | None = None, pad_multiple: int = 128
    ) -> "ReadSet":
        n = len(seqs)
        lengths = np.array([len(s) for s in seqs], dtype=np.int32)
        lpad = round_up(max(int(lengths.max()) if n else 1, 1), pad_multiple)
        codes = np.zeros((n, lpad), dtype=np.uint8)
        for i, s in enumerate(seqs):
            codes[i, : len(s)] = dna.encode(s)
        if names is None:
            names = [f"read_{i}" for i in range(n)]
        return cls(codes=codes, lengths=lengths, names=list(names))

    @property
    def n_reads(self) -> int:
        return self.codes.shape[0]

    @property
    def lpad(self) -> int:
        return self.codes.shape[1]

    def seq(self, read_id: int) -> np.ndarray:
        return self.codes[read_id, : self.lengths[read_id]]

    def oriented_seq(self, oid: int) -> np.ndarray:
        """Base codes of an oriented read (host-side convenience)."""
        s = self.seq(oid >> 1)
        return dna.revcomp(s) if (oid & 1) else s

    def oriented_str(self, oid: int) -> str:
        return dna.decode(self.oriented_seq(oid))

    def oriented_codes_matrix(self) -> np.ndarray:
        """[2N, Lpad] matrix of oriented reads, row oid = oriented codes.

        Forward rows alias the input; reverse rows are the reverse complement
        left-aligned (padding stays on the right).  This is the tensor the
        overlap kernels index with oriented ids directly.
        """
        n, lpad = self.codes.shape
        out = np.zeros((2 * n, lpad), dtype=np.uint8)
        out[0::2] = self.codes
        for i in range(n):
            li = int(self.lengths[i])
            out[2 * i + 1, :li] = 3 - self.codes[i, :li][::-1]
        return out

    def packed_2bit(self) -> np.ndarray:
        """[N, Lpad/4] 2-bit packed storage form (DAZZ_DB-style)."""
        lpad4 = round_up(self.lpad, 4)
        c = self.codes
        if lpad4 != self.lpad:
            c = np.pad(c, ((0, 0), (0, lpad4 - self.lpad)))
        return dna.pack_2bit(c)
