"""FASTA read/write (ref: phasm/io/sequences.py — FASTA reader/writer helpers)."""
from __future__ import annotations

import gzip
from typing import Iterable, Iterator, TextIO

from phasm_tpu.reads import ReadSet


def _open(path: str, mode: str) -> TextIO:
    if path.endswith(".gz"):
        return gzip.open(path, mode + "t")
    return open(path, mode)


def iter_fasta(path: str) -> Iterator[tuple[str, str]]:
    """Yield (name, sequence) pairs."""
    name, chunks = None, []
    with _open(path, "r") as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if name is not None:
                    yield name, "".join(chunks)
                name = line[1:].split()[0]
                chunks = []
            else:
                chunks.append(line)
        if name is not None:
            yield name, "".join(chunks)


def read_fasta(path: str) -> ReadSet:
    names, seqs = [], []
    for n, s in iter_fasta(path):
        names.append(n)
        seqs.append(s.upper())
    return ReadSet.from_sequences(seqs, names=names)


def write_fasta(path: str, records: Iterable[tuple[str, str]], width: int = 80) -> None:
    with _open(path, "w") as fh:
        for name, seq in records:
            fh.write(f">{name}\n")
            for i in range(0, len(seq), width):
                fh.write(seq[i : i + width] + "\n")
