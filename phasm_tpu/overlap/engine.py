"""Overlap engine: ReadSet -> AlignmentTable (replaces DAZZ_DB+DALIGNER).

Stages (SURVEY.md §3.2 "TPU-build equivalent" column):
  1. minimizer seeding + sort-merge matching (seeding.py)
  2. candidate normalization: orient each pair so the seed diagonal is >= 0
     (suffix-of-a ~ prefix-of-b frame), bucket by needed DP columns
  3. batched banded extension — Pallas kernel on TPU, jnp scan elsewhere
  4. map kernel coordinates back to the AlignmentTable convention
     (a_id < b_id, a forward, b oriented, b-coords on the oriented strand)
"""
from __future__ import annotations

import dataclasses

import numpy as np

from phasm_tpu.alignments import AlignmentTable
from phasm_tpu.overlap import seeding
from phasm_tpu.overlap.extend import banded_overlap_batch, banded_overlap_pallas, BIG
from phasm_tpu.reads import ReadSet


@dataclasses.dataclass
class OverlapConfig:
    seed: seeding.SeedConfig = dataclasses.field(default_factory=seeding.SeedConfig)
    band: int = 64
    min_overlap: int = 500
    max_diff_rate: float = 0.45  # drop plainly failed extensions
    pallas_buckets: tuple = (1024, 4096)  # jmax buckets for the TPU kernel
    max_jmax: int = 32768  # jnp fallback cap for very long overlaps
    backend: str = "auto"  # auto | pallas | jnp


def _extend(backend, oriented, lengths, a_oid, b_oid, d0, band, jmax):
    if backend == "pallas":
        return banded_overlap_pallas(
            oriented, lengths, a_oid, b_oid, d0, band=band, jmax=jmax
        )
    return banded_overlap_batch(
        oriented, lengths, a_oid, b_oid, d0, band=band, jmax=jmax
    )


def overlap_reads(reads: ReadSet, cfg: OverlapConfig | None = None) -> AlignmentTable:
    """All-vs-all overlap detection."""
    cfg = cfg or OverlapConfig()
    backend = cfg.backend
    if backend == "auto":
        import jax

        backend = "pallas" if jax.default_backend() == "tpu" else "jnp"

    lengths = reads.lengths.astype(np.int32)
    seeds = seeding.extract_minimizers(reads.codes, lengths, cfg.seed)
    cands = seeding.match_seeds(seeds, lengths, cfg.seed)
    if len(cands) == 0:
        return AlignmentTable.empty()

    oriented = reads.oriented_codes_matrix()

    # normalize: kernel frame is (A = earlier read, B = later read) with
    # diagonal >= 0.  table a is the smaller read id, FORWARD; oriented b
    # carries the strand.  when the seed diagonal is negative, the roles in
    # the KERNEL swap (suffix of oriented-b overlaps prefix of a).
    a_id = cands.a_id.astype(np.int64)
    b_id = cands.b_id.astype(np.int64)
    st = cands.strand.astype(np.int64)
    d = cands.diag.astype(np.int64)

    oid_a = 2 * a_id  # a always forward
    oid_b = 2 * b_id + st
    swap = d < 0
    ka = np.where(swap, oid_b, oid_a)  # kernel A-side oriented id
    kb = np.where(swap, oid_a, oid_b)
    kd = np.where(swap, -d, d).astype(np.int32)

    la_k = lengths[ka >> 1]
    lb_k = lengths[kb >> 1]
    # columns needed: alignment can span to the end of B or A
    need = np.minimum(lb_k, la_k - kd + cfg.band).astype(np.int64) + cfg.band

    rows = []
    buckets = list(cfg.pallas_buckets)  # jnp path buckets identically
    edges = buckets + [cfg.max_jmax]
    prev = 0
    for bi, cap in enumerate(edges):
        sel = (need > prev) & (need <= cap)
        prev = cap
        if not np.any(sel):
            continue
        use_backend = backend if (backend != "pallas" or cap in buckets) else "jnp"
        jmax = cap
        res = _extend(
            use_backend, oriented, lengths,
            ka[sel], kb[sel], kd[sel], cfg.band, jmax,
        )
        # map back to table convention
        sw = swap[sel]
        a_start = np.where(sw, 0, res.a_start)
        a_end = np.where(sw, res.b_end, res.a_end)
        b_start = np.where(sw, res.a_start, 0)
        b_end = np.where(sw, res.a_end, res.b_end)
        ok = (
            (res.diffs < BIG)
            & ((a_end - a_start) >= cfg.min_overlap)
            & ((b_end - b_start) >= cfg.min_overlap)
            & (res.diffs <= cfg.max_diff_rate * np.maximum(b_end - b_start, 1))
        )
        m = np.stack(
            [
                a_id[sel], b_id[sel], st[sel],
                a_start, a_end, b_start, b_end, res.diffs,
            ],
            axis=1,
        )[ok]
        rows.append(m)

    if not rows:
        return AlignmentTable.empty()
    m = np.concatenate(rows, axis=0).astype(np.int32)
    t = AlignmentTable(*(m[:, i] for i in range(8)))
    return t.dedup()
