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
from phasm_tpu.overlap.extend import BIG, ExtendResult
from phasm_tpu.reads import ReadSet


@dataclasses.dataclass
class OverlapConfig:
    seed: seeding.SeedConfig = dataclasses.field(default_factory=seeding.SeedConfig)
    band: int = 64
    min_overlap: int = 500
    max_diff_rate: float = 0.45  # drop plainly failed extensions
    pallas_buckets: tuple = (1024, 4096)  # short-pair buckets
    seg: int = 4096  # segment size for longer pairs (segmented kernel)
    max_jmax: int = 131072  # hard cap on overlap length
    backend: str = "auto"  # auto | pallas | jnp


_MAX_BATCH = 16384  # pairs per device call (amortizes dispatch, bounds HBM)


def overlap_reads(reads: ReadSet, cfg: OverlapConfig | None = None) -> AlignmentTable:
    """All-vs-all overlap detection."""
    cfg = cfg or OverlapConfig()
    backend = cfg.backend
    if backend == "auto":
        import jax

        backend = "pallas" if jax.default_backend() == "tpu" else "jnp"

    from phasm_tpu import metrics

    lengths = reads.lengths.astype(np.int32)
    with metrics.stage("overlap.seed", reads=reads.n_reads):
        seeds = seeding.extract_minimizers(reads.codes, lengths, cfg.seed)
        cands = seeding.match_seeds(seeds, lengths, cfg.seed)
    metrics.incr("overlap.candidates", len(cands))
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

    from phasm_tpu.overlap.extend import DeviceExtender

    extender = DeviceExtender(oriented, lengths, band=cfg.band)

    rows = []
    # bucket edges: the short fixed buckets, then segment multiples up to the
    # LARGEST actually-needed column count (capped) — avoids burning columns
    # (and a kernel compile) on lengths no pair needs
    max_need = int(min(need.max(), cfg.max_jmax)) if need.shape[0] else 0
    edges = [b for b in cfg.pallas_buckets if b < max_need]
    k = 2
    while k * cfg.seg < max_need:
        if k * cfg.seg > (edges[-1] if edges else 0):
            edges.append(k * cfg.seg)
        k *= 2
    edges.append(((max_need + cfg.seg - 1) // cfg.seg) * cfg.seg if max_need > cfg.pallas_buckets[0] else cfg.pallas_buckets[0])
    edges = sorted(set(edges))

    # two-phase: dispatch every chunk of every bucket (results stay on
    # device), then materialize — overlaps device compute with the tunnel
    # round-trips instead of syncing per chunk
    pending = []  # (sel_mask, jmax, [(device_out, M), ...])
    prev = 0
    for bi, cap in enumerate(edges):
        sel = (need > prev) & (need <= cap) if bi + 1 < len(edges) else (need > prev)
        prev = cap
        if not np.any(sel):
            continue
        jmax = cap
        outs = []
        sel_idx = np.nonzero(sel)[0]
        with metrics.stage(f"overlap.dispatch.j{jmax}", pairs=sel_idx.shape[0]):
            for s0 in range(0, sel_idx.shape[0], _MAX_BATCH):
                chunk = sel_idx[s0 : s0 + _MAX_BATCH]
                outs.append(
                    extender.extend_async(ka[chunk], kb[chunk], kd[chunk], jmax)
                )
        pending.append((sel, jmax, outs))

    for sel, jmax, outs in pending:
        with metrics.stage(f"overlap.extend.j{jmax}", pairs=int(sel.sum())):
            parts = [extender.materialize(out, M) for out, M in outs]
        res = ExtendResult(
            a_start=np.concatenate([p.a_start for p in parts]),
            a_end=np.concatenate([p.a_end for p in parts]),
            b_start=np.concatenate([p.b_start for p in parts]),
            b_end=np.concatenate([p.b_end for p in parts]),
            diffs=np.concatenate([p.diffs for p in parts]),
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
