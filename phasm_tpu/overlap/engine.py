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
from phasm_tpu.overlap.extend import BIG
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
    # adaptive band: pairs whose first-pass error exceeds their measured
    # joint expectation (err > (e_a+e_b)*factor + margin), whose window
    # statistic does statistically, or that found no endpoint re-extend at
    # band_wide.  High-indel long reads drift off a 64-wide band (diagonal
    # random walk std ~sqrt(L*indel_rate)), inflating measured divergence
    # ~1.5-2x — which made same-locus arms look heterozygous and left
    # threshold-fragmentation bubbles in haploid assemblies (VERDICT r1 #4).
    # Only the suspect tail pays the 2x wider-band cost.
    band_wide: int = 128
    wide_retry_factor: float = 1.25
    wide_retry_margin: float = 0.02
    # NOTE: the windowed-divergence statistic (extend.WINDOW probe) is
    # MEASURED here and attached to every table row (AlignmentTable.win);
    # the policy that uses it (window filter, containment gating, arm
    # classification) lives in filter.FilterChain / graph.pop.


_MAX_BATCH = 16384  # pairs per device call (amortizes dispatch, bounds HBM)


def overlap_reads(
    reads: ReadSet, cfg: OverlapConfig | None = None, mesh=None
) -> AlignmentTable:
    """All-vs-all overlap detection.

    ``mesh``: optional jax.sharding.Mesh — extension batches run
    data-parallel over its "dp" axis with an all_gather merge; the returned
    table is bit-identical to the single-device run (tested on the virtual
    CPU mesh).  Seeding stays host-side; the candidate list is identical
    regardless of mesh.
    """
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

    extender = DeviceExtender(oriented, lengths, band=cfg.band, mesh=mesh)

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

    # materialize into per-candidate arrays (kernel frame)
    N = ka.shape[0]
    r_diffs = np.full(N, BIG, dtype=np.int64)
    r_as = np.zeros(N, dtype=np.int64)
    r_ae = np.zeros(N, dtype=np.int64)
    r_be = np.zeros(N, dtype=np.int64)
    r_win = np.zeros(N, dtype=np.int64)
    for sel, jmax, outs in pending:
        with metrics.stage(f"overlap.extend.j{jmax}", pairs=int(sel.sum())):
            parts = [extender.materialize(out, M) for out, M in outs]
        idx = np.nonzero(sel)[0]
        r_diffs[idx] = np.concatenate([p.diffs for p in parts])
        r_as[idx] = np.concatenate([p.a_start for p in parts])
        r_ae[idx] = np.concatenate([p.a_end for p in parts])
        r_be[idx] = np.concatenate([p.b_end for p in parts])
        r_win[idx] = np.concatenate([p.win_cost for p in parts])

    # adaptive band: re-extend the high-error tail at band_wide (see
    # OverlapConfig docstring).  The wide band explores a strict superset of
    # paths, so its result is always <= the narrow one; keep it.
    W2 = cfg.band_wide
    if W2 > cfg.band and N:
        from phasm_tpu.overlap.extend import WINDOW

        aln_len = np.maximum(np.maximum(r_ae - r_as, r_be), 1)
        # retry triggers are RELATIVE to the dataset's measured per-read
        # error (absolute thresholds retried essentially every pair on
        # high-error data, doubling overlap cost): a pair re-measures at
        # band_wide when its whole-overlap error exceeds its joint
        # expectation, or when any window does statistically — band
        # clipping from indel drift inflates exactly these, and downstream
        # policy (filter.window_excess_mask) keys on the window statistic,
        # so suspect pairs must be re-measured before being judged
        err1 = r_diffs / aln_len
        found1 = r_diffs < BIG
        per_read: dict[int, list] = {}
        for i in np.nonzero(found1)[0]:
            per_read.setdefault(int(ka[i]) >> 1, []).append(err1[i])
            per_read.setdefault(int(kb[i]) >> 1, []).append(err1[i])
        e_half = {r: float(np.median(v)) / 2 for r, v in per_read.items()}
        exp_pair = np.array(
            [
                e_half.get(int(ka[i]) >> 1, 0.0) + e_half.get(int(kb[i]) >> 1, 0.0)
                for i in range(N)
            ]
        )
        mu_w = exp_pair * WINDOW
        retry = (
            (r_diffs >= BIG)
            | (err1 > exp_pair * cfg.wide_retry_factor + cfg.wide_retry_margin)
            | (r_win > mu_w + np.maximum(6.0 * np.sqrt(mu_w), 12.0))
        )
        ridx = np.nonzero(retry)[0]
        metrics.incr("overlap.wide_band_retries", int(ridx.shape[0]))
        if ridx.shape[0]:
            need_w = (
                np.minimum(lb_k[ridx], la_k[ridx] - kd[ridx] + W2).astype(np.int64)
                + W2
            )
            max_need_w = int(min(need_w.max(), cfg.max_jmax))
            edges_w = [b for b in cfg.pallas_buckets if b < max_need_w]
            k = 2
            while k * cfg.seg < max_need_w:
                if k * cfg.seg > (edges_w[-1] if edges_w else 0):
                    edges_w.append(k * cfg.seg)
                k *= 2
            edges_w.append(
                ((max_need_w + cfg.seg - 1) // cfg.seg) * cfg.seg
                if max_need_w > cfg.pallas_buckets[0]
                else cfg.pallas_buckets[0]
            )
            edges_w = sorted(set(edges_w))
            pend_w = []
            prev = 0
            for bi, cap in enumerate(edges_w):
                sel = (
                    (need_w > prev) & (need_w <= cap)
                    if bi + 1 < len(edges_w)
                    else (need_w > prev)
                )
                prev = cap
                if not np.any(sel):
                    continue
                sub = ridx[sel]
                outs = []
                with metrics.stage(f"overlap.retry.j{cap}", pairs=sub.shape[0]):
                    for s0 in range(0, sub.shape[0], _MAX_BATCH):
                        chunk = sub[s0 : s0 + _MAX_BATCH]
                        outs.append(
                            extender.extend_async(
                                ka[chunk], kb[chunk], kd[chunk], cap, band=W2
                            )
                        )
                pend_w.append((sub, outs))
            for sub, outs in pend_w:
                parts = [extender.materialize(out, M) for out, M in outs]
                r_diffs[sub] = np.concatenate([p.diffs for p in parts])
                r_as[sub] = np.concatenate([p.a_start for p in parts])
                r_ae[sub] = np.concatenate([p.a_end for p in parts])
                r_be[sub] = np.concatenate([p.b_end for p in parts])
                r_win[sub] = np.concatenate([p.win_cost for p in parts])

    # map back to table convention (a forward, b oriented), filter, dedup
    a_start = np.where(swap, 0, r_as)
    a_end = np.where(swap, r_be, r_ae)
    b_start = np.where(swap, r_as, 0)
    b_end = np.where(swap, r_ae, r_be)
    ok = (
        (r_diffs < BIG)
        & ((a_end - a_start) >= cfg.min_overlap)
        & ((b_end - b_start) >= cfg.min_overlap)
        & (r_diffs <= cfg.max_diff_rate * np.maximum(b_end - b_start, 1))
    )

    if not np.any(ok):
        return AlignmentTable.empty()
    # the engine MEASURES; policy lives downstream.  Every surviving row
    # carries its windowed-divergence statistic (max edits forced in any
    # fully-interior WINDOW-column span) — filter.FilterChain uses it to
    # drop cross-haplotype dovetails from edge building and to gate
    # containment marking, and graph.pop uses it for same-locus arm
    # classification.  Rejecting window-suspect pairs HERE would starve
    # those consumers of exactly the evidence they need (a het arm is only
    # recognisable as het because some cross-arm pair shows window excess).
    m = np.stack(
        [a_id, b_id, st, a_start, a_end, b_start, b_end, r_diffs], axis=1
    )[ok].astype(np.int32)
    t = AlignmentTable(*(m[:, i] for i in range(8)), win=r_win[ok].astype(np.int32))
    return t.dedup()
