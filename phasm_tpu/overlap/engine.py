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
    backend: str = "auto"  # auto | pallas | jnp | myers (bit-vector DP)
    # adaptive band ESCALATION: pairs whose first-pass error exceeds their
    # measured joint expectation (err > (e_a+e_b)*factor + margin), whose
    # window statistic does statistically, or that found no endpoint,
    # re-extend at each wider band in turn until no trigger fires.  The
    # diagonal drift of an indel-dominated overlap is a random walk with
    # std ~sqrt(L * pair_indel_rate) (~26 rows for a 7 kb pair at 10%
    # indels), so a fixed band clips the drift tail at ANY width — the
    # ladder sizes the band to the pair instead of the dataset.  A pair
    # still window-suspect after the widest band is genuinely divergent
    # (cross-haplotype), not clipped: that distinction is what downstream
    # policy (filter.window_excess_mask, pop.arms_same_locus) keys on, and
    # a single 128 rung left a ~0.1% clipped-long-pair tail that fabricated
    # het arms on haploid data (round-2 c3 regression).  Rungs above 256
    # exceed the Pallas scoped-VMEM budget and route through the jnp
    # dp_core path automatically (DeviceExtender.PALLAS_MAX_BAND) — they
    # only ever see the final rung's few still-suspect pairs.
    wide_bands: tuple[int, ...] = (128, 256, 512)
    wide_retry_factor: float = 1.25
    wide_retry_margin: float = 0.02
    # DALIGNER-style block tiling (DBsplit analogue): 0 = auto from read
    # count (block tiling pipelines host seed-matching with device extension
    # and bounds per-tile candidate memory; pointless below a few thousand
    # reads where one tile's matching is instant), 1 = force unblocked,
    # N > 1 = force N blocks.  Blocked output is bit-identical (tested).
    n_blocks: int = 0
    # NOTE: the windowed-divergence statistic (extend.WINDOW probe) is
    # MEASURED here and attached to every table row (AlignmentTable.win);
    # the policy that uses it (window filter, containment gating, arm
    # classification) lives in filter.FilterChain / graph.pop.


_MAX_BATCH = 65536  # pairs per device call (amortizes dispatch, bounds HBM).
# Per-batch fixed cost (stacked-index upload + tunnel dispatch + XLA prep
# gathers) is ~9 ms on the axon link at 32k; 16384 pairs capped production
# at ~1.0M aligns/s, 32768 at ~1.8-2.0M (round-4), 65536 amortizes further
# (round-5).  HBM: the tab2 slabs are ~500 MB at 64k pairs — noise vs 16 GB.


def _bucket_edges(need: np.ndarray, cfg: OverlapConfig) -> list[int]:
    """Column-count bucket edges for a batch of candidates: the short fixed
    buckets, then segment multiples up to the LARGEST actually-needed count
    (capped) — avoids burning columns (and a kernel compile) on lengths no
    pair needs."""
    max_need = int(min(need.max(), cfg.max_jmax)) if need.shape[0] else 0
    edges = [b for b in cfg.pallas_buckets if b < max_need]
    k = 2
    while k * cfg.seg < max_need:
        if k * cfg.seg > (edges[-1] if edges else 0):
            edges.append(k * cfg.seg)
        k *= 2
    edges.append(
        ((max_need + cfg.seg - 1) // cfg.seg) * cfg.seg
        if max_need > cfg.pallas_buckets[0]
        else cfg.pallas_buckets[0]
    )
    return sorted(set(edges))


def _dispatch_bucketed(extender, ka, kb, kd, need, cfg, band=None, tag=""):
    """Bucket candidates by needed columns and dispatch every chunk async
    (results stay on device).  Returns [(sel_idx, jmax, [(out, M), ...])]."""
    from phasm_tpu import metrics

    pending = []
    prev = 0
    edges = _bucket_edges(need, cfg)
    for bi, cap in enumerate(edges):
        sel = (
            (need > prev) & (need <= cap)
            if bi + 1 < len(edges)
            else (need > prev)
        )
        prev = cap
        if not np.any(sel):
            continue
        sel_idx = np.nonzero(sel)[0]
        outs = []
        with metrics.stage(
            f"overlap.dispatch{tag}.j{cap}", pairs=sel_idx.shape[0]
        ):
            for s0 in range(0, sel_idx.shape[0], _MAX_BATCH):
                chunk = sel_idx[s0 : s0 + _MAX_BATCH]
                outs.append(
                    extender.extend_async(
                        ka[chunk], kb[chunk], kd[chunk], cap, band=band
                    )
                )
        pending.append((sel_idx, cap, outs))
    return pending


def _materialize_pending(extender, pending, N):
    """Fetch all pending device results into per-candidate arrays (kernel
    frame): (diffs, a_start, a_end, b_end, win)."""
    from phasm_tpu import metrics

    r_diffs = np.full(N, BIG, dtype=np.int64)
    r_as = np.zeros(N, dtype=np.int64)
    r_ae = np.zeros(N, dtype=np.int64)
    r_be = np.zeros(N, dtype=np.int64)
    r_win = np.zeros(N, dtype=np.int64)
    for idx, jmax, outs in pending:
        with metrics.stage(f"overlap.extend.j{jmax}", pairs=idx.shape[0]):
            parts = [extender.materialize(out, M) for out, M in outs]
        r_diffs[idx] = np.concatenate([p.diffs for p in parts])
        r_as[idx] = np.concatenate([p.a_start for p in parts])
        r_ae[idx] = np.concatenate([p.a_end for p in parts])
        r_be[idx] = np.concatenate([p.b_end for p in parts])
        r_win[idx] = np.concatenate([p.win_cost for p in parts])
    return r_diffs, r_as, r_ae, r_be, r_win


def _resolve_backend(cfg: OverlapConfig) -> str:
    backend = cfg.backend
    if backend == "auto":
        import jax

        # TPU default: the table-driven Myers bit-vector backend — 3.0x the
        # cell-per-lane production path on the driver workload (round 3,
        # MYERS_TPU_r3.json: 721k vs 239k aligns/s/chip).  Block-band
        # semantics per myers.myers_oracle (oracle-pinned, full pipeline
        # suite green on it); wide escalation rungs (> MYERS_MAX_BAND) use
        # the W-band family.  CPU keeps the jnp scan path (fastest there).
        backend = "myers_pallas" if jax.default_backend() == "tpu" else "jnp"
    return backend


def _normalize_candidates(cands: "seeding.Candidates", lengths, band: int):
    """Candidate pairs -> kernel frame.

    Kernel frame is (A = earlier read, B = later read) with diagonal >= 0.
    table a is the smaller read id, FORWARD; oriented b carries the strand.
    when the seed diagonal is negative, the roles in the KERNEL swap
    (suffix of oriented-b overlaps prefix of a)."""
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
    need = np.minimum(lb_k, la_k - kd + band).astype(np.int64) + band
    return a_id, b_id, st, swap, ka, kb, kd, la_k, lb_k, need


def _auto_blocks(n_reads: int) -> int:
    """Block count for the DALIGNER-style tiling.

    Round-5 rethreshold: seed matching is GLOBAL now (one radix sort +
    presorted emission — see overlap_reads_blocked docstring), so tiling no
    longer hides a per-tile matching cost; what it still does is bound
    per-dispatch candidate memory on very large runs.  Below ~50k reads the
    fragmented per-tile dispatches only waste kernel pad slots (36 tiles x
    4 buckets of 1-7k pairs each padded to pow2 at c6) — route those
    through the unblocked single-pass engine."""
    if n_reads <= 50_000:
        return 1
    return min(8, -(-n_reads // 16384))


def overlap_reads(
    reads: ReadSet,
    cfg: OverlapConfig | None = None,
    mesh=None,
    n_blocks: int | None = None,
) -> AlignmentTable:
    """All-vs-all overlap detection (production entry).

    Dispatches to the DALIGNER-style blocked engine (``overlap_reads_blocked``,
    cross-stage host-seed/device-extend pipelining) when the resolved block
    count exceeds 1 — default is auto from the read count (cfg.n_blocks == 0);
    blocked and unblocked tables are bit-identical (tested).

    ``mesh``: optional jax.sharding.Mesh — extension batches run
    data-parallel over its "dp" axis with an all_gather merge; the returned
    table is bit-identical to the single-device run (tested on the virtual
    CPU mesh).  Seeding stays host-side; the candidate list is identical
    regardless of mesh.
    """
    cfg = cfg or OverlapConfig()
    nb = n_blocks if n_blocks is not None else cfg.n_blocks
    if nb == 0:
        nb = _auto_blocks(reads.n_reads)
    if nb > 1:
        return overlap_reads_blocked(reads, cfg, mesh=mesh, n_blocks=nb)
    backend = _resolve_backend(cfg)

    from phasm_tpu import metrics

    lengths = reads.lengths.astype(np.int32)
    with metrics.stage("overlap.seed", reads=reads.n_reads):
        seeds = seeding.sort_seeds(
            seeding.extract_minimizers(reads.codes, lengths, cfg.seed)
        )
        cands = seeding.match_seeds(seeds, lengths, cfg.seed, presorted=True)
    metrics.incr("overlap.candidates", len(cands))
    if len(cands) == 0:
        return AlignmentTable.empty()

    oriented = reads.oriented_codes_matrix()
    a_id, b_id, st, swap, ka, kb, kd, la_k, lb_k, need = _normalize_candidates(
        cands, lengths, cfg.band
    )

    from phasm_tpu.overlap.extend import DeviceExtender

    extender = DeviceExtender(
        oriented, lengths, band=cfg.band, mesh=mesh, backend=backend
    )

    # two-phase: dispatch every chunk of every bucket (results stay on
    # device), then materialize — overlaps device compute with the tunnel
    # round-trips instead of syncing per chunk
    pending = _dispatch_bucketed(extender, ka, kb, kd, need, cfg)
    N = ka.shape[0]
    r_diffs, r_as, r_ae, r_be, r_win = _materialize_pending(
        extender, pending, N
    )
    return _escalate_and_build(
        extender, cfg, lengths,
        a_id, b_id, st, swap, ka, kb, kd, la_k, lb_k,
        r_diffs, r_as, r_ae, r_be, r_win,
    )


def overlap_reads_blocked(
    reads: ReadSet,
    cfg: OverlapConfig | None = None,
    mesh=None,
    n_blocks: int = 4,
) -> AlignmentTable:
    """Block-tiled overlap with cross-stage pipelining (match ∥ extend).

    The DAZZ_DB/DALIGNER analogue of block-vs-block comparison (DBsplit;
    SURVEY.md §3.2 L0 row): CANDIDATES are partitioned into (bi <= bj)
    block tiles by read-id range; each tile's normalization + bucketing
    runs on host WHILE the previous tile's extension batches execute on
    device (``extend_async`` keeps results device-resident, so dispatch
    returns immediately).  Output is BIT-IDENTICAL to ``overlap_reads``
    (tested, incl. repeat-rich data): the candidate set is computed by the
    same single global match.

    Round-5 restructure: seed matching itself is now GLOBAL — seeds are
    (canon, read_id)-sorted once in numpy and pairs emitted from the
    presorted arrays, replacing the per-tile comparator re-sorts that
    dominated the c6 seed stage (round-4 seed_match_host 144 s -> the sort
    was 71 s per full pass and each block paid it in all 8 of its tiles;
    see scripts/diag_seed_profile.py).  Repeat handling is unchanged
    (max_occ buckets are global by construction); tiling still bounds
    per-dispatch memory and pipelines host prep behind device extension.
    """
    cfg = cfg or OverlapConfig()
    backend = _resolve_backend(cfg)

    from phasm_tpu import metrics

    lengths = reads.lengths.astype(np.int32)
    with metrics.stage("overlap.seed.minimizers", reads=reads.n_reads):
        seeds = seeding.extract_minimizers(reads.codes, lengths, cfg.seed)
    with metrics.stage("overlap.seed.sort"):
        seeds = seeding.sort_seeds(seeds)
        metrics.incr(
            "overlap.seed.repeat_dropped",
            int((~seeding.repeat_run_mask(seeds.canon, cfg.seed.max_occ)).sum()),
        )

    oriented = reads.oriented_codes_matrix()
    from phasm_tpu.overlap.extend import DeviceExtender

    extender = DeviceExtender(
        oriented, lengths, band=cfg.band, mesh=mesh, backend=backend
    )

    n = reads.n_reads
    n_blocks = max(1, min(n_blocks, n))
    bounds = np.array([(n * i) // n_blocks for i in range(n_blocks + 1)])

    with metrics.stage("overlap.seed.match"):
        cands = seeding.match_seeds(seeds, lengths, cfg.seed, presorted=True)
    metrics.incr("overlap.candidates", len(cands))
    if len(cands) == 0:
        return AlignmentTable.empty()

    # candidate tiling: group by (block(a), block(b)); per-tile normalize +
    # dispatch async so the device extends tile t while tile t+1 preps
    blk_a = np.searchsorted(bounds, cands.a_id, side="right") - 1
    blk_b = np.searchsorted(bounds, cands.b_id, side="right") - 1
    tile_key = blk_a * n_blocks + blk_b
    tile_order = np.argsort(tile_key, kind="stable")
    tiles = []  # (norm_tuple, pending)
    for t0 in np.split(
        tile_order, np.nonzero(np.diff(tile_key[tile_order]))[0] + 1
    ) if tile_order.shape[0] else []:
        bi, bj = divmod(int(tile_key[t0[0]]), n_blocks)
        sub = seeding.Candidates(
            a_id=cands.a_id[t0], b_id=cands.b_id[t0],
            strand=cands.strand[t0], diag=cands.diag[t0],
            n_seeds=cands.n_seeds[t0],
        )
        with metrics.stage(f"overlap.seed.tile{bi}_{bj}"):
            norm = _normalize_candidates(sub, lengths, cfg.band)
        need = norm[-1]
        ka, kb, kd = norm[4], norm[5], norm[6]
        # dispatch NOW (async): device extends this tile while the next
        # tile's host-side prep runs
        pend = _dispatch_bucketed(
            extender, ka, kb, kd, need, cfg, tag=f".t{bi}_{bj}"
        )
        tiles.append((norm, pend))
    if not tiles:
        return AlignmentTable.empty()

    # concatenate tile frames; materialize each tile's pendings
    cat = [np.concatenate([t[0][i] for t in tiles]) for i in range(10)]
    a_id, b_id, st, swap, ka, kb, kd, la_k, lb_k, need = cat
    N = ka.shape[0]
    r = [
        np.full(N, BIG, dtype=np.int64),
        np.zeros(N, dtype=np.int64),
        np.zeros(N, dtype=np.int64),
        np.zeros(N, dtype=np.int64),
        np.zeros(N, dtype=np.int64),
    ]
    off = 0
    for norm, pend in tiles:
        n_t = norm[0].shape[0]
        rt = _materialize_pending(extender, pend, n_t)
        for dst, src in zip(r, rt):
            dst[off : off + n_t] = src
        off += n_t
    r_diffs, r_as, r_ae, r_be, r_win = r
    return _escalate_and_build(
        extender, cfg, lengths,
        a_id, b_id, st, swap, ka, kb, kd, la_k, lb_k,
        r_diffs, r_as, r_ae, r_be, r_win,
    )


def _escalate_and_build(
    extender, cfg, lengths,
    a_id, b_id, st, swap, ka, kb, kd, la_k, lb_k,
    r_diffs, r_as, r_ae, r_be, r_win,
) -> AlignmentTable:
    """Adaptive band escalation + mapping back to the table convention.

    Order-insensitive in the candidate axis (per-read medians, per-pair
    retries, and the final canonical dedup are all set-valued), so blocked
    and unblocked candidate orders yield bit-identical tables."""
    from phasm_tpu import metrics

    N = ka.shape[0]
    # adaptive band escalation: re-extend the high-error tail at each wider
    # band in turn (see OverlapConfig docstring).  Every wider band explores
    # a strict superset of paths, so its result is always <= the narrower
    # one; keep it unconditionally.
    if N and any(W2 > cfg.band for W2 in cfg.wide_bands):
        from phasm_tpu.overlap.extend import WINDOW

        # retry triggers are RELATIVE to the dataset's measured per-read
        # error (absolute thresholds retried essentially every pair on
        # high-error data, doubling overlap cost): a pair re-measures at
        # the next wider band when its whole-overlap error exceeds its
        # joint expectation, or when any window does statistically — band
        # clipping from indel drift inflates exactly these, and downstream
        # policy (filter.window_excess_mask) keys on the window statistic,
        # so suspect pairs must be re-measured before being judged.  The
        # per-read expectation is computed ONCE from the first pass (the
        # bulk is un-clipped, so the median is stable).
        aln_len = np.maximum(np.maximum(r_ae - r_as, r_be), 1)
        err1 = r_diffs / aln_len
        found1 = r_diffs < BIG
        # vectorized per-read error medians (sorted-segment medians; the
        # former per-alignment Python dict loop was a wall at 10^7+
        # candidates).  Each found pair contributes its error to both reads;
        # np.median semantics (mean of the two middles for even counts) are
        # reproduced exactly.
        f = np.nonzero(found1)[0]
        e_half_arr = np.zeros(lengths.shape[0], dtype=np.float64)
        if f.shape[0]:
            rds = np.concatenate([ka[f] >> 1, kb[f] >> 1])
            ers = np.concatenate([err1[f], err1[f]])
            order = np.lexsort((ers, rds))
            rds_s, ers_s = rds[order], ers[order]
            uniq_r, starts = np.unique(rds_s, return_index=True)
            counts = np.diff(np.append(starts, rds_s.shape[0]))
            lo = ers_s[starts + (counts - 1) // 2]
            hi = ers_s[starts + counts // 2]
            e_half_arr[uniq_r] = (lo + hi) / 2.0 / 2.0
        exp_pair = e_half_arr[ka >> 1] + e_half_arr[kb >> 1]
        mu_w = exp_pair * WINDOW
        win_thresh = mu_w + np.maximum(6.0 * np.sqrt(mu_w), 12.0)
        # escalation bookkeeping: a genuinely divergent pair (cross-
        # haplotype) stays trigger-suspect at EVERY band — without a stop
        # rule it would be re-extended at every rung, tripling overlap cost
        # on exactly the data (het-rich) with the most suspect pairs.  Two
        # deterministic cuts:
        #   (a) drift coverage — diagonal drift is a random walk with
        #       sigma ~ sqrt(alen * pair_indel_rate); once the band's half
        #       width covers 4 sigma (+8 slack) of the pair's EXPECTED
        #       error (measured error would self-inflate for divergent
        #       pairs), clipping is statistically excluded and a hot
        #       window is genuine divergence, not band artifact;
        #   (b) convergence — a wider band explores a superset of paths,
        #       so an IDENTICAL result at the wider band proves the band
        #       was not binding; wider still cannot differ in practice.
        band_rung = np.full(N, cfg.band, dtype=np.int64)
        exhausted = np.zeros(N, dtype=bool)

    for W2 in cfg.wide_bands:
        if W2 <= cfg.band or not N:
            continue
        aln_len = np.maximum(np.maximum(r_ae - r_as, r_be), 1)
        err1 = r_diffs / aln_len
        sigma = np.sqrt(np.maximum(aln_len * exp_pair, 0.0) * 0.8)
        covered = (band_rung // 2) >= 4.0 * sigma + 8.0
        retry = (
            (r_diffs >= BIG)
            | (
                (
                    (err1 > exp_pair * cfg.wide_retry_factor + cfg.wide_retry_margin)
                    | (r_win > win_thresh)
                )
                & ~covered
            )
        ) & ~exhausted
        ridx = np.nonzero(retry)[0]
        metrics.incr(f"overlap.wide_band_retries.b{W2}", int(ridx.shape[0]))
        if ridx.shape[0]:
            need_w = (
                np.minimum(lb_k[ridx], la_k[ridx] - kd[ridx] + W2).astype(np.int64)
                + W2
            )
            pend_w = [
                (ridx[sel_rel], outs)
                for sel_rel, _cap, outs in _dispatch_bucketed(
                    extender, ka[ridx], kb[ridx], kd[ridx], need_w, cfg,
                    band=W2, tag=f".retry{W2}",
                )
            ]
            for sub, outs in pend_w:
                parts = [extender.materialize(out, M) for out, M in outs]
                nd = np.concatenate([p.diffs for p in parts])
                nas = np.concatenate([p.a_start for p in parts])
                nae = np.concatenate([p.a_end for p in parts])
                nbe = np.concatenate([p.b_end for p in parts])
                nw = np.concatenate([p.win_cost for p in parts])
                same = (
                    (r_diffs[sub] == nd)
                    & (r_as[sub] == nas)
                    & (r_ae[sub] == nae)
                    & (r_be[sub] == nbe)
                    & (r_win[sub] == nw)
                )
                exhausted[sub[same]] = True  # band not binding: stop (b)
                r_diffs[sub] = nd
                r_as[sub] = nas
                r_ae[sub] = nae
                r_be[sub] = nbe
                r_win[sub] = nw
            band_rung[ridx] = W2

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
