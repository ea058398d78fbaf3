"""Minimizer seeding + sort-based k-mer matching.

Replaces DALIGNER's k-mer sort/merge seeding (SURVEY.md §3.2 table: "k-mer
seed sort/merge, chained seed hits").  Pipeline:

  1. pack every k-mer of every read into an integer; take the *canonical*
     form min(kmer, revcomp(kmer)) with an orientation bit;
  2. minimizer selection: keep the k-mer with minimal hash in each window of
     w consecutive positions (reduces seeds ~2/(w+1) while guaranteeing any
     overlap >= w+k-1 shares a seed);
  3. sort seeds by canonical value; within each bucket emit read pairs with
     relative strand + diagonal;
  4. histogram (pair, strand, diagonal band) and keep candidates with enough
     supporting seeds; the banded aligner then verifies.

numpy implementation (host); the sort/segment structure maps 1:1 onto
jnp.sort / segment ops for a device version.
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class SeedConfig:
    k: int = 15
    window: int = 8
    max_occ: int = 64  # drop k-mers more frequent than this (repeats)
    min_seeds: int = 3  # per (pair, strand, diag band)
    diag_band: int = 48  # diagonal bucket width (<= extend band W)


def _hash64(x: np.ndarray) -> np.ndarray:
    """Cheap invertible mixer (splitmix-style) for minimizer ordering."""
    x = x.astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def kmer_values(codes: np.ndarray, lengths: np.ndarray, k: int):
    """[N, Lk] forward k-mer values (2 bits/base, first base most significant)
    plus a validity mask.  Lk = L - k + 1 positions."""
    n, L = codes.shape
    Lk = L - k + 1
    vals = np.zeros((n, Lk), dtype=np.uint64)
    for t in range(k):
        vals = (vals << np.uint64(2)) | codes[:, t : t + Lk].astype(np.uint64)
    pos = np.arange(Lk)[None, :]
    valid = pos <= (lengths[:, None] - k)
    return vals, valid


def revcomp_kmer(vals: np.ndarray, k: int) -> np.ndarray:
    """Reverse complement of packed k-mers."""
    x = vals.astype(np.uint64)
    out = np.zeros_like(x)
    for _ in range(k):
        out = (out << np.uint64(2)) | (np.uint64(3) - (x & np.uint64(3)))
        x >>= np.uint64(2)
    return out


@dataclasses.dataclass
class Seeds:
    read_id: np.ndarray  # [S] int32
    pos: np.ndarray  # [S] int32 (position on forward read)
    canon: np.ndarray  # [S] uint64 canonical k-mer value
    orient: np.ndarray  # [S] uint8  0 = forward kmer is canonical


def extract_minimizers(
    codes: np.ndarray, lengths: np.ndarray, cfg: SeedConfig, use_native: bool = True
) -> Seeds:
    """Minimizer seeds; C++ fast path (phasm_tpu.native) when available.

    Window semantics (identical in both implementations): for each read with
    nk = len-k+1 kmer positions, windows are [s, s+w) for s in [0, nk-w]
    (one argmin pick per window, first-index tie-break); reads shorter than
    one window contribute their single global argmin.
    """
    if use_native:
        from phasm_tpu import metrics, native

        out = native.extract_minimizers_native(codes, lengths, cfg.k, cfg.window)
        if out is not None:
            metrics.incr("overlap.seed.native_minimizers")
            read_id, pos, canon, orient = out
            return Seeds(
                read_id=read_id,
                pos=pos,
                canon=canon,
                orient=orient.astype(np.uint8),
            )

    vals, valid = kmer_values(codes, lengths, cfg.k)
    rc = revcomp_kmer(vals, cfg.k)
    orient = (rc < vals).astype(np.uint8)
    canon = np.where(orient == 1, rc, vals)
    h = _hash64(canon)
    h = np.where(valid, h, np.uint64(0xFFFFFFFFFFFFFFFF))

    n, Lk = h.shape
    w = cfg.window
    if Lk > w:
        sw = np.lib.stride_tricks.sliding_window_view(h, w, axis=1)
        win_arg = np.argmin(sw, axis=2) + np.arange(sw.shape[1])[None, :]
    else:
        win_arg = None
    rid, sel = [], []
    for i in range(n):
        nk = int(lengths[i]) - cfg.k + 1
        if nk <= 0:
            continue
        if nk <= w or win_arg is None:
            picks = np.array([int(np.argmin(h[i, :nk]))])
        else:
            picks = np.unique(win_arg[i, : nk - w + 1])
        rid.append(np.full(picks.shape[0], i, dtype=np.int32))
        sel.append(picks.astype(np.int32))
    read_id = np.concatenate(rid) if rid else np.zeros(0, np.int32)
    pos = np.concatenate(sel) if sel else np.zeros(0, np.int32)
    return Seeds(
        read_id=read_id,
        pos=pos,
        canon=canon[read_id, pos],
        orient=orient[read_id, pos],
    )


def sort_seeds(seeds: Seeds, k: int = 15) -> Seeds:
    """Seeds sorted by (canon, read_id) — ONE sort, so downstream matching
    (native presorted path, per-tile subsets, repeat-run counting) never
    re-sorts.  At c6 geometry (45M seeds) this replaced a 71 s comparator
    sort inside the C++ matcher — paid once per tile (8x) by the blocked
    engine (round-5 seeding profile).  Uses the C++ radix argsort on a
    packed (canon << ridbits | read_id) key when it fits 64 bits; numpy
    lexsort otherwise (bit-identical order either way: the packed key's
    comparison IS (canon, read_id) lexicographic)."""
    from phasm_tpu import native

    n = seeds.read_id.shape[0]
    order = None
    if n:
        ridbits = max(int(seeds.read_id.max()), 1).bit_length()
        if 2 * k + ridbits <= 64:
            key = (seeds.canon << np.uint64(ridbits)) | seeds.read_id.astype(
                np.uint64
            )
            order = native.sort_u64_order_native(key)
    if order is None:
        order = np.lexsort((seeds.read_id, seeds.canon))
    return Seeds(
        read_id=seeds.read_id[order],
        pos=seeds.pos[order],
        canon=seeds.canon[order],
        orient=seeds.orient[order],
    )


def repeat_run_mask(canon_sorted: np.ndarray, max_occ: int) -> np.ndarray:
    """[S] bool: seed's canonical k-mer occurs <= max_occ times.  Linear
    scan over the SORTED canon column (replaces an np.unique full sort —
    28.5 s at c6)."""
    S = canon_sorted.shape[0]
    if S == 0:
        return np.zeros(0, dtype=bool)
    new = np.ones(S, dtype=bool)
    new[1:] = canon_sorted[1:] != canon_sorted[:-1]
    starts = np.nonzero(new)[0]
    counts = np.diff(np.append(starts, S))
    return np.repeat(counts <= max_occ, counts)


@dataclasses.dataclass
class Candidates:
    """Candidate overlap pairs for banded extension."""

    a_id: np.ndarray  # [M] int32, a_id < b_id
    b_id: np.ndarray  # [M]
    strand: np.ndarray  # [M] 0/1 relative orientation
    diag: np.ndarray  # [M] int32 estimated diagonal (a_pos - oriented_b_pos)
    n_seeds: np.ndarray  # [M] int32 supporting seed count

    def __len__(self):
        return int(self.a_id.shape[0])


def emit_pairs_np(
    seeds: Seeds, lengths: np.ndarray, cfg: SeedConfig, cross_split: int = -1
):
    """numpy oracle for raw pair emission: (a, b, strand, diag) arrays.

    cross_split >= 0 emits only pairs with a < cross_split <= b (block-tile
    mode, see overlap_reads_blocked)."""
    order = np.lexsort((seeds.read_id, seeds.canon))
    canon = seeds.canon[order]
    rid = seeds.read_id[order]
    pos = seeds.pos[order]
    ori = seeds.orient[order]

    z = np.zeros(0, np.int32)
    S = canon.shape[0]
    if S == 0:
        return z, z, z, z
    new = np.ones(S, dtype=bool)
    new[1:] = canon[1:] != canon[:-1]
    starts = np.nonzero(new)[0]
    counts = np.diff(np.append(starts, S))

    pa, pb = [], []
    for s, c in zip(starts, counts):
        if c < 2 or c > cfg.max_occ:
            continue
        idx = np.arange(s, s + c)
        i, j = np.meshgrid(idx, idx, indexing="ij")
        m = i < j
        pa.append(i[m])
        pb.append(j[m])
    if not pa:
        return z, z, z, z
    i = np.concatenate(pa)
    j = np.concatenate(pb)

    r1, r2 = rid[i], rid[j]
    keep = r1 != r2
    i, j, r1, r2 = i[keep], j[keep], r1[keep], r2[keep]
    # order a < b
    swap = r1 > r2
    i2 = np.where(swap, j, i)
    j2 = np.where(swap, i, j)
    a, b = rid[i2], rid[j2]
    if cross_split >= 0:
        keep2 = (a < cross_split) & (b >= cross_split)
        i2, j2, a, b = i2[keep2], j2[keep2], a[keep2], b[keep2]
        if a.shape[0] == 0:
            return z, z, z, z
    pa_, pb_ = pos[i2], pos[j2]
    oa, ob = ori[i2], ori[j2]

    # relative strand: the canonical form reads the same way on both reads
    # iff oa == ob (then fwd-fwd); otherwise a-fwd matches revcomp(b).
    st = (oa ^ ob).astype(np.int32)
    # oriented-b position of the shared kmer: a kmer at forward-b position pb
    # sits at lb - k - pb on revcomp(b)
    lb = lengths[b]
    pb_or = np.where(st == 1, lb - cfg.k - pb_, pb_)
    diag = (pa_ - pb_or).astype(np.int32)
    return a.astype(np.int32), b.astype(np.int32), st, diag


def match_seeds(
    seeds: Seeds,
    lengths: np.ndarray,
    cfg: SeedConfig,
    use_native: bool = True,
    cross_split: int = -1,
    presorted: bool = False,
) -> Candidates:
    """Sort-merge seed matching -> candidate pair histogram.

    Raw pair emission runs in C++ when available (bit-identical pair SET;
    the histogram below is order-insensitive), numpy otherwise.
    cross_split >= 0 emits only pairs with a < cross_split <= b (block-tile
    mode, see overlap_reads_blocked).  presorted=True asserts ``seeds`` is
    already (canon, read_id)-sorted (see :func:`sort_seeds`) — the
    production engines sort once and match many times.
    """
    out = None
    if use_native:
        from phasm_tpu import metrics, native

        out = native.match_seed_pairs_native(
            seeds.read_id, seeds.pos, seeds.canon, seeds.orient,
            lengths, cfg.k, cfg.max_occ, cross_split, presorted=presorted,
        )
    if out is not None:
        from phasm_tpu import metrics

        metrics.incr("overlap.seed.native_pairs")
        a, b, st, diag = out
    else:
        a, b, st, diag = emit_pairs_np(seeds, lengths, cfg, cross_split)
    if a.shape[0] == 0:
        z = np.zeros(0, np.int32)
        return Candidates(z, z, z, z, z)

    if use_native:
        from phasm_tpu import native

        h = native.pair_histogram_native(
            a, b, st, diag, lengths.shape[0], cfg.diag_band, cfg.min_seeds
        )
        if h is not None:
            from phasm_tpu import metrics

            metrics.incr("overlap.seed.native_histogram")
            a_u, b_u, st_u, d0, cnt = h
            return Candidates(
                a_id=a_u, b_id=b_u, strand=st_u, diag=d0, n_seeds=cnt
            )

    diag = diag.astype(np.int64)

    # histogram over (a, b, strand, diag band)
    band = np.floor_divide(diag + (1 << 20), cfg.diag_band)  # offset keeps >= 0
    key = (
        a.astype(np.int64) * (lengths.shape[0] + 1) + b.astype(np.int64)
    ) * 2 + st.astype(np.int64)
    key = key * (1 << 22) + band
    uk, inv, cnt = np.unique(key, return_inverse=True, return_counts=True)
    # mean diagonal per bucket
    dsum = np.zeros(uk.shape[0], dtype=np.int64)
    np.add.at(dsum, inv, diag)
    good = cnt >= cfg.min_seeds
    uk, cnt, dsum = uk[good], cnt[good], dsum[good]

    band_u = uk % (1 << 22)
    rest = uk >> 22
    st_u = (rest % 2).astype(np.int32)
    ab = rest // 2
    b_u = (ab % (lengths.shape[0] + 1)).astype(np.int32)
    a_u = (ab // (lengths.shape[0] + 1)).astype(np.int32)
    d0 = (dsum // np.maximum(cnt, 1)).astype(np.int64)

    # merge adjacent diagonal bands of the same (pair, strand): keep the
    # band with most seeds (deterministic: lexsort then first)
    pk = (a_u.astype(np.int64) * (lengths.shape[0] + 1) + b_u) * 2 + st_u
    order2 = np.lexsort((band_u, -cnt, pk))
    pk_s = pk[order2]
    first = np.ones(pk_s.shape[0], dtype=bool)
    first[1:] = pk_s[1:] != pk_s[:-1]
    sel = order2[first]

    return Candidates(
        a_id=a_u[sel],
        b_id=b_u[sel],
        strand=st_u[sel],
        diag=d0[sel].astype(np.int32),
        n_seeds=cnt[sel].astype(np.int32),
    )
