"""Pure-python oracle for the native consensus polish (native/phasm_native.cpp).

Mirrors ONE round of `polish_new/add/finish` bit-for-bit:

  * anchor-chained banded DP — exact k-mer (k=13) anchors between read and
    draft window, O(A^2) longest chain (strictly increasing (i, j), diagonal
    jump <= 2048, read gap <= 4096), piecewise-linear band centerline
    through the chain knots with slope-1 extrapolation, straight-line
    fallback when no chain;
  * same move preference (diag, then read-insertion, then draft-deletion —
    later moves must be STRICTLY cheaper), same traceback segment
    attachment (an insertion run flushes at the next matched draft
    position; runs may span deletion moves; leading read overhang dropped);
  * same consensus rules: strict-majority exact insertion segment,
    weighted-MEDOID splice for long (>= 4 base) segments at >= max(min_cov,
    cov/4) support with +-8-position suppression, strict-majority deletion,
    plurality base, draft base kept below min_cov.

Used by tests/test_native.py for the equality invariant (CLAUDE.md: every
native pass has an oracle).  O(m * band) python per read — tiny inputs only.
"""
from __future__ import annotations

import numpy as np

INF = 1 << 28
ANCHOR_K = 13
MAX_WINDOW_HITS = 4
MAX_ANCHORS = 1024
MIN_SPLICE_LEN = 4
SPLICE_SUPPRESS = 8


def _kmer_index(draft):
    idx = []
    mask = (1 << (2 * ANCHOR_K)) - 1
    v = 0
    for p in range(len(draft)):
        v = ((v << 2) | (int(draft[p]) & 3)) & mask
        if p >= ANCHOR_K - 1:
            idx.append((v, p - ANCHOR_K + 1))
    idx.sort()
    return idx


def _build_centers(kidx, draft, read, m, w0, w1):
    import bisect

    n = w1 - w0
    linear = [(i * n) // m for i in range(m + 1)]
    if m < ANCHOR_K or n < ANCHOR_K or not kidx:
        return linear
    anchors = []
    mask = (1 << (2 * ANCHOR_K)) - 1
    v = 0
    for i in range(m):
        v = ((v << 2) | (int(read[i]) & 3)) & mask
        if i < ANCHOR_K - 1:
            continue
        ip = i - ANCHOR_K + 1
        lo = bisect.bisect_left(kidx, (v, w0))
        hi = bisect.bisect_left(kidx, (v, w1))
        cnt = hi - lo
        if cnt < 1 or cnt > MAX_WINDOW_HITS:
            continue
        for t in range(lo, hi):
            anchors.append((ip, kidx[t][1] - w0))
    if len(anchors) < 2:
        return linear
    anchors.sort()
    if len(anchors) > MAX_ANCHORS:
        step = len(anchors) / MAX_ANCHORS
        anchors = [anchors[int(t * step)] for t in range(MAX_ANCHORS)]
    A = len(anchors)
    score = [1] * A
    prev = [-1] * A
    best_end = 0
    for x in range(A):
        ix, jx = anchors[x]
        for y in range(x - 1, -1, -1):
            iy, jy = anchors[y]
            if ix - iy > 4096:
                break
            if iy >= ix or jy >= jx:
                continue
            dd = (jx - ix) - (jy - iy)
            if dd > 2048 or dd < -2048:
                continue
            if score[y] + 1 > score[x]:
                score[x] = score[y] + 1
                prev[x] = y
        if score[x] > score[best_end]:
            best_end = x
    if score[best_end] < 2:
        return linear
    knots = []
    x = best_end
    while x >= 0:
        knots.append(anchors[x])
        if prev[x] < 0:
            break
        x = prev[x]
    knots.reverse()
    centers = [0] * (m + 1)
    i0, j0 = knots[0]
    for i in range(min(i0, m) + 1):
        centers[i] = max(0, min(n, j0 - (i0 - i)))
    for t in range(len(knots) - 1):
        ia, ja = knots[t]
        ib, jb = knots[t + 1]
        for i in range(ia, ib + 1):
            centers[i] = ja + (jb - ja) * (i - ia) // (ib - ia)
    ie, je = knots[-1]
    for i in range(ie, m + 1):
        centers[i] = min(n, je + (i - ie))
    return centers


MIS, GO, GE = 3, 4, 2


def _align_accumulate(draft, read, w0, w1, band, votes, ins_obs, kidx):
    """Affine-gap (Gotoh) banded DP; states 0=M (diag), 1=D (draft del),
    2=I (read ins).  Mirrors native polish_add."""
    n = w1 - w0
    m = len(read)
    if n <= 0 or m <= 0:
        return -1
    W = band
    centers = _build_centers(kidx, draft, read, m, w0, w1)
    cost = np.full((m + 1, W, 3), INF, dtype=np.int64)
    move = np.full((m + 1, W, 3), -1, dtype=np.int8)

    def idx(i, j):
        off = j - (centers[i] - W // 2)
        return off if 0 <= off < W else None

    # semiglobal start: free, marked 3 (traceback stops, no votes)
    for j in range(max(0, centers[0] - W // 2),
                   min(n, centers[0] + W // 2 - 1) + 1):
        x = idx(0, j)
        if x is not None:
            cost[0, x, 0] = 0
            move[0, x, 0] = 3
    for i in range(1, m + 1):
        lo = max(0, centers[i] - W // 2)
        hi = min(n, centers[i] + W // 2 - 1)
        rb = int(read[i - 1]) & 3
        for j in range(lo, hi + 1):
            x = idx(i, j)
            if x is None:
                continue
            if j > 0:
                d = idx(i - 1, j - 1)
                if d is not None:
                    best, st = cost[i - 1, d, 0], 0
                    if cost[i - 1, d, 1] < best:
                        best, st = cost[i - 1, d, 1], 1
                    if cost[i - 1, d, 2] < best:
                        best, st = cost[i - 1, d, 2], 2
                    if best < INF:
                        cost[i, x, 0] = best + (
                            0 if rb == draft[w0 + j - 1] else MIS
                        )
                        move[i, x, 0] = st
            if j > 0:
                l = idx(i, j - 1)
                if l is not None:
                    cm = cost[i, l, 0] + GO + GE if cost[i, l, 0] < INF else INF
                    cd = cost[i, l, 1] + GE if cost[i, l, 1] < INF else INF
                    ci = cost[i, l, 2] + GO + GE if cost[i, l, 2] < INF else INF
                    best, st = cm, 0
                    if cd < best:
                        best, st = cd, 1
                    if ci < best:
                        best, st = ci, 2
                    if best < INF:
                        cost[i, x, 1] = best
                        move[i, x, 1] = st
            u = idx(i - 1, j)
            if u is not None:
                cm = cost[i - 1, u, 0] + GO + GE if cost[i - 1, u, 0] < INF else INF
                cd = cost[i - 1, u, 1] + GO + GE if cost[i - 1, u, 1] < INF else INF
                ci = cost[i - 1, u, 2] + GE if cost[i - 1, u, 2] < INF else INF
                best, st = cm, 0
                if cd < best:
                    best, st = cd, 1
                if ci < best:
                    best, st = ci, 2
                if best < INF:
                    cost[i, x, 2] = best
                    move[i, x, 2] = st
    bj, bc, bst = -1, INF, 0
    for j in range(max(0, centers[m] - W // 2),
                   min(n, centers[m] + W // 2 - 1) + 1):
        x = idx(m, j)
        if x is None:
            continue
        for s in range(3):
            if cost[m, x, s] < bc:
                bc, bj, bst = cost[m, x, s], j, s
    if bj < 0:
        return -1
    i, j, st = m, bj, bst
    pending: list[int] = []
    while i > 0 or j > 0:
        x = idx(i, j)
        if x is None:
            break
        pred = move[i, x, st]
        if pred < 0:
            break
        if st == 0:
            if pred == 3:
                break  # start marker (only at row 0)
            votes[w0 + j - 1][int(read[i - 1]) & 3] += 1
            if pending:
                seg = tuple(reversed(pending))
                ins_obs.setdefault(w0 + j, {})
                ins_obs[w0 + j][seg] = ins_obs[w0 + j].get(seg, 0) + 1
                pending = []
            i, j = i - 1, j - 1
        elif st == 1:
            votes[w0 + j - 1][4] += 1
            j -= 1
        else:
            pending.append(int(read[i - 1]) & 3)
            i -= 1
        st = pred
    return 0


def _seg_key(seg):
    """C++ pack_seg sort key: short segs by packed u64; long segs sort after
    all short ones, in first-observation order — approximated here by the
    tuple itself (ties between distinct equal-count long segments are
    vanishingly rare on oracle-scale inputs)."""
    L = len(seg)
    if L <= 28:
        v = L << 56
        for t, b in enumerate(seg):
            v |= (b & 3) << (2 * t)
        return (0, v)
    return (1, seg)


def _edit_dist(a, b):
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            c = prev[j - 1] + (0 if a[i - 1] == b[j - 1] else 1)
            c = min(c, prev[j] + 1, cur[j - 1] + 1)
            cur[j] = c
        prev = cur
    return prev[lb]


def polish_oracle(draft, member_seqs, member_offsets, band=128, min_cov=3):
    """Reference implementation of ONE round of polish_native."""
    draft = np.asarray(draft, dtype=np.uint8)
    n = len(draft)
    kidx = _kmer_index(draft)
    votes = [[0] * 5 for _ in range(n)]
    ins_obs: dict[int, dict[tuple, int]] = {}
    pad = band  # full-band slack each side (mirrors polish_native)
    for seq, off in zip(member_seqs, member_offsets):
        seq = np.asarray(seq, dtype=np.uint8)
        w0 = max(int(off) - pad, 0)
        w1 = min(int(off) + len(seq) + pad, n)
        _align_accumulate(draft, seq, w0, w1, band, votes, ins_obs, kidx)

    # per-position decisions
    exact_emit: dict[int, tuple] = {}
    cands = []  # (pos, support, seg)
    for p in sorted(ins_obs):
        segs = ins_obs[p]
        cov_here = sum(votes[p]) if p < n else 0
        best_cnt, best_seg = 0, None
        tot_long = 0
        for seg in sorted(segs, key=_seg_key):
            if segs[seg] > best_cnt:
                best_cnt, best_seg = segs[seg], seg
            if len(seg) >= MIN_SPLICE_LEN:
                tot_long += segs[seg]
        if best_cnt > 0 and cov_here >= min_cov and best_cnt * 2 > cov_here:
            exact_emit[p] = best_seg
            continue
        if tot_long >= min_cov and tot_long * 4 > cov_here:
            longs = [
                (seg, segs[seg]) for seg in sorted(segs, key=_seg_key)
                if len(seg) >= MIN_SPLICE_LEN
            ]
            best_i, best_d = -1, None
            for a in range(len(longs)):
                d = 0
                for b in range(len(longs)):
                    if a == b:
                        continue
                    d += longs[b][1] * _edit_dist(longs[a][0], longs[b][0])
                d = d * 1024 - longs[a][1]
                if best_d is None or d < best_d:
                    best_d, best_i = d, a
            if best_i >= 0:
                cands.append((p, tot_long, longs[best_i][0]))

    # greedy splice acceptance with suppression
    order = sorted(range(len(cands)), key=lambda i: (-cands[i][1], cands[i][0]))
    taken: list[int] = []
    splice_at: dict[int, tuple] = {}
    for oi in order:
        p = cands[oi][0]
        if all(abs(tp - p) > SPLICE_SUPPRESS for tp in taken):
            taken.append(p)
            splice_at[p] = cands[oi][2]

    out: list[int] = []
    for p in range(n + 1):
        if p in splice_at:
            out.extend(splice_at[p])
        elif p in exact_emit:
            out.extend(exact_emit[p])
        if p == n:
            break
        cov_here = sum(votes[p])
        if cov_here < min_cov:
            out.append(int(draft[p]))
            continue
        if votes[p][4] * 2 > cov_here:
            continue
        best_t, best_v = 0, -1
        for t in range(4):
            if votes[p][t] > best_v:
                best_v, best_t = votes[p][t], t
        out.append(best_t)
    return np.array(out, dtype=np.uint8)
