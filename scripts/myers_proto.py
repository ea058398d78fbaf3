"""Prototype: block-banded Myers bit-vector overlap DP (numpy, vectorized
over pairs), validated against a plain per-cell DP with IDENTICAL block-band
semantics.

Conventions:
  D[i, j]: i a-chars consumed (rows 0..la), j b-chars consumed (cols 0..lb).
  D[i, 0] = 0 (free start anywhere in a).
  Band at column j: anchor row r0(j) = 32*m(j), m(j) = clip(floor((d0+j)/32)
  - K//2, 0, .), window rows r0+1 .. r0+32K; the anchor row's score s_top is
  carried explicitly; rows above the window are out of band (boundary
  horizontal delta fixed at +1).
  Bit t of word k encodes D[r0+32k+t+1] - D[r0+32k+t]; Peq bit t of word k
  tests a[32*(m+k)+t] (absolute char index).
  New word entering at a block switch: VP=1s (D[b+t] = D[b]+t).
"""
import numpy as np

WB = 32
BIG = 1 << 29
ALL1 = np.uint64(0xFFFFFFFF)
ONE = np.uint64(1)
HIGH = np.uint64(1 << 31)


def popcnt(x):
    return np.bitwise_count(x).astype(np.int64)


def myers_banded_np(a, b, la, lb, d0, K=3):
    """Returns (best_la, best_la_j, ends, rows): best cost at row la over all
    columns (+ its column), and the final-column scores for window rows."""
    Bn, LA = a.shape
    LB = b.shape[1]
    nw_a = (LA + WB - 1) // WB + K + 2
    Peq = np.zeros((5, Bn, nw_a), dtype=np.uint64)
    for base in range(4):
        bits = (a == base).astype(np.uint64)
        for w in range((LA + WB - 1) // WB):
            seg = bits[:, w * WB : (w + 1) * WB]
            Peq[base, :, w] = (
                seg << np.arange(seg.shape[1], dtype=np.uint64)
            ).sum(axis=1, dtype=np.uint64)

    m = np.clip(d0 // WB - K // 2, 0, None).astype(np.int64)
    VP = np.zeros((K, Bn), dtype=np.uint64)
    VN = np.zeros((K, Bn), dtype=np.uint64)
    s_top = np.zeros(Bn, dtype=np.int64)  # D[32*m, j]

    best_la = np.full(Bn, BIG, dtype=np.int64)
    best_la_j = np.zeros(Bn, dtype=np.int64)

    def score_at(row):
        """D[row, j] for rows in [32m, 32m+32K]."""
        diff = row - m * WB  # bits to accumulate
        s = s_top.copy()
        for kk in range(K):
            r = diff - kk * WB
            msk = np.where(
                r >= WB, ALL1,
                np.where(r > 0, (ONE << np.maximum(r, 0).astype(np.uint64)) - ONE,
                         np.uint64(0)),
            )
            s += popcnt(VP[kk] & msk) - popcnt(VN[kk] & msk)
        return s

    jmax = int(lb.max())
    for j in range(jmax):
        active = j < lb
        m_want = np.clip((d0 + j) // WB - K // 2, 0, None)
        shift = (m_want > m) & active
        if shift.any():
            s_top = np.where(shift, s_top + popcnt(VP[0]) - popcnt(VN[0]), s_top)
            for k in range(K - 1):
                VP[k] = np.where(shift, VP[k + 1], VP[k])
                VN[k] = np.where(shift, VN[k + 1], VN[k])
            VP[K - 1] = np.where(shift, ALL1, VP[K - 1])
            VN[K - 1] = np.where(shift, np.uint64(0), VN[K - 1])
            m = np.where(shift, m_want, m)

        bj = b[np.arange(Bn), np.minimum(j, LB - 1)].astype(np.int64)
        bj = np.where((bj > 3) | (~active), 4, bj)
        hin = np.where(active, 1, 0).astype(np.int64)  # top boundary delta
        for k in range(K):
            Eq = Peq[bj, np.arange(Bn), m + k]
            Pv, Mv = VP[k], VN[k]
            Xv = Eq | Mv
            Eq2 = Eq | (hin < 0).astype(np.uint64)
            Xh = ((((Eq2 & Pv) + Pv) & ALL1) ^ Pv) | Eq2
            Ph = Mv | (~(Xh | Pv) & ALL1)
            Mh = Pv & Xh
            hout = ((Ph & HIGH) >> np.uint64(31)).astype(np.int64) - (
                (Mh & HIGH) >> np.uint64(31)
            ).astype(np.int64)
            Ph = (Ph << ONE) & ALL1
            Mh = (Mh << ONE) & ALL1
            Ph = Ph | (hin > 0).astype(np.uint64)
            Mh = Mh | (hin < 0).astype(np.uint64)
            nVP = Mh | (~(Xv | Ph) & ALL1)
            nVN = Ph & Xv
            VP[k] = np.where(active, nVP, Pv)
            VN[k] = np.where(active, nVN, Mv)
            hin = np.where(active, hout, 0)
        s_top = np.where(active, s_top + 1, s_top)  # top boundary +1/col

        la_in = (la >= m * WB) & (la <= (m + K) * WB) & active
        if la_in.any():
            s_la = score_at(la)
            cand = np.where(la_in, s_la, BIG)
            upd = (cand < best_la) | ((cand == best_la) & la_in)
            best_la = np.where(upd, cand, best_la)
            best_la_j = np.where(upd, j + 1, best_la_j)

    rows = m[:, None] * WB + np.arange(1, K * WB + 1)[None, :]
    ends = np.zeros((Bn, K * WB), dtype=np.int64)
    run = s_top.copy()
    for k in range(K):
        for t in range(WB):
            run = run + ((VP[k] >> np.uint64(t)) & ONE).astype(np.int64) - (
                (VN[k] >> np.uint64(t)) & ONE
            ).astype(np.int64)
            ends[:, k * WB + t] = run
    ends = np.where(rows <= la[:, None], ends, BIG)
    return best_la, best_la_j, ends, rows


def blockband_dp_np(a, b, la, lb, d0, K=3):
    """Per-cell DP with identical block-band semantics (the oracle)."""
    Bn, LA = a.shape
    out_la = np.full(Bn, BIG, dtype=np.int64)
    out_la_j = np.zeros(Bn, dtype=np.int64)
    out_ends = np.full((Bn, K * WB), BIG, dtype=np.int64)
    out_rows = np.zeros((Bn, K * WB), dtype=np.int64)
    for p in range(Bn):
        m = max(d0[p] // WB - K // 2, 0)
        # cur[t] = D[32m + t, j]; index 0 = anchor row
        n = K * WB + 1
        prev = np.zeros(n, dtype=np.int64)
        for j in range(int(lb[p])):
            m_want = max((d0[p] + j) // WB - K // 2, 0)
            while m_want > m:
                newprev = np.empty_like(prev)
                newprev[: n - WB] = prev[WB:]
                for t in range(WB):
                    newprev[n - WB + t] = newprev[n - WB - 1] + t + 1
                prev = newprev
                m += 1
            cur = np.empty_like(prev)
            cur[0] = prev[0] + 1  # out-of-band top boundary
            for t in range(1, n):
                i = m * WB + t
                if 1 <= i <= la[p] and i - 1 < LA:
                    sub = int(a[p, i - 1] != b[p, j])
                else:
                    sub = 1
                cur[t] = min(prev[t - 1] + sub, prev[t] + 1, cur[t - 1] + 1)
            prev = cur
            if m * WB <= la[p] <= m * WB + K * WB:
                cc = prev[la[p] - m * WB]
                if cc <= out_la[p]:
                    out_la[p] = cc
                    out_la_j[p] = j + 1
        rows = m * WB + np.arange(1, K * WB + 1)
        ends = prev[1:].copy()
        ends[rows > la[p]] = BIG
        out_ends[p] = ends
        out_rows[p] = rows
    return out_la, out_la_j, out_ends, out_rows


def random_overlap_case(rng, B=8, la_max=400, err=0.1):
    LA = la_max
    LB = la_max
    a = rng.integers(0, 4, (B, LA)).astype(np.uint8)
    b = np.full((B, LB), 9, dtype=np.uint8)
    la = np.zeros(B, dtype=np.int64)
    lb = np.zeros(B, dtype=np.int64)
    d0 = np.zeros(B, dtype=np.int64)
    for p in range(B):
        la[p] = rng.integers(la_max // 2, la_max + 1)
        d0[p] = rng.integers(0, la[p] - 50)
        seg = a[p, d0[p] : la[p]].copy()
        # substitutions + indels
        keep = rng.random(seg.shape) >= err / 3
        seg = seg[keep]
        noise = rng.random(seg.shape) < err
        seg = np.where(noise, (seg + rng.integers(1, 4, seg.shape)) % 4, seg)
        ins = rng.random(seg.shape) < err / 3
        parts = []
        for i, s in enumerate(seg):
            parts.append(s)
            if ins[i]:
                parts.append(rng.integers(0, 4))
        seg = np.array(parts, dtype=np.uint8)
        tail = rng.integers(0, 4, rng.integers(0, 60))
        full = np.concatenate([seg, tail])[:LB]
        lb[p] = len(full)
        b[p, : len(full)] = full
        a[p, la[p] :] = 9
    return a, b, la, lb, d0


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    for trial in range(60):
        a, b, la, lb, d0 = random_overlap_case(
            rng, B=6, la_max=300, err=[0.02, 0.1, 0.25][trial % 3]
        )
        m1 = myers_banded_np(a, b, la, lb, d0)
        m2 = blockband_dp_np(a, b, la, lb, d0)
        for i, (x, y) in enumerate(zip(m1, m2)):
            assert np.array_equal(x, y), (trial, i, np.asarray(x), np.asarray(y))
    print("myers == blockband oracle: 60 trials OK")
