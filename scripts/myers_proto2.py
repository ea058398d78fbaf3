"""Prototype 2: UNIFORM-SHIFT block-banded Myers bit-vector overlap DP.

Differences from myers_proto.py (per-pair shift columns):
  * the window anchor advances at the SAME columns for every pair
    (m(j) = m0 + j//32, shift when j % 32 == 0, j > 0) — the per-pair seed
    diagonal d0 is folded into the Peq anchoring (m0 = max(0,
    (d0 - W//2) // 32)), so a batched kernel is 100% elementwise: no
    per-lane gathers, no per-lane shift decisions.  Coverage: K*32 >= W+63
    guarantees the uniform window contains the +-W/2 diagonal band at
    every column.
  * score at row la is maintained INCREMENTALLY from the pre-shift Ph/Mh
    horizontal-delta bits (no per-column popcounts); s_top/s_bot carried
    likewise (popcounts only at 1-in-32 shift columns).
  * windowed band-min extraction at WINDOW/2-column marks (two offset
    grids, matching extend.WINDOW semantics).
  * reverse pass over the reversed consumed prefixes recovers a_start
    (free start -> anchored end), tie-break smallest start.

Output contract per pair: (i0, i_end, 0, j_end, cost, win_cost) with
endpoint tie-break (cost, -(i_end + j_end), j_end) and start tie-break
(cost, smallest i0).  The scalar blockband oracle below defines the
semantics; the bit-vector implementation must match it bit-exactly.
"""
import numpy as np

WB = 32
BIG = 1 << 28
ALL1 = np.uint64(0xFFFFFFFF)
ONE = np.uint64(1)
HIGH = np.uint64(1 << 31)
WINDOW = 256


def K_of(W: int) -> int:
    # +63 absorbs anchor/phase quantization; +1 word of top margin keeps
    # the +-W/2 diagonal band strictly interior (top-edge cells only see
    # the +1 boundary, so a path riding the edge would get clipped)
    return -(-(W + 63) // WB) + 1


def popcnt(x):
    return np.bitwise_count(x).astype(np.int64)


# ---------------------------------------------------------------------------
# scalar oracle: per-cell DP with uniform-shift block-band semantics
# ---------------------------------------------------------------------------


def blockband_fwd_oracle(a, b, d0, W):
    """Returns (cost, i_end, j_end, win_cost, colmins) for one pair.

    m0 may be NEGATIVE: rows i < 0 are phantom (always-mismatch, free
    start 0) — provably value-preserving for the real rows (every phantom
    column advance costs exactly +1, same as the row-0 horizontal), they
    only pad the window so the band never clips at array edges.  Masks
    exclude them from endpoints and the band-min statistic."""
    la, lb = len(a), len(b)
    K = K_of(W)
    m0 = (d0 - W // 2) // WB - 1  # -1: top-margin word (no edge riding)
    n = K * WB + 1  # window rows m*WB .. m*WB + K*WB
    m = m0
    prev = np.zeros(n, dtype=np.int64)  # D[m*WB + t, 0] = 0 (free starts)
    best = (BIG, 0, 0)  # (cost, -(i_end+j_end), j_end) -> decode separately
    best_out = (BIG, 0, 0)
    win_cap = min(lb, la - d0 - W // 2)
    wprev = wmax = 0
    wprev2 = wmax2 = 0
    colmins = []
    for j in range(lb):
        m_want = m0 + j // WB
        while m_want > m:
            nxt = np.empty_like(prev)
            nxt[: n - WB] = prev[WB:]
            for t in range(WB):
                nxt[n - WB + t] = nxt[n - WB - 1] + t + 1
            prev = nxt
            m += 1
        cur = np.empty_like(prev)
        cur[0] = prev[0] + 1  # top boundary: +1 per column
        for t in range(1, n):
            i = m * WB + t
            sub = 1
            if 1 <= i <= la:
                sub = int(a[i - 1] != b[j])
            cur[t] = min(prev[t - 1] + sub, prev[t] + 1, cur[t - 1] + 1)
        prev = cur
        # i == la endpoint
        if m * WB <= la <= m * WB + K * WB:
            c = int(prev[la - m * WB])
            key = (c, -(la + j + 1), j + 1)
            if key < best:
                best = key
                best_out = (c, la, j + 1)
        # j == lb endpoint: all valid rows
        if j + 1 == lb:
            for t in range(n):
                i = m * WB + t
                if 0 <= i <= la:
                    c = int(prev[t])
                    key = (c, -(i + j + 1), j + 1)
                    if key < best:
                        best = key
                        best_out = (c, i, j + 1)
        # windowed band-min probe (two grids, marks every WINDOW//2 cols)
        if (j + 1) % (WINDOW // 2) == 0:
            rows = m * WB + np.arange(n)
            valid = (rows >= 0) & (rows <= la)
            bm = int(prev[valid].min()) if valid.any() else BIG
            colmins.append((j + 1, bm))
            in_cap = (j + 1) <= win_cap
            if (j + 1) % WINDOW == 0:
                if in_cap:
                    wmax = max(wmax, bm - wprev)
                wprev = bm
            else:
                if in_cap and (j + 1) != WINDOW // 2:
                    wmax2 = max(wmax2, bm - wprev2)
                wprev2 = bm
    return best_out + (max(wmax, wmax2), colmins)


def blockband_rev_oracle(a, b, i_end, j_end, d0, W):
    """Start recovery: anchored-end DP over reversed prefixes.
    Returns (cost_rev, i0): minimal cost consuming all of rev(b[:j_end]),
    tie-break smallest i0 (largest reverse row).

    Window placement: the forward path's positions satisfy i - j in
    [base - 31, base + 32K] (base = 32*m0_fwd), so in reverse coordinates
    the diagonals lie in [dc - base - 32K, dc - base + 31] (dc = i_end -
    j_end); anchoring one margin word below that interval's floor with
    K' = K + 5 keeps the whole forward window strictly interior
    (=> cost_rev <= cost_fwd always).  m0 may be negative: phantom rows
    i' < 0 are initialized to |i'| (never below any real value)."""
    if j_end == 0:
        return 0, i_end
    ar = a[:i_end][::-1]
    br = b[:j_end][::-1]
    la, lb = len(ar), len(br)
    Kf = K_of(W)
    base = WB * ((d0 - W // 2) // WB - 1)
    K = Kf + 5
    m0 = ((i_end - j_end) - base - WB * Kf) // WB - 1
    n = K * WB + 1
    m = m0
    # anchored start: D[i', 0] = |i'| (only row 0 is free; phantom |i'|)
    prev = np.abs(m * WB + np.arange(n, dtype=np.int64))
    for j in range(lb):
        m_want = m0 + j // WB
        while m_want > m:
            nxt = np.empty_like(prev)
            nxt[: n - WB] = prev[WB:]
            for t in range(WB):
                nxt[n - WB + t] = nxt[n - WB - 1] + t + 1
            prev = nxt
            m += 1
        cur = np.empty_like(prev)
        cur[0] = prev[0] + 1
        for t in range(1, n):
            i = m * WB + t
            sub = 1
            if 1 <= i <= la:
                sub = int(ar[i - 1] != br[j])
            cur[t] = min(prev[t - 1] + sub, prev[t] + 1, cur[t - 1] + 1)
        prev = cur
    best = (BIG, 0)
    for t in range(n):
        i = m * WB + t
        if 0 <= i <= la:
            key = (int(prev[t]), -i)  # max reverse row = smallest i0
            if key < best:
                best = key
    cost, negi = best
    return cost, i_end - (-negi)


# ---------------------------------------------------------------------------
# bit-vector implementation (vectorized over pairs)
# ---------------------------------------------------------------------------


def build_peq(a, la, m0, K, jmax):
    """Peq[p, blk, base]: bit t set iff a[p, m0*WB + blk*WB + t] == base,
    for absolute char index < la.  NBLK covers jmax columns of window."""
    Bn, LA = a.shape
    NBLK = jmax // WB + K + 1
    peq = np.zeros((Bn, NBLK, 4), dtype=np.uint64)
    for p in range(Bn):
        for blk in range(NBLK):
            lo = (m0[p] + blk) * WB
            for t in range(WB):
                i = lo + t
                if 0 <= i < la[p] and i < LA:
                    peq[p, blk, a[p, i]] |= ONE << np.uint64(t)
    return peq


def myers_fwd(a, b, la, lb, d0, W, jmax=None):
    """Vectorized forward pass.  Returns (cost, i_end, j_end, win_cost)."""
    Bn = a.shape[0]
    if jmax is None:
        jmax = int(lb.max())
    K = K_of(W)
    m0 = (d0 - W // 2) // WB - 1  # may be negative (phantom top rows)
    peq = build_peq(a, la, m0, K, jmax)

    VP = np.zeros((K, Bn), dtype=np.uint64)
    VN = np.zeros((K, Bn), dtype=np.uint64)
    s_top = np.zeros(Bn, dtype=np.int64)  # D[(m0+m)*WB]
    s_bot = np.full(Bn, 0, dtype=np.int64)  # D[(m0+m)*WB + K*WB]
    la_rel = la - m0 * WB  # row la relative to the pair's anchor
    # s_la valid iff la in current window [m*WB, m*WB + K*WB] (m relative)
    in_win0 = (la_rel >= 0) & (la_rel <= K * WB)
    s_la = np.where(in_win0, 0, BIG).astype(np.int64)
    # pairs whose la is BELOW the initial window enter later via s_bot
    below0 = la_rel > K * WB

    best_cost = np.full(Bn, BIG, dtype=np.int64)
    best_negsum = np.full(Bn, 0, dtype=np.int64)
    best_iend = np.zeros(Bn, dtype=np.int64)
    best_jend = np.zeros(Bn, dtype=np.int64)

    win_cap = np.minimum(lb, la - d0 - W // 2)
    wprev = np.zeros(Bn, dtype=np.int64)
    wmax = np.zeros(Bn, dtype=np.int64)
    wprev2 = np.zeros(Bn, dtype=np.int64)
    wmax2 = np.zeros(Bn, dtype=np.int64)

    def consider(cost, iend, jend, mask):
        nonlocal best_cost, best_negsum, best_iend, best_jend
        negsum = -(iend + jend)
        better = mask & (
            (cost < best_cost)
            | ((cost == best_cost) & (negsum < best_negsum))
        )
        best_cost = np.where(better, cost, best_cost)
        best_negsum = np.where(better, negsum, best_negsum)
        best_iend = np.where(better, iend, best_iend)
        best_jend = np.where(better, jend, best_jend)

    def extract_scores(m):
        """D[(m0+m)*WB + 1 .. + K*WB] from s_top + bit prefix sums."""
        out = np.empty((K * WB, Bn), dtype=np.int64)
        run = s_top.copy()
        for k in range(K):
            for t in range(WB):
                run = run + ((VP[k] >> np.uint64(t)) & ONE).astype(np.int64) \
                    - ((VN[k] >> np.uint64(t)) & ONE).astype(np.int64)
                out[k * WB + t] = run
        return out  # row index r -> row (m0+m)*WB + r + 1

    m = 0  # window block offset (uniform across pairs)
    for j in range(jmax):
        active = j < lb
        if j > 0 and j % WB == 0:
            # uniform shift: all pairs advance one block
            s_top = s_top + popcnt(VP[0]) - popcnt(VN[0])
            for k in range(K - 1):
                VP[k] = VP[k + 1]
                VN[k] = VN[k + 1]
            VP[K - 1] = ALL1
            VN[K - 1] = np.uint64(0)
            old_bot = (m + K) * WB
            s_bot = s_bot + WB
            m += 1
            # la enters via the new bottom word: D[bot_old + t] = D[bot_old]+t
            enter = below0 & (la_rel <= (m + K) * WB)
            s_la = np.where(enter, s_bot - ((m + K) * WB - la_rel), s_la)
            below0 = below0 & ~enter

        bj = np.where(active, b[np.arange(Bn), np.minimum(j, b.shape[1] - 1)], 4)
        bj = np.minimum(bj, 4).astype(np.int64)
        hin = np.where(active, 1, 0).astype(np.int64)
        # horizontal delta at row la collected from the word containing it
        dla = np.zeros(Bn, dtype=np.int64)
        kla = (la_rel - 1) // WB - m  # word index containing row la
        tla = np.uint64(0) | np.uint64((la_rel - 1) % WB)
        for k in range(K):
            eq4 = peq[np.arange(Bn), m + k]  # [Bn, 4]
            Eq = np.where(bj < 4, eq4[np.arange(Bn), np.minimum(bj, 3)], 0)
            Eq = Eq.astype(np.uint64)
            Pv, Mv = VP[k], VN[k]
            Xv = Eq | Mv
            Eq2 = Eq | (hin < 0).astype(np.uint64)
            Xh = ((((Eq2 & Pv) + Pv) & ALL1) ^ Pv) | Eq2
            Ph = Mv | (~(Xh | Pv) & ALL1)
            Mh = Pv & Xh
            # horizontal delta at row la (pre-shift bit tla of Ph/Mh)
            sel = (kla == k)
            dla = np.where(
                sel,
                ((Ph >> tla) & ONE).astype(np.int64)
                - ((Mh >> tla) & ONE).astype(np.int64),
                dla,
            )
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
        s_top = s_top + np.where(active, 1, 0)
        s_bot = s_bot + np.where(active, hin, 0)  # hin == hout of last word
        # row la == anchor row (la_rel - 1 < 0 case): delta is the +1 boundary
        dla = np.where(la_rel == m * WB, 1, dla)
        in_win = (la_rel >= m * WB) & (la_rel <= (m + K) * WB) & ~below0
        s_la = np.where(active & in_win, s_la + dla, s_la)

        consider(s_la, la, np.full(Bn, j + 1), active & in_win & (s_la < BIG))

        jj = j + 1
        if jj % (WINDOW // 2) == 0:
            scores = extract_scores(m)  # [K*WB, Bn]
            rows = (m0[None, :] + m) * WB + np.arange(1, K * WB + 1)[:, None]
            sc = np.where((rows >= 0) & (rows <= la[None, :]), scores, BIG)
            anchor_ok = ((m0 + m) * WB >= 0) & ((m0 + m) * WB <= la)
            bm = np.minimum(sc.min(axis=0), np.where(anchor_ok, s_top, BIG))
            in_cap = jj <= win_cap
            if jj % WINDOW == 0:
                wmax = np.where(in_cap, np.maximum(wmax, bm - wprev), wmax)
                wprev = bm
            else:
                ok = in_cap & (jj != WINDOW // 2)
                wmax2 = np.where(ok, np.maximum(wmax2, bm - wprev2), wmax2)
                wprev2 = bm

        # j == lb endpoint for pairs finishing this column
        fin = (jj == lb)
        if fin.any():
            scores = extract_scores(m)
            rows_rel = m * WB + np.arange(1, K * WB + 1)[:, None]  # la_rel space
            abs_rows = m0[None, :] * WB + rows_rel
            sc = np.where(
                (abs_rows >= 0) & (rows_rel <= la_rel[None, :]), scores, BIG
            )
            # include the anchor row (t=0) via s_top
            for r in range(K * WB):
                consider(sc[r], abs_rows[r], np.full(Bn, jj),
                         fin & (sc[r] < BIG))
            anchor_ok = fin & (m * WB <= la_rel) & ((m0 + m) * WB >= 0)
            consider(s_top, (m0 + m) * WB, np.full(Bn, jj),
                     anchor_ok & (s_top < BIG))

    return best_cost, best_iend, best_jend, np.maximum(wmax, wmax2)


def myers_rev(a, b, i_end, j_end, d0, W):
    """Vectorized start recovery (anchored-end, reversed prefixes).
    See blockband_rev_oracle for the window-placement derivation."""
    Bn = a.shape[0]
    Kf = K_of(W)
    K = Kf + 5
    jmax = int(j_end.max()) if Bn else 0
    base = WB * ((d0 - W // 2) // WB - 1)
    m0 = ((i_end - j_end) - base - WB * Kf) // WB - 1
    # reversed prefix tensors
    LA = int(i_end.max())
    LB = max(jmax, 1)
    ar = np.full((Bn, max(LA, 1)), 9, dtype=np.uint8)
    br = np.full((Bn, LB), 9, dtype=np.uint8)
    for p in range(Bn):
        ar[p, : i_end[p]] = a[p, : i_end[p]][::-1]
        br[p, : j_end[p]] = b[p, : j_end[p]][::-1]
    la = i_end
    lb = j_end
    peq = build_peq(ar, la, m0, K, max(jmax, WB))

    # anchored start D[i', 0] = |i'|: VP bit where the next row is > 0,
    # VN bit where it is <= 0 (phantom rows count down toward the anchor)
    VP = np.zeros((K, Bn), dtype=np.uint64)
    VN = np.zeros((K, Bn), dtype=np.uint64)
    for k in range(K):
        for t in range(WB):
            nxt_row = m0 * WB + k * WB + t + 1
            bit = ONE << np.uint64(t)
            VP[k] |= np.where(nxt_row > 0, bit, np.uint64(0))
            VN[k] |= np.where(nxt_row <= 0, bit, np.uint64(0))
    s_top = np.abs(m0 * WB).astype(np.int64)
    best_c = np.full(Bn, BIG, dtype=np.int64)
    best_r = np.full(Bn, -1, dtype=np.int64)
    # pairs with j_end == 0: start == end (degenerate)
    done0 = lb == 0
    best_c = np.where(done0, 0, best_c)
    best_r = np.where(done0, 0, best_r)
    m = 0
    for j in range(jmax):
        active = j < lb
        if j > 0 and j % WB == 0:
            s_top = s_top + popcnt(VP[0]) - popcnt(VN[0])
            for k in range(K - 1):
                VP[k] = VP[k + 1]
                VN[k] = VN[k + 1]
            VP[K - 1] = ALL1
            VN[K - 1] = np.uint64(0)
            m += 1
        bj = np.where(active, br[np.arange(Bn), np.minimum(j, LB - 1)], 9)
        hin = np.where(active, 1, 0).astype(np.int64)
        for k in range(K):
            eq4 = peq[np.arange(Bn), m + k]
            Eq = np.where(bj < 4, eq4[np.arange(Bn), np.minimum(bj, 3)], 0)
            Eq = Eq.astype(np.uint64)
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
        s_top = s_top + np.where(active, 1, 0)

        # pairs finishing this column: min cost, tie -> max reverse row
        fin = (j + 1) == lb
        if fin.any():
            anchor_row = (m0 + m) * WB
            ok0 = fin & (anchor_row >= 0) & (anchor_row <= la)
            best_c = np.where(ok0, s_top, best_c)
            best_r = np.where(ok0, anchor_row, best_r)
            run = s_top.copy()
            for k in range(K):
                for t in range(WB):
                    run = run + ((VP[k] >> np.uint64(t)) & ONE).astype(
                        np.int64
                    ) - ((VN[k] >> np.uint64(t)) & ONE).astype(np.int64)
                    row = anchor_row + k * WB + t + 1
                    ok = fin & (row >= 0) & (row <= la)
                    better = ok & (
                        (run < best_c) | ((run == best_c) & (row > best_r))
                    )
                    best_c = np.where(better, run, best_c)
                    best_r = np.where(better, row, best_r)
    i0 = i_end - best_r
    return best_c, i0


# ---------------------------------------------------------------------------
# validation
# ---------------------------------------------------------------------------


def random_overlap_case(rng, B=8, la_max=400, err=0.1):
    LA = la_max
    LB = la_max + 80
    a = np.full((B, LA), 9, dtype=np.uint8)
    b = np.full((B, LB), 9, dtype=np.uint8)
    la = np.zeros(B, dtype=np.int64)
    lb = np.zeros(B, dtype=np.int64)
    d0 = np.zeros(B, dtype=np.int64)
    for p in range(B):
        la[p] = rng.integers(la_max // 2, la_max + 1)
        aa = rng.integers(0, 4, la[p]).astype(np.uint8)
        a[p, : la[p]] = aa
        d0[p] = rng.integers(0, la[p] - 50)
        seg = aa[d0[p] :].copy()
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
    return a, b, la, lb, d0


if __name__ == "__main__":
    rng = np.random.default_rng(7)
    n_mismatch = 0
    for trial in range(40):
        W = [64, 128][trial % 2]
        a, b, la, lb, d0 = random_overlap_case(
            rng, B=6, la_max=360, err=[0.02, 0.1, 0.22][trial % 3]
        )
        cost, iend, jend, win = myers_fwd(a, b, la, lb, d0, W)
        for p in range(a.shape[0]):
            oc, oi, oj, ow, _ = blockband_fwd_oracle(
                a[p, : la[p]], b[p, : lb[p]], int(d0[p]), W
            )
            got = (int(cost[p]), int(iend[p]), int(jend[p]), int(win[p]))
            want = (oc, oi, oj, ow)
            assert got == want, (trial, p, got, want)
        # reverse/start recovery
        rc, i0 = myers_rev(a, b, iend, jend, d0, W)
        for p in range(a.shape[0]):
            orc, oi0 = blockband_rev_oracle(
                a[p, : la[p]], b[p, : lb[p]], int(iend[p]), int(jend[p]),
                int(d0[p]), W,
            )
            got = (int(rc[p]), int(i0[p]))
            assert got == (orc, oi0), (trial, p, got, (orc, oi0))
            assert rc[p] <= cost[p] + 0, (trial, p, rc[p], cost[p])
    print("uniform-shift myers == blockband oracle: 40 trials OK")
