"""Myers bit-vector block-banded overlap backend.

Replaces the per-cell banded DP (extend.dp_core / the Pallas scan kernels)
on the throughput-critical extend stage: 32 DP cells live in ONE uint32
word, one DP column costs ~17 bitwise VPU ops per word instead of ~30 ops
per CELL — the round-2 speed-of-light push (SURVEY.md §8.3 item 3,
ROOFLINE.md).  Same engine contract as extend.banded_overlap_batch:
ExtendResult(a_start, a_end, b_start=0, b_end, diffs, win_cost).

Reference: phasm/overlap :: DALIGNER stage (SURVEY.md §3.2).  Algorithm:
Myers' bit-parallel approximate matching (JACM 1999), generalized to a
block-quantized moving band (validated prototype: scripts/myers_proto2.py):

  * the band is K uint32 words (K = ceil((W+63)/32) + 1) anchored at
    row 32*m0 (m0 = (d0 - W/2)//32 - 1, may be NEGATIVE) and advancing
    one word every 32 columns at the SAME columns for every pair — the
    per-pair seed diagonal is folded into the Peq anchoring, so a batched
    kernel is 100% elementwise (no per-lane gathers or shift decisions).
    Coverage: the uniform window strictly contains the +-W/2 diagonal
    band at every column, with >= 1 word of top margin (edge cells only
    see the +1 boundary and would clip a path riding them).
  * phantom rows i < 0 behave as always-mismatch free starts; every
    phantom column advance costs exactly +1 (same as the row-0
    horizontal), so they are provably value-preserving for real rows —
    they only pad the window at array edges.  Masks exclude them from
    endpoints and the band-min statistic.
  * the score at row la is carried INCREMENTALLY from the pre-shift
    Ph/Mh horizontal-delta bits; s_top/s_bot likewise (popcounts only at
    the 1-in-32 shift columns), so per-column work stays O(K) words.
  * shifts are per-pair gated by activity, so each pair's band state
    FREEZES at its own lb; one post-loop extraction (at the closed-form
    frozen block (lb-1)//32) replaces per-column final-column scans.
  * a_start is recovered by a REVERSE pass over the reversed consumed
    prefixes, anchored at the chosen endpoint (free start -> anchored
    end).  Its window is placed from the forward window's diagonal
    interval (see rev_anchor), guaranteeing cost_rev <= cost_fwd; ties
    break toward the smallest start.
  * the windowed-divergence statistic (extend.WINDOW, two offset grids)
    is the band minimum extracted at mark columns only (1 in 128).

Semantics are defined by the scalar oracle ``myers_oracle`` below; the
jnp core must match it bit-exactly (tests/test_myers.py property suite),
per the repo-wide oracle invariant.

Tie-breaks (differ from the W-band oracle, which tracks starts in-band):
  endpoint: lexicographic (cost, -(i_end + j_end), j_end)
  start   : (cost_rev, smallest i0)
  reported diffs = cost_rev (<= forward cost: the reverse window covers
  a superset of the forward window's paths to the endpoint).
"""
from __future__ import annotations

import numpy as np

from phasm_tpu.overlap.extend import BIG, WINDOW, ExtendResult

WB = 32
MBIG = 1 << 28  # invalid sentinel (costs can legitimately exceed extend.BIG)


def K_of(W: int) -> int:
    """Words per window: +63 absorbs anchor/phase quantization, +1 word of
    top margin keeps the +-W/2 band strictly interior."""
    return -(-(W + 63) // WB) + 1


def fwd_anchor(d0, W: int):
    """m0: the pair's window anchor block (row 32*m0; may be negative)."""
    return (d0 - W // 2) // WB - 1


def rev_anchor(i_end, j_end, d0, W: int):
    """Reverse-window anchor block m0r.

    Forward path positions satisfy i - j in [base - 31, base + 32K]
    (base = 32 * m0_fwd), so reverse diagonals i' - j' = dc - (i - j)
    (dc = i_end - j_end) lie in [dc - base - 32K, dc - base + 31];
    anchoring one margin word below the floor with K' = K + 5 words keeps
    the whole forward window strictly interior."""
    Kf = K_of(W)
    base = WB * fwd_anchor(d0, W)
    return ((i_end - j_end) - base - WB * Kf) // WB - 1


def rev_K(W: int) -> int:
    """Reverse-window width: K_of + 3 words.

    Containment argument (rev_anchor): forward diagonals span
    32*(K_of + 1) bits; the reverse range adds <= 31 bits of floor
    quantization plus the one anchor margin word below the floor — so
    K_of + 3 words strictly contain every forward-window path, and the
    reverse pass can neither miss a min-cost path nor an equal-cost
    smaller-start tie.  Round 2 shipped K_of + 5 (two spare words =
    +25% reverse-kernel work); the tightening was validated bit-identical
    against K_of + 5 on ~20k fuzz pairs incl. adversarial d0/lb extremes
    (round 4)."""
    return K_of(W) + 3


# ---------------------------------------------------------------------------
# scalar oracle (normative semantics; small inputs only)
# ---------------------------------------------------------------------------


def _blockband_dp(a, b, la, lb, K, m0, init_prev, want_marks):
    """Shared scalar block-band DP.  init_prev: row values at j=0 for window
    rows m0*WB + [0, K*WB].  Returns (final prev, final m, la_track, marks)
    where la_track[j] = D[la, j+1] when la is in-window else None, and
    marks[jj] = band min at mark column jj (rows masked to [0, la])."""
    n = K * WB + 1
    m = m0
    prev = init_prev.copy()
    la_track: list = []
    marks: dict = {}
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
        if m * WB <= la <= m * WB + K * WB:
            la_track.append(int(prev[la - m * WB]))
        else:
            la_track.append(None)
        if want_marks and (j + 1) % (WINDOW // 2) == 0:
            rows = m * WB + np.arange(n)
            valid = (rows >= 0) & (rows <= la)
            marks[j + 1] = int(prev[valid].min()) if valid.any() else MBIG
    return prev, m, la_track, marks


def myers_fwd_oracle(a, b, d0, W):
    """Returns (cost, i_end, j_end, win_cost); cost == MBIG when no valid
    endpoint exists.  Endpoint key: (cost, -(i_end + j_end), j_end)."""
    la, lb = len(a), len(b)
    K = K_of(W)
    m0 = fwd_anchor(d0, W)
    n = K * WB + 1
    prev, m, la_track, marks = _blockband_dp(
        a, b, la, lb, K, m0, np.zeros(n, dtype=np.int64), True
    )
    best = (MBIG, 0, 0)
    best_out = (int(MBIG), 0, 0)
    for j, c in enumerate(la_track):
        if c is not None:
            key = (c, -(la + j + 1), j + 1)
            if key < best:
                best, best_out = key, (c, la, j + 1)
    for t in range(n):
        i = m * WB + t
        if 0 <= i <= la:
            c = int(prev[t])
            key = (c, -(i + lb), lb)
            if key < best:
                best, best_out = key, (c, i, lb)
    # windowed statistic from the band-min marks (two offset grids)
    win_cap = min(lb, la - d0 - W // 2)
    wprev = wmax = wprev2 = wmax2 = 0
    for jj in sorted(marks):
        bm = marks[jj]
        in_cap = jj <= win_cap
        if jj % WINDOW == 0:
            if in_cap:
                wmax = max(wmax, bm - wprev)
            wprev = bm
        else:
            if in_cap and jj != WINDOW // 2:
                wmax2 = max(wmax2, bm - wprev2)
            wprev2 = bm
    return best_out + (max(wmax, wmax2),)


def myers_rev_oracle(a, b, i_end, j_end, d0, W):
    """Start recovery: (cost_rev, i0).  Anchored-end DP over reversed
    prefixes; phantom rows i' < 0 initialized to |i'| (never below any
    real value).  Tie-break: smallest i0 (largest reverse row)."""
    if j_end == 0:
        return 0, i_end
    ar = np.asarray(a[:i_end][::-1])
    br = np.asarray(b[:j_end][::-1])
    K = rev_K(W)
    m0 = int(rev_anchor(i_end, j_end, d0, W))
    n = K * WB + 1
    init = np.abs(m0 * WB + np.arange(n, dtype=np.int64))
    prev, m, _, _ = _blockband_dp(ar, br, len(ar), len(br), K, m0, init, False)
    best = (MBIG, 0)
    for t in range(n):
        i = m * WB + t
        if 0 <= i <= len(ar):
            key = (int(prev[t]), -i)
            if key < best:
                best = key
    cost, negi = best
    return cost, i_end - (-negi)


def myers_oracle(a, b, d0, W):
    """Full contract: (a_start, a_end, b_start=0, b_end, diffs, win_cost)."""
    c, ie, je, win = myers_fwd_oracle(a, b, d0, W)
    if c >= MBIG:
        return (0, 0, 0, 0, int(BIG), 0)
    rc, i0 = myers_rev_oracle(a, b, ie, je, d0, W)
    return (int(i0), int(ie), 0, int(je), int(rc), int(win))


# ---------------------------------------------------------------------------
# jnp implementation (traceable; CPU tests + TPU production path)
# ---------------------------------------------------------------------------


def _word_step(Eq, Pv, Mv, hp, hn):
    """One Myers word update (uint32).  hp/hn are 0/1 horizontal carries.
    Returns (VP', VN', Ph_shifted, Mh_shifted, hout_pos, hout_neg)."""
    import jax.numpy as jnp

    u1, u31 = jnp.uint32(1), jnp.uint32(31)
    Xv = Eq | Mv
    Eq2 = Eq | hn
    Xh = (((Eq2 & Pv) + Pv) ^ Pv) | Eq2
    Ph = Mv | ~(Xh | Pv)
    Mh = Pv & Xh
    hout_p = Ph >> u31
    hout_n = Mh >> u31
    Ph = (Ph << u1) | hp
    Mh = (Mh << u1) | hn
    VP = Mh | ~(Xv | Ph)
    VN = Ph & Xv
    return VP, VN, Ph, Mh, hout_p, hout_n


def _pack_bits(bits):
    """bits [..., 32] bool -> uint32 word (bit t = bits[..., t])."""
    import jax.numpy as jnp

    t = jnp.arange(WB, dtype=jnp.uint32)
    return (bits.astype(jnp.uint32) << t).sum(axis=-1).astype(jnp.uint32)


def _build_peq(win, NBLK):
    """win [B, NBLK*32] codes (PAD >= 4) -> peq [NBLK, 4, B] uint32.

    Layout matters on TPU: the pack runs in [NBLK, WB, B] (pairs on lanes,
    the 32 word bits on sublanes) so the shift is elementwise and the
    reduction is a sublane op.  The naive [B, NBLK, 32] orientation put the
    32-bit axis on lanes (quarter-filled) and reduced ACROSS lanes — it was
    ~20x slower and dominated the whole myers_pallas production path."""
    import jax.numpy as jnp

    winT = win.T.reshape(NBLK, WB, -1)  # [NBLK, 32, B]
    t = jnp.arange(WB, dtype=jnp.uint32)[None, :, None]
    return jnp.stack(
        [
            ((winT == c).astype(jnp.uint32) << t).sum(
                axis=1, dtype=jnp.uint32
            )
            for c in range(4)
        ],
        axis=1,
    )  # [NBLK, 4, B]


def _eq_select(e4, bj, zero_u):
    import jax.numpy as jnp

    return jnp.where(
        bj == 0, e4[0],
        jnp.where(bj == 1, e4[1],
                  jnp.where(bj == 2, e4[2],
                            jnp.where(bj == 3, e4[3], zero_u))),
    )


def _band_runs(VP, VN, s_top, K):
    """Row values below the anchor from the band words: runs [K*32, B],
    runs[r] = (value at rel row anchor + r + 1) via a bit prefix-sum."""
    import jax.numpy as jnp

    t = jnp.arange(WB, dtype=jnp.uint32)
    vp = jnp.stack(VP)  # [K, B]
    vn = jnp.stack(VN)
    bp = ((vp[:, None, :] >> t[None, :, None]) & jnp.uint32(1)).astype(
        jnp.int32
    )
    bn = ((vn[:, None, :] >> t[None, :, None]) & jnp.uint32(1)).astype(
        jnp.int32
    )
    delta = (bp - bn).reshape(K * WB, -1)
    return s_top[None, :] + jnp.cumsum(delta, axis=0)


def myers_fwd_core(peq, b2T, la_rel, la, lb, d0, W: int):
    """Forward pass (traceable).  peq [NBLK, 4, B] uint32 (window-anchored
    match masks); b2T [J, B] int32 codes (>=4 never matches);
    la_rel = la - 32*m0.  Returns (cost, iend_rel, jend, win) int32 [B] —
    iend_rel in anchor-relative rows (add 32*m0 outside)."""
    import jax
    import jax.numpy as jnp

    K = K_of(W)
    J, B = b2T.shape
    NB = J // WB
    assert J % WB == 0 and J % (WINDOW // 2) == 0, "jmax must be 128-aligned"

    u32 = jnp.uint32
    zero = jnp.zeros((B,), jnp.int32)
    zero_u = jnp.zeros((B,), u32)
    all1_u = jnp.full((B,), 0xFFFFFFFF, u32)

    win_cap = jnp.minimum(lb, la - d0 - W // 2)
    kla = jnp.maximum(la_rel - 1, 0) // WB  # absolute word index of row la
    tla = (jnp.maximum(la_rel - 1, 0) % WB).astype(u32)
    neg_floor = la_rel - la  # rel row r is absolute row r - neg_floor

    def consider(state, cost, iend_rel, jend, mask):
        bc, bn, bi, bj = state
        negsum = -(iend_rel + jend)
        better = mask & ((cost < bc) | ((cost == bc) & (negsum < bn)))
        return (
            jnp.where(better, cost, bc),
            jnp.where(better, negsum, bn),
            jnp.where(better, iend_rel, bi),
            jnp.where(better, jend, bj),
        )

    def block_body(blk, carry):
        (VP, VN, s_top, s_bot, s_la, below, state,
         wprev, wmax, wprev2, wmax2) = carry

        # --- contiguous per-block tensor slices (no per-lane gathers) ---
        pq = jax.lax.dynamic_slice_in_dim(peq, blk, K, axis=0)  # [K, 4, B]
        bb = jax.lax.dynamic_slice_in_dim(b2T, blk * WB, WB, axis=0)

        kla_rel = kla - blk  # word slot containing row la this block
        in_win = (la_rel >= blk * WB) & (la_rel <= (blk + K) * WB) & ~below

        def col_step(cc, xs):
            VP, VN, s_top, s_bot, s_la, state = cc
            bj, u = xs
            j = blk * WB + u
            active = j < lb
            hp = jnp.where(active, u32(1), u32(0))
            hn = zero_u
            dla = zero
            nVP, nVN = [], []
            for k in range(K):
                Eq = _eq_select(pq[k], bj, zero_u)
                vpk, vnk, Ph, Mh, hp2, hn2 = _word_step(
                    Eq, VP[k], VN[k], hp, hn
                )
                # horizontal delta at row la: pre-shift bit tla is post-shift
                # bit tla+1 (tla < 31) or the carry-out (tla == 31)
                pre_p = jnp.where(
                    tla < WB - 1, (Ph >> (tla + u32(1))) & u32(1), hp2
                )
                pre_n = jnp.where(
                    tla < WB - 1, (Mh >> (tla + u32(1))) & u32(1), hn2
                )
                dla = jnp.where(
                    kla_rel == k,
                    pre_p.astype(jnp.int32) - pre_n.astype(jnp.int32),
                    dla,
                )
                nVP.append(jnp.where(active, vpk, VP[k]))
                nVN.append(jnp.where(active, vnk, VN[k]))
                hp = jnp.where(active, hp2, zero_u)
                hn = jnp.where(active, hn2, zero_u)
            s_top = s_top + jnp.where(active, 1, 0)
            s_bot = s_bot + jnp.where(
                active, hp.astype(jnp.int32) - hn.astype(jnp.int32), 0
            )
            dla = jnp.where(la_rel == blk * WB, 1, dla)  # la == anchor row
            upd = active & in_win
            s_la = s_la + jnp.where(upd, dla, 0)
            state = consider(state, s_la, la_rel, j + 1, upd & (s_la < MBIG))
            return (tuple(nVP), tuple(nVN), s_top, s_bot, s_la, state), None

        (VP, VN, s_top, s_bot, s_la, state), _ = jax.lax.scan(
            col_step, (VP, VN, s_top, s_bot, s_la, state),
            (bb, jnp.arange(WB, dtype=jnp.int32)),
        )

        # --- windowed band-min marks at jj = (blk+1)*32, every 4th block ---
        def do_marks(ms):
            wprev, wmax, wprev2, wmax2 = ms
            anchor_ok = (blk * WB >= neg_floor) & (blk * WB <= la_rel)
            runs = _band_runs(VP, VN, s_top, K)  # [K*32, B]
            rel = blk * WB + 1 + jnp.arange(K * WB, dtype=jnp.int32)[:, None]
            ok = (rel >= neg_floor[None, :]) & (rel <= la_rel[None, :])
            bm = jnp.where(ok, runs, MBIG).min(axis=0)
            bm = jnp.minimum(bm, jnp.where(anchor_ok, s_top, MBIG))
            jj = (blk + 1) * WB
            in_cap = jj <= win_cap
            g1 = (blk % 8) == 7  # jj % 256 == 0
            first2 = blk == 3  # jj == 128: half-size first span, skip
            wmax = jnp.where(g1 & in_cap, jnp.maximum(wmax, bm - wprev), wmax)
            wprev = jnp.where(g1, bm, wprev)
            wmax2 = jnp.where(
                (~g1) & in_cap & ~first2, jnp.maximum(wmax2, bm - wprev2),
                wmax2,
            )
            wprev2 = jnp.where(~g1, bm, wprev2)
            return wprev, wmax, wprev2, wmax2

        wprev, wmax, wprev2, wmax2 = jax.lax.cond(
            (blk % 4) == 3, do_marks, lambda ms: ms,
            (wprev, wmax, wprev2, wmax2),
        )

        # --- uniform shift at block END (the shift of block blk+1 hoisted
        # here; per-pair gated so each band freezes at its own lb).  The
        # shift-at-start form's `(blk > 0) &` conjunct is MISCOMPILED by
        # XLA-TPU in the rev core (true at blk == 0, hardware only); both
        # cores use the end form so neither carries the fragile pattern.
        # For lb > J pairs this performs one extra final shift the start
        # form didn't; their extraction is gated off by reached_end, so
        # outputs are unchanged (oracle suites + TPU cross-check). ---
        act_s = (blk + 1) * WB < lb
        d_top = (
            jax.lax.population_count(VP[0]).astype(jnp.int32)
            - jax.lax.population_count(VN[0]).astype(jnp.int32)
        )
        s_top = jnp.where(act_s, s_top + d_top, s_top)
        VP = tuple(
            jnp.where(act_s, VP[k + 1], VP[k]) for k in range(K - 1)
        ) + (jnp.where(act_s, all1_u, VP[K - 1]),)
        VN = tuple(
            jnp.where(act_s, VN[k + 1], VN[k]) for k in range(K - 1)
        ) + (jnp.where(act_s, zero_u, VN[K - 1]),)
        s_bot = jnp.where(act_s, s_bot + WB, s_bot)
        # la enters through the new bottom word: D[bot - x] = D[bot] - x
        enter = below & act_s & (la_rel <= (blk + 1 + K) * WB)
        s_la = jnp.where(enter, s_bot - ((blk + 1 + K) * WB - la_rel), s_la)
        below = below & ~enter

        return (VP, VN, s_top, s_bot, s_la, below, state,
                wprev, wmax, wprev2, wmax2)

    below0 = la_rel > K * WB
    s_la0 = jnp.where((la_rel >= 0) & (la_rel <= K * WB), 0, MBIG).astype(
        jnp.int32
    )
    state0 = (zero + MBIG, zero + (1 << 30), zero, zero)
    carry = (
        tuple(zero_u for _ in range(K)), tuple(zero_u for _ in range(K)),
        zero, zero, s_la0, below0, state0, zero, zero, zero, zero,
    )
    carry = jax.lax.fori_loop(0, NB, block_body, carry)
    (VP, VN, s_top, s_bot, s_la, below, state,
     wprev, wmax, wprev2, wmax2) = carry

    # --- final-column extraction from each pair's frozen band state ---
    # Candidates resolve ties by (cost, negsum) alone: distinct rows have
    # distinct negsum at the fixed final column, so the reduction is exact.
    # Pairs with lb > J never reach their final column inside this bucket
    # (engine buckets by NEEDED columns: the i == la endpoint fits, the
    # j == lb endpoint may not) — gate their extraction off entirely.
    reached_end = lb <= J
    m_fr = jnp.minimum(jnp.maximum(lb - 1, 0) // WB, NB - 1)
    anchor_rel = m_fr * WB
    runs = _band_runs(VP, VN, s_top, K)  # [K*32, B]
    rel = anchor_rel[None, :] + 1 + jnp.arange(K * WB, dtype=jnp.int32)[:, None]
    rel = jnp.concatenate([anchor_rel[None, :], rel], axis=0)
    vals = jnp.concatenate([s_top[None, :], runs], axis=0)
    ok = (rel >= neg_floor[None, :]) & (rel <= la_rel[None, :])
    costs = jnp.where(ok, vals, MBIG)
    m1 = costs.min(axis=0)
    negsum = -(rel + lb[None, :])
    m2 = jnp.where(costs == m1[None, :], negsum, 1 << 30).min(axis=0)
    iend_fin = -m2 - lb
    state = consider(state, m1, iend_fin, lb, (m1 < MBIG) & reached_end)

    bc, bn, bi, bj = state
    return bc, bi, bj, jnp.maximum(wmax, wmax2)


def myers_rev_core(peq, b2T, row_off, la, lb, W: int):
    """Anchored-end reverse pass (traceable).  peq [NBLKr, 4, B] over the
    reversed consumed a-prefix, anchored at row 32*m0r (row_off = 32*m0r);
    b2T [J, B] reversed consumed b-prefix codes; la = i_end, lb = j_end.
    Returns (cost_rev, best_row_abs) — i0 = i_end - best_row_abs."""
    import jax
    import jax.numpy as jnp

    K = rev_K(W)
    J, B = b2T.shape
    NB = J // WB

    u32 = jnp.uint32
    zero_u = jnp.zeros((B,), u32)
    all1_u = jnp.full((B,), 0xFFFFFFFF, u32)

    # anchored-start init: D[row, 0] = |row| (phantom rows count down to the
    # free row 0); VP bit where the next row is > 0, VN where it is <= 0
    offs = jnp.arange(K * WB, dtype=jnp.int32).reshape(K, WB)
    nxt_row = row_off[None, None, :] + offs[:, :, None] + 1  # [K, 32, B]
    VP0 = tuple(_pack_bits(jnp.transpose(nxt_row[k] > 0)) for k in range(K))
    VN0 = tuple(_pack_bits(jnp.transpose(nxt_row[k] <= 0)) for k in range(K))
    s_top0 = jnp.abs(row_off)

    def block_body(blk, carry):
        VP, VN, s_top = carry
        pq = jax.lax.dynamic_slice_in_dim(peq, blk, K, axis=0)
        bb = jax.lax.dynamic_slice_in_dim(b2T, blk * WB, WB, axis=0)

        def col_step(cc, xs):
            VP, VN, s_top = cc
            bj, u = xs
            active = (blk * WB + u) < lb
            hp = jnp.where(active, u32(1), u32(0))
            hn = zero_u
            nVP, nVN = [], []
            for k in range(K):
                Eq = _eq_select(pq[k], bj, zero_u)
                vpk, vnk, _, _, hp2, hn2 = _word_step(Eq, VP[k], VN[k], hp, hn)
                nVP.append(jnp.where(active, vpk, VP[k]))
                nVN.append(jnp.where(active, vnk, VN[k]))
                hp = jnp.where(active, hp2, zero_u)
                hn = jnp.where(active, hn2, zero_u)
            s_top = s_top + jnp.where(active, 1, 0)
            return (tuple(nVP), tuple(nVN), s_top), None

        (VP, VN, s_top), _ = jax.lax.scan(
            col_step, (VP, VN, s_top),
            (bb, jnp.arange(WB, dtype=jnp.int32)),
        )

        # --- uniform shift at block END (shift of block blk+1 hoisted here;
        # per-pair gated so each band freezes at its own lb).  The
        # shift-at-start form needed a `(blk > 0) &` conjunct whose first
        # iteration XLA-TPU MISCOMPILED (evaluated true at blk == 0, adding
        # a spurious d_top: uniform +32 cost on every pair, TPU only —
        # interpret mode and CPU were bit-exact).  Shift-at-end expresses
        # the same schedule with no first-iteration special case.  At the
        # final block the gate is (NB*WB < lb) = (J < lb) = False, matching
        # the original's no-shift-after-last-block.
        act_s = (blk + 1) * WB < lb
        d_top = (
            jax.lax.population_count(VP[0]).astype(jnp.int32)
            - jax.lax.population_count(VN[0]).astype(jnp.int32)
        )
        s_top = jnp.where(act_s, s_top + d_top, s_top)
        VP = tuple(
            jnp.where(act_s, VP[k + 1], VP[k]) for k in range(K - 1)
        ) + (jnp.where(act_s, all1_u, VP[K - 1]),)
        VN = tuple(
            jnp.where(act_s, VN[k + 1], VN[k]) for k in range(K - 1)
        ) + (jnp.where(act_s, zero_u, VN[K - 1]),)
        return VP, VN, s_top

    VP, VN, s_top = jax.lax.fori_loop(0, NB, block_body, (VP0, VN0, s_top0))

    # frozen-state extraction: min cost, tie -> LARGEST reverse row
    m_fr = jnp.maximum(lb - 1, 0) // WB
    runs = _band_runs(VP, VN, s_top, K)
    rel = m_fr[None, :] * WB + 1 + jnp.arange(K * WB, dtype=jnp.int32)[:, None]
    rel = jnp.concatenate([(m_fr * WB)[None, :], rel], axis=0)
    vals = jnp.concatenate([s_top[None, :], runs], axis=0)
    row_abs = rel + row_off[None, :]
    ok = (row_abs >= 0) & (row_abs <= la[None, :])
    costs = jnp.where(ok, vals, MBIG)
    bc = costs.min(axis=0)
    br = jnp.where(costs == bc[None, :], row_abs, -(1 << 30)).max(axis=0)
    return bc, br


def _fwd_prep(a_rows, b_rows, la, lb, d0, W: int, J: int):
    """Forward window construction (shared by the jnp and Pallas cores).

    Returns (peq_f [NBLK, 4, B] uint32, b2T [J, B], la_rel [B], m0 [B])."""
    import jax
    import jax.numpy as jnp

    LA = a_rows.shape[1]
    PAD = jnp.asarray(4, a_rows.dtype)
    Kf = K_of(W)
    NBLK = J // WB + Kf
    R = NBLK * WB
    m0 = fwd_anchor(d0, W)
    # front pad = R: if the clamp at -R binds, NO window row is a valid
    # a-index (absr = m0*32 + q < 0 for all q < R), so the explicit
    # validity mask below PADs the whole (misaligned) slice anyway
    start_f = jnp.clip(m0 * WB, -R, LA) + R
    a_pad = jnp.pad(a_rows, ((0, 0), (R, R)), constant_values=4)

    def slc(row, s):
        return jax.lax.dynamic_slice(row, (s,), (R,))

    win_f = jax.vmap(slc)(a_pad, start_f)
    # validity: absolute row index in [0, la)
    q = jnp.arange(R, dtype=jnp.int32)[None, :]
    absr = m0[:, None] * WB + q
    win_f = jnp.where((absr >= 0) & (absr < la[:, None]), win_f, PAD)
    peq_f = _build_peq(win_f, NBLK)

    jcol = jnp.arange(J, dtype=jnp.int32)[:, None]
    LB = b_rows.shape[1]
    b_src = b_rows[:, :J].T if LB >= J else jnp.pad(
        b_rows, ((0, 0), (0, J - LB)), constant_values=4
    ).T[:J]
    b2T = jnp.where(jcol < lb[None, :], b_src, PAD)
    la_rel = la - m0 * WB
    return peq_f, b2T, la_rel, m0


def _rev_prep(a_rows, b_rows, la, lb, iend, jend, d0, W: int, J: int):
    """Reverse window construction over the reversed consumed prefixes.

    Returns (peq_r [NBLKr, 4, B] uint32, b2T_r [J, B], row_off [B])."""
    import jax
    import jax.numpy as jnp

    LA = a_rows.shape[1]
    PAD = jnp.asarray(4, a_rows.dtype)
    Kr = rev_K(W)
    NBLKr = J // WB + Kr
    Rr = NBLKr * WB
    m0r = rev_anchor(iend, jend, d0, W)
    a_flip = jnp.flip(
        jnp.where(jnp.arange(LA)[None, :] < la[:, None], a_rows, PAD), axis=1
    )
    # arw[p, q] = a[p, iend-1 - (m0r*32 + q)] = a_flip[p, LA - iend + m0r*32 + q]
    start_r = jnp.clip(LA - iend + m0r * WB, -Rr, LA) + Rr
    af_pad = jnp.pad(a_flip, ((0, 0), (Rr, Rr)), constant_values=4)

    def slcr(row, s):
        return jax.lax.dynamic_slice(row, (s,), (Rr,))

    win_r = jax.vmap(slcr)(af_pad, start_r)
    qr = jnp.arange(Rr, dtype=jnp.int32)[None, :]
    absrr = m0r[:, None] * WB + qr  # reverse 0-based char index
    win_r = jnp.where((absrr >= 0) & (absrr < iend[:, None]), win_r, PAD)
    peq_r = _build_peq(win_r, NBLKr)

    # brw[p, j] = b[p, jend-1-j] = b_flip[p, LB - jend + j]
    jcol = jnp.arange(J, dtype=jnp.int32)[:, None]
    b_msk = jnp.where(
        jnp.arange(b_rows.shape[1])[None, :] < lb[:, None], b_rows, PAD
    )
    b_flip = jnp.pad(
        jnp.flip(b_msk, axis=1), ((0, 0), (0, J)), constant_values=4
    )

    def slcb(row, s):
        return jax.lax.dynamic_slice(row, (s,), (J,))

    brw = jax.vmap(slcb)(b_flip, b_rows.shape[1] - jend)
    b2T_r = jnp.where(jcol < jend[None, :], brw.T, PAD)
    return peq_r, b2T_r, m0r * WB


# ---------------------------------------------------------------------------
# Table-driven window construction ("fast prep", round 3).
#
# The round-2 bisect showed the per-pair window gathers are the wall: a
# vmapped dynamic_slice costs ~1.6 us PER ROW on TPU regardless of width or
# dtype (XLA lowers per-row-offset gathers to a serialized loop), so the
# three window chains (fwd peq, rev peq, rev b) burned ~81 ms per 16k-pair
# batch against 12.7 ms of kernel time.  The fix: precompute whole-read peq
# words and packed code words ONCE per oriented matrix, then build each
# pair's window with a LOGARITHMIC BARREL SHIFT (static shifted copies
# selected by the bits of the per-pair offset) plus one bit-level funnel
# combine — pure elementwise VPU work, no gathers beyond one contiguous
# row gather per table.  Bit-exact with _fwd_prep/_rev_prep through the
# kernels (tests/test_myers_pallas.py::test_tab_prep_*).
# ---------------------------------------------------------------------------

F_TAB = 16  # table front-pad words.  Bounds (property-tested):
# fwd shift s = m0 + F_TAB with m0 >= -2 for any d0 >= 0.  rev word offset
# q0 = (LA - iend + 32*m0r + 32*F_TAB)//32 >= 0 because any valid endpoint
# satisfies iend >= base + jend - 31 (the window contains the endpoint) and
# la <= LA, which gives off = LA - iend + 32*m0r >= -(32*K_of(W) + 94) —
# so F_TAB >= K_of(W) + 4 suffices; 16 covers W <= 256 with margin (wider
# bands never reach the myers kernels: DeviceExtender.MYERS_MAX_BAND).


def table_words(LA: int) -> tuple[int, int]:
    """(PW, BW): peq words and packed-b words per table row for width LA."""
    PW = F_TAB + (LA + WB - 1) // WB + 2
    BW = (LA + 15) // 16 + 2
    return PW, BW


def build_myers_tables(oriented, lengths):
    """Whole-read window tables (traceable; built once per oriented matrix).

    oriented [n_o, LA] uint8 codes (row 2r = read r forward, 2r+1 revcomp);
    lengths [n_reads] int32.  Returns dict:
      peq [n_o, 8, PW] uint32 — planes 0..3: forward peq (bit t of word w:
          a[32*(w - F_TAB) + t] == c, zero outside [0, la)); planes 4..7:
          the same over flip rows flip[f] = a[LA-1-f] (zero where the flip
          position falls outside the real read);
      bpk [n_o, 2, BW] int32 — 2-bit packed codes, 16/word: plane 0 forward
          (garbage beyond la — consumers gate j < lb), plane 1 flip rows.
    """
    import jax.numpy as jnp

    n_o, LA = oriented.shape
    PW, BW = table_words(LA)
    la_row = lengths[jnp.arange(n_o) // 2]
    pos = jnp.arange(LA, dtype=jnp.int32)[None, :]
    PAD = jnp.asarray(4, oriented.dtype)
    masked = jnp.where(pos < la_row[:, None], oriented, PAD)
    flip = jnp.flip(masked, axis=1)  # flip[f] = a[LA-1-f], PAD off-read

    def peq_rows(rows):
        # [n_o, L] codes -> [n_o, 4, PW] uint32 with F_TAB front zero words
        w = jnp.pad(
            rows, ((0, 0), (F_TAB * WB, (PW - F_TAB) * WB - LA)),
            constant_values=4,
        )
        return jnp.transpose(_build_peq(w, PW), (2, 1, 0))  # [n_o, 4, PW]

    peq = jnp.concatenate([peq_rows(masked), peq_rows(flip)], axis=1)

    def pack_rows(rows):
        # [n_o, L] codes -> [n_o, BW] int32 (2 bits/code, 16/word)
        import jax

        w = jnp.pad(rows, ((0, 0), (0, BW * 16 - LA)))
        v = (w.astype(jnp.uint32) & 3).reshape(n_o, BW, 16)
        sh = (2 * jnp.arange(16, dtype=jnp.uint32))[None, None, :]
        return jax.lax.bitcast_convert_type(
            (v << sh).sum(axis=2, dtype=jnp.uint32), jnp.int32
        )

    bpk = jnp.stack([pack_rows(masked), pack_rows(flip)], axis=1)
    return {"peq": peq, "bpk": bpk}


def shift_words(x, s):
    """Barrel shift along axis 0: out[w] = x[w + s] (zeros shifted in), with
    per-pair non-negative s varying on the LAST axis.  log2(PW) levels of
    static shifted copies + elementwise selects — no gather."""
    import jax.numpy as jnp

    n = x.shape[0]
    zero_like = jnp.zeros_like
    bcast = (None,) * (x.ndim - 1)
    for j in range((max(n - 1, 1)).bit_length()):
        step = 1 << j
        if step >= n:
            break
        shifted = jnp.concatenate([x[step:], zero_like(x[:step])], axis=0)
        bit = ((s >> j) & 1) == 1
        x = jnp.where(bit[bcast], shifted, x)
    return x


def funnel_bits(x, delta):
    """out[w] = (x[w] >> delta) | (x[w+1] << (32 - delta)) on uint32 words
    (axis 0), per-pair delta in [0, 32) on the last axis.  Output has one
    fewer word than x."""
    import jax.numpy as jnp

    d = delta.astype(jnp.uint32)[(None,) * (x.ndim - 1)]
    lo = x[:-1] >> d
    hi_sh = (jnp.uint32(32) - d) % jnp.uint32(32)
    hi = jnp.where(d == 0, jnp.uint32(0), x[1:] << hi_sh)
    return lo | hi


def fwd_prep_tab(peqT, bpkT, la, d0, W: int, J: int):
    """Forward window from transposed table rows.

    peqT [PW, 8, B] uint32 (this pair-batch's gathered tables, transposed);
    bpkT [BW, 2, B] int32.  Returns (peq_f [NBLK, 4, B], bpk_f [J/16, B],
    la_rel, m0) — bit-identical consumption to _fwd_prep + _pack_b for the
    Pallas kernels (garbage at gated positions may differ; kernels gate)."""
    import jax.numpy as jnp

    Kf = K_of(W)
    NBLK = J // WB + Kf
    m0 = fwd_anchor(d0, W)
    x = shift_words(peqT[:, 0:4, :], m0 + F_TAB)
    if x.shape[0] < NBLK:
        x = jnp.pad(x, ((0, NBLK - x.shape[0]), (0, 0), (0, 0)))
    peq_f = x[:NBLK]
    JW = J // 16
    b = bpkT[:, 0, :]
    if b.shape[0] < JW:
        b = jnp.pad(b, ((0, JW - b.shape[0]), (0, 0)))
    return peq_f, b[:JW], la - m0 * WB, m0


def rev_prep_tab(peqT, bpkT, LA: int, iend, jend, d0, W: int, J: int):
    """Reverse window (anchored-end start recovery) from transposed tables.

    Window word k bit t = flip-row peq bit at off + 32k + t where
    off = (LA - iend) + 32*m0r — an ARBITRARY bit offset (iend is not
    32-aligned), realized as word barrel shift + one bit funnel.  Rows
    absrr < 0 (below the reversed prefix) are whole words k < -m0r, zeroed.
    Returns (peq_r [NBLKr, 4, B], bpk_r [J/16, B], row_off)."""
    import jax
    import jax.numpy as jnp

    Kr = rev_K(W)
    NBLKr = J // WB + Kr
    m0r = rev_anchor(iend, jend, d0, W)
    obit = (LA - iend) + m0r * WB + F_TAB * WB
    q0 = obit // WB
    delta = obit % WB
    x = shift_words(peqT[:, 4:8, :], q0)
    if x.shape[0] < NBLKr + 1:
        x = jnp.pad(x, ((0, NBLKr + 1 - x.shape[0]), (0, 0), (0, 0)))
    peq_r = funnel_bits(x[: NBLKr + 1], delta)
    # zero whole words below the reversed prefix (absrr < 0 <=> k < -m0r)
    k_idx = jnp.arange(NBLKr, dtype=jnp.int32)[:, None, None]
    peq_r = jnp.where(k_idx < (-m0r)[None, None, :], jnp.uint32(0), peq_r)

    # packed reversed-b window: code j = flip-b code at cb + j, cb = LA - jend
    cb = LA - jend
    q0b = cb // 16
    db = (2 * (cb % 16)).astype(jnp.uint32)
    bx = jax.lax.bitcast_convert_type(
        shift_words(bpkT[:, 1, :], q0b), jnp.uint32
    )
    JW = J // 16
    if bx.shape[0] < JW + 1:
        bx = jnp.pad(bx, ((0, JW + 1 - bx.shape[0]), (0, 0)))
    bpk_r = jax.lax.bitcast_convert_type(
        funnel_bits(bx[: JW + 1], db), jnp.int32
    )
    return peq_r, bpk_r, m0r * WB


# ---------------------------------------------------------------------------
# Blocked window tables (round 4): coarse 32-word fetch blocks + in-kernel
# residual barrel.
#
# The round-3 table path still paid ~14 ms/batch of XLA prep: whole-row
# gathers (a PW-word row per pair when only ~NBLK are consumed) and the
# barrel/funnel networks, each a full HBM round trip.  Round 4 moves the
# shift networks INTO the Pallas kernels (VMEM-resident selects, ~us) and
# shrinks the gathers to per-pair COARSE BLOCKS: the table is stored as
# 32-word blocks addressable by row index, the XLA gather fetches the
# ceil((NBLK + 31)/32) + 1 blocks covering each pair's window (contiguous
# 512-byte rows — the fast gather path; arbitrary-offset slices are not),
# and the kernel barrel-shifts only the RESIDUAL offset (s % 32, 5 select
# levels).  Unlike the in-kernel full-table design, the slab size is
# J-dependent but LA-INDEPENDENT, so it fits VMEM for any read length.
# ---------------------------------------------------------------------------

BK = 32  # table fetch-block size (words); residual barrel = 5 levels


BKB = 128  # packed-b fetch-row size (words); residual barrel = 7 levels


def tab2_geometry(W: int, J: int) -> tuple[int, int, int]:
    """(GF, GR, GB): fetch rows for the fwd peq window, rev peq window,
    and rev packed-b window.  Span = residual + words consumed."""
    gf = -(-(J // WB + K_of(W) + BK - 1) // BK)
    gr = -(-(J // WB + rev_K(W) + 1 + BK - 1) // BK)
    gb = -(-(J // 16 + 1 + BKB - 1) // BKB)
    return gf, gr, gb


JWMAX = 128  # widest packed-b fwd window ever routed to the myers kernels
# (J <= 2048 under the scoped-VMEM gate; J/16 <= 128)

# row-count paddings: the largest J routed to these kernels is 2048
# (W=64) / 1024 (W=128), so GF/GR <= 4 and GB <= 2; +1 slack
_PAD_PEQ_BLOCKS = 5
_PAD_BPK_BLOCKS = 3


def blocked_counts(LA: int) -> tuple[int, int]:
    """(NBb, NBc): per-read fetch-row counts of the blocked tables."""
    PW, BW = table_words(LA)
    return -(-PW // BK) + _PAD_PEQ_BLOCKS, -(-BW // BKB) + _PAD_BPK_BLOCKS


def tab2_offsets(n_o: int, LA: int) -> tuple[int, int, int]:
    """(rev_peq, bpk_f, bpk_r) row offsets inside the combined table."""
    NBb, NBc = blocked_counts(LA)
    return n_o * NBb, 2 * n_o * NBb, 2 * n_o * NBb + n_o


def build_myers_tables_blocked(oriented, lengths):
    """Blocked window tables as ONE combined [N_rows, 128] uint32 array.

    Every fetch unit is a 128-lane row (tile-exact minor dim: no XLA layout
    padding, and ONE gather + ONE relayout per kernel serves peq AND bpk —
    four separate gathers measured ~1.5-2 ms EACH at 16k pairs because XLA
    row gathers are per-index bound, not byte bound).  Row spaces:

      [0, n_o*NBb)            fwd peq blocks: row r*NBb + g holds words
                              [g*BK, (g+1)*BK) of planes 0..3, WORD-MAJOR
                              flat (lane w*4 + c = word g*BK+w, plane c) so
                              the kernel's [G,128,R,128] slab reshapes to
                              [G*BK, 4, R, 128] for free;
      [.., 2*n_o*NBb)         the same over flip rows (rev windows);
      [.., + n_o)             packed fwd b-codes, words [0, JWMAX);
      [.., + n_o*NBc)         packed flip b-codes, BKB-word rows.

    Word contents are identical to build_myers_tables (same F_TAB
    anchoring and masking); only the storage blocking differs.
    """
    import jax
    import jax.numpy as jnp

    n_o, LA = oriented.shape
    PW, BW = table_words(LA)
    NBb, NBc = blocked_counts(LA)
    la_row = lengths[jnp.arange(n_o) // 2]
    pos = jnp.arange(LA, dtype=jnp.int32)[None, :]
    PAD = jnp.asarray(4, oriented.dtype)
    masked = jnp.where(pos < la_row[:, None], oriented, PAD)
    flip = jnp.flip(masked, axis=1)

    def peq_blocks(rows):
        w = jnp.pad(
            rows, ((0, 0), (F_TAB * WB, NBb * BK * WB - F_TAB * WB - LA)),
            constant_values=4,
        )
        p = jnp.transpose(_build_peq(w, NBb * BK), (2, 1, 0))  # [n_o,4,NBb*BK]
        # word-major flat rows: [n_o, NBb, BK, 4] -> [n_o*NBb, BK*4]
        return (
            p.reshape(n_o, 4, NBb, BK)
            .transpose(0, 2, 3, 1)
            .reshape(n_o * NBb, BK * 4)
        )

    def pack_rows(rows, n_words):
        w = jnp.pad(rows, ((0, 0), (0, n_words * 16 - LA)))
        v = (w.astype(jnp.uint32) & 3).reshape(n_o, n_words, 16)
        sh = (2 * jnp.arange(16, dtype=jnp.uint32))[None, None, :]
        return (v << sh).sum(axis=2, dtype=jnp.uint32)

    # fwd packed words: v1 consumers gate j < lb, but words beyond BW must
    # be ZERO to match fwd_prep_tab's zero-pad (bit-exactness of the
    # garbage-tolerant kernels does not require it; cheap anyway)
    nbw = max(JWMAX, BW)
    bpk_f = pack_rows(masked, nbw)[:, :JWMAX]
    if BW < JWMAX:
        wmask = jnp.arange(JWMAX, dtype=jnp.int32)[None, :] < BW
        bpk_f = jnp.where(wmask, bpk_f, jnp.uint32(0))
    bpk_r = pack_rows(flip, NBc * BKB)
    wmask_r = jnp.arange(NBc * BKB, dtype=jnp.int32)[None, :] < BW
    bpk_r = jnp.where(wmask_r, bpk_r, jnp.uint32(0)).reshape(
        n_o * NBc, BKB
    )
    return {
        "win": jnp.concatenate(
            [peq_blocks(masked), peq_blocks(flip), bpk_f, bpk_r], axis=0
        )
    }


def _myers_pair_core(a_rows, b_rows, la, lb, d0, W: int, J: int):
    """Full traceable per-batch compute (fwd + start recovery).

    a_rows [B, LA] / b_rows [B, LB] codes (uint8 or any int dtype) with
    PAD >= 4 beyond the read lengths; la/lb/d0 [B] int32.  Returns
    (cost, i0, iend, jend, win), cost == extend.BIG when no valid endpoint
    (contract of dp_core).  Code tensors stay in their input dtype (uint8
    in production: 4x less HBM traffic for the pad/flip/slice chain)."""
    import jax.numpy as jnp

    peq_f, b2T, la_rel, m0 = _fwd_prep(a_rows, b_rows, la, lb, d0, W, J)
    cost_f, iend_rel, jend, win = myers_fwd_core(
        peq_f, b2T, la_rel, la, lb, d0, W
    )
    iend = iend_rel + m0 * WB

    peq_r, b2T_r, row_off = _rev_prep(
        a_rows, b_rows, la, lb, iend, jend, d0, W, J
    )
    cost_r, best_row = myers_rev_core(peq_r, b2T_r, row_off, iend, jend, W)
    i0 = iend - best_row

    # degenerate jend == 0 (can only happen alongside an invalid forward)
    cost_r = jnp.where(jend == 0, 0, cost_r)
    i0 = jnp.where(jend == 0, iend, i0)

    valid = cost_f < MBIG
    return (
        jnp.where(valid, cost_r, jnp.int32(BIG)),
        jnp.where(valid, i0, 0),
        jnp.where(valid, iend, 0),
        jnp.where(valid, jend, 0),
        jnp.where(valid, win, 0),
    )


def myers_compute(oriented, lengths, a_oid, b_oid, d0, *, W: int, J: int):
    """Traceable HBM-resident entry for DeviceExtender (backend="myers"):
    row-gathers the pair codes from the device-resident oriented matrix and
    runs the pair core.  Output order matches the extender's contract
    (cost, i0, iend, jend, win)."""
    la = lengths[a_oid >> 1]
    lb = lengths[b_oid >> 1]
    a_rows = oriented[a_oid]  # contiguous row gather (uint8)
    b_rows = oriented[b_oid]
    return _myers_pair_core(a_rows, b_rows, la, lb, d0, W, J)


_jit_myers: dict = {}


def _get_jit_myers(W: int, J: int):
    key = (W, J)
    if key not in _jit_myers:
        import jax
        from functools import partial

        _jit_myers[key] = jax.jit(partial(_myers_pair_core, W=W, J=J))
    return _jit_myers[key]


def myers_overlap_batch(
    oriented: np.ndarray,
    lengths: np.ndarray,
    a_oid: np.ndarray,
    b_oid: np.ndarray,
    d0: np.ndarray,
    band: int = 64,
    jmax: int = 4096,
) -> ExtendResult:
    """Batched Myers block-banded overlap — drop-in alternative to
    extend.banded_overlap_batch (same call signature and ExtendResult
    contract; block-band semantics per myers_oracle)."""
    la = lengths[a_oid >> 1].astype(np.int32)
    lb = lengths[b_oid >> 1].astype(np.int32)
    a_rows = oriented[a_oid]
    b_rows = oriented[b_oid]
    run = _get_jit_myers(band, jmax)
    cost, i0, iend, jend, win = run(
        a_rows, b_rows, la, lb, d0.astype(np.int32)
    )
    return ExtendResult(
        a_start=np.asarray(i0),
        a_end=np.asarray(iend),
        b_start=np.zeros_like(np.asarray(i0)),
        b_end=np.asarray(jend),
        diffs=np.asarray(cost),
        win_cost=np.asarray(win),
    )
