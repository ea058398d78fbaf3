"""Pallas TPU kernels for the Myers bit-vector block-band backend.

Bit-exact reimplementation of ``myers.myers_fwd_core`` / ``myers_rev_core``
with the whole block loop inside ONE Pallas kernel: the K band words live
as (8, 128)-tile uint32 registers over a 1024-pair block, columns are an
in-kernel ``fori_loop``, and the only HBM traffic per pair block is the
BlockSpec-pipelined peq / packed-b streams plus 4 int32 outputs per pair.

Why (ROOFLINE.md §2.2): the jnp core measured 0.55x the cell-per-lane
Pallas kernel because XLA schedules the ~K*25 *dependent* [B]-vector ops
per column through ``lax.scan`` state instead of keeping them register-
resident; only a Pallas kernel can express the layout that makes
bit-vector DP fast on a VPU.  Semantics are pinned by ``myers.myers_oracle``
(the normative scalar oracle) through the equality suite in
tests/test_myers_pallas.py — interpret-mode vs the jnp cores, bit-exact.

Reference: phasm/overlap :: DALIGNER stage (SURVEY.md §3.2) — beyond-
reference speed-of-light push (SURVEY.md §8.3 item 3).

Layout contract (host side, see ``myers_pallas_pair_core``):
  * B pairs reshaped to [B/128, 128]; one grid step owns 8 rows (1024
    pairs) so every in-kernel value is a whole number of (8, 128) tiles.
  * peq  [NBLK, 4, B/128, 128] uint32 — window-anchored match masks.
  * bpk  [J/16, B/128, 128] int32 — b codes 2-bit packed, 16 per word
    (codes are &3 on pack; columns j >= lb are gated off by ``active``
    inside the kernel exactly like the jnp core, so PAD codes never
    reach live state).
"""
from __future__ import annotations

from phasm_tpu.overlap.myers import (
    MBIG,
    WB,
    K_of,
    rev_K,
)

BLK_ROWS = 8  # minimum pair-block rows (8 sublanes x 128 lanes = 1024 pairs)
VMEM_BUDGET = 14 << 20  # scoped-VMEM budget for kernel streams (v5e: 16 MB
# scoped limit minus headroom for outputs and the compiler's own stack)


def kernel_vmem_bytes(W: int, J: int, R: int | None = None) -> int:
    """Scoped-VMEM footprint estimate for the worse of the fwd/rev kernels.

    Each grid step streams the peq [NBLK, 4, 8, 128] u32 and bpk
    [J/16, 8, 128] i32 blocks through double-buffered VMEM windows (x2).
    The (8, 128) scalar tiles and outputs are noise next to these.  Used by
    DeviceExtender to route (W, J) combos that exceed the scoped limit to
    the segmented W-band kernels instead (a J=12288 rung OOM'd at 18.2 MB
    vs the 16 MB scoped limit on v5e — LADDER r3 c3)."""
    if R is None:
        R = blk_rows(W, J)
    tile = R * 128 * 4
    nblk = J // WB + rev_K(W)  # rev_K > K_of: the rev kernel dominates
    return 2 * (nblk * 4 + J // 16) * tile


def blk_rows(W: int, J: int) -> int:
    """Pair-block rows per grid step: 16 when the streams fit scoped VMEM.

    The Myers word-step is one long DEPENDENT bitwise chain; with 8 rows
    (one (8, 128) tile per vector op) the VPU stalls on op latency.  At 16
    rows every op covers two tiles, so the hardware pipelines consecutive
    tiles through the same instruction and the dependent chains overlap —
    measured 1.54x kernel-only on the driver workload (8.3 -> 5.4 ms per
    16k-pair batch, round 4).  32 rows measured no better than 16."""
    return 16 if kernel_vmem_bytes(W, J, 16) <= VMEM_BUDGET else 8


def _popcount32(v):
    """SWAR popcount on uint32 (8,128) tiles — no multiply, no lowering
    dependence on lax.population_count inside Mosaic."""
    import jax.numpy as jnp

    u = jnp.uint32
    v = v - ((v >> u(1)) & u(0x55555555))
    v = (v & u(0x33333333)) + ((v >> u(2)) & u(0x33333333))
    v = (v + (v >> u(4))) & u(0x0F0F0F0F)
    v = v + (v >> u(8))
    v = (v + (v >> u(16))) & u(0x3F)
    return v.astype(jnp.int32)


def _word_step(Eq, Pv, Mv, hp, hn):
    """One Myers word update (identical math to myers._word_step)."""
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


def _band_min_scan(VP, VN, s_top, base_rel, lo, hi, K: int):
    """min over the band rows of this frozen state, masked to rel rows in
    [lo, hi]: row base_rel has value s_top, rows base_rel+1+q follow the
    VP/VN bit prefix-sum (q = k*32 + t)."""
    import jax
    import jax.numpy as jnp

    anchor_ok = (base_rel >= lo) & (base_rel <= hi)
    bm = jnp.where(anchor_ok, s_top, MBIG)
    val = s_top
    for k in range(K):
        def tbody(t, c, _k=k):
            val, bm = c
            tu = t.astype(jnp.uint32)
            bp = ((VP[_k] >> tu) & jnp.uint32(1)).astype(jnp.int32)
            bn = ((VN[_k] >> tu) & jnp.uint32(1)).astype(jnp.int32)
            val = val + bp - bn
            rel = base_rel + 1 + _k * WB + t
            ok = (rel >= lo) & (rel <= hi)
            return val, jnp.minimum(bm, jnp.where(ok, val, MBIG))

        val, bm = jax.lax.fori_loop(0, WB, tbody, (val, bm))
    return bm


def _make_myers_fwd(W: int, J: int, interpret: bool = False,
                    R: int = BLK_ROWS):
    """Forward kernel factory.  Returns run(la_rel2, la2, lb2, peq, bpk)
    -> (cost2, iend_rel2, jend2, win2), all [B/128, 128] int32."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from phasm_tpu.overlap.extend import WINDOW

    K = K_of(W)
    NB = J // WB
    NBLK = NB + K
    JW = J // 16
    assert J % WB == 0 and J % (WINDOW // 2) == 0

    def kernel(la_rel_ref, la_ref, lb_ref, d0_ref, peq_ref, bpk_ref,
               cost_ref, iend_ref, jend_ref, win_ref):
        u32 = jnp.uint32
        la_rel = la_rel_ref[:]
        la = la_ref[:]
        lb = lb_ref[:]
        d0 = d0_ref[:]
        zero = jnp.zeros((R, 128), jnp.int32)
        zero_u = jnp.zeros((R, 128), u32)
        all1_u = jnp.full((R, 128), 0xFFFFFFFF, u32)

        win_cap = jnp.minimum(lb, la - d0 - W // 2)
        kla = jnp.maximum(la_rel - 1, 0) // WB
        tla = (jnp.maximum(la_rel - 1, 0) % WB).astype(u32)
        neg_floor = la_rel - la

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
            # below_i is carried as int32 0/1: Mosaic cannot lay out i1
            # vectors in scf loop carries (internal error on TPU lowering)
            (VP, VN, s_top, s_bot, s_la, below_i, state,
             wprev, wmax, wprev2, wmax2) = carry
            below = below_i != 0

            # --- uniform shift at block start (skip blk 0), per-pair gated
            # so each pair's band freezes at its own lb ---
            act_s = (blk > 0) & (blk * WB < lb)
            d_top = _popcount32(VP[0]) - _popcount32(VN[0])
            s_top = jnp.where(act_s, s_top + d_top, s_top)
            VP = tuple(
                jnp.where(act_s, VP[k + 1], VP[k]) for k in range(K - 1)
            ) + (jnp.where(act_s, all1_u, VP[K - 1]),)
            VN = tuple(
                jnp.where(act_s, VN[k + 1], VN[k]) for k in range(K - 1)
            ) + (jnp.where(act_s, zero_u, VN[K - 1]),)
            s_bot = jnp.where(act_s, s_bot + WB, s_bot)
            enter = below & act_s & (la_rel <= (blk + K) * WB)
            s_la = jnp.where(enter, s_bot - ((blk + K) * WB - la_rel), s_la)
            below_i = jnp.where(enter, 0, below_i)
            below = below & ~enter

            # match masks for this block's K words: [4, R, 128] each
            pq = [peq_ref[blk + k] for k in range(K)]
            # the block's 32 columns span exactly 2 packed-b words
            bw0 = bpk_ref[blk * 2]
            bw1 = bpk_ref[blk * 2 + 1]

            kla_rel = kla - blk
            in_win = (la_rel >= blk * WB) & (la_rel <= (blk + K) * WB) & ~below

            def col_step(u, cc):
                VP, VN, s_top, s_bot, s_la, state = cc
                j = blk * WB + u
                bw = jnp.where(u < 16, bw0, bw1)
                bj = (bw >> (2 * (u % 16))) & 3
                active = j < lb
                hp = jnp.where(active, u32(1), u32(0))
                hn = zero_u
                dla = zero
                nVP, nVN = [], []
                for k in range(K):
                    e = pq[k]
                    Eq = jnp.where(
                        bj == 0, e[0],
                        jnp.where(bj == 1, e[1],
                                  jnp.where(bj == 2, e[2], e[3])),
                    )
                    vpk, vnk, Ph, Mh, hp2, hn2 = _word_step(
                        Eq, VP[k], VN[k], hp, hn
                    )
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
                dla = jnp.where(la_rel == blk * WB, 1, dla)
                upd = active & in_win
                s_la = s_la + jnp.where(upd, dla, 0)
                state = consider(
                    state, s_la, la_rel, j + 1, upd & (s_la < MBIG)
                )
                return (tuple(nVP), tuple(nVN), s_top, s_bot, s_la, state)

            VP, VN, s_top, s_bot, s_la, state = jax.lax.fori_loop(
                0, WB, col_step, (VP, VN, s_top, s_bot, s_la, state)
            )

            # --- windowed band-min marks at jj = (blk+1)*32, every 4th
            # block (same grids as the jnp core) ---
            def do_marks(ms):
                wprev, wmax, wprev2, wmax2 = ms
                bm = _band_min_scan(
                    VP, VN, s_top, blk * WB, neg_floor, la_rel, K
                )
                jj = (blk + 1) * WB
                in_cap = jj <= win_cap
                g1 = (blk % 8) == 7  # jj % 256 == 0
                first2 = blk == 3    # jj == 128: half-size first span
                wmax = jnp.where(
                    g1 & in_cap, jnp.maximum(wmax, bm - wprev), wmax
                )
                wprev = jnp.where(g1, bm, wprev)
                wmax2 = jnp.where(
                    (~g1) & in_cap & ~first2,
                    jnp.maximum(wmax2, bm - wprev2), wmax2,
                )
                wprev2 = jnp.where(~g1, bm, wprev2)
                return wprev, wmax, wprev2, wmax2

            wprev, wmax, wprev2, wmax2 = jax.lax.cond(
                (blk % 4) == 3, do_marks, lambda ms: ms,
                (wprev, wmax, wprev2, wmax2),
            )

            return (VP, VN, s_top, s_bot, s_la, below_i, state,
                    wprev, wmax, wprev2, wmax2)

        below0 = (la_rel > K * WB).astype(jnp.int32)
        s_la0 = jnp.where(
            (la_rel >= 0) & (la_rel <= K * WB), 0, MBIG
        ).astype(jnp.int32)
        state0 = (zero + MBIG, zero + (1 << 30), zero, zero)
        carry = (
            tuple(zero_u for _ in range(K)), tuple(zero_u for _ in range(K)),
            zero, zero, s_la0, below0, state0, zero, zero, zero, zero,
        )
        carry = jax.lax.fori_loop(0, NB, block_body, carry)
        (VP, VN, s_top, s_bot, s_la, below_i, state,
         wprev, wmax, wprev2, wmax2) = carry

        # --- final-column extraction from each pair's frozen band state:
        # sequential lexicographic (cost, negsum) considers == the jnp
        # core's two-pass min (distinct rows -> distinct negsum at the
        # fixed final column) ---
        reached_end = lb <= J
        m_fr = jnp.minimum(jnp.maximum(lb - 1, 0) // WB, NB - 1)
        base_rel = m_fr * WB
        ok0 = (base_rel >= neg_floor) & (base_rel <= la_rel)
        c0 = jnp.where(ok0, s_top, MBIG)
        state = consider(state, c0, base_rel, lb, (c0 < MBIG) & reached_end)
        val = s_top
        for k in range(K):
            def tbody(t, c, _k=k):
                val, state = c
                tu = t.astype(u32)
                bp = ((VP[_k] >> tu) & u32(1)).astype(jnp.int32)
                bn = ((VN[_k] >> tu) & u32(1)).astype(jnp.int32)
                val = val + bp - bn
                rel = base_rel + 1 + _k * WB + t
                ok = (rel >= neg_floor) & (rel <= la_rel)
                cc = jnp.where(ok, val, MBIG)
                state = consider(
                    state, cc, rel, lb, (cc < MBIG) & reached_end
                )
                return val, state

            val, state = jax.lax.fori_loop(0, WB, tbody, (val, state))

        bc, bn_, bi, bj = state
        cost_ref[:] = bc
        iend_ref[:] = bi
        jend_ref[:] = bj
        win_ref[:] = jnp.maximum(wmax, wmax2)

    def run(la_rel2, la2, lb2, d02, peq, bpk):
        Bq = la_rel2.shape[0]
        grid = (Bq // R,)
        o = jax.ShapeDtypeStruct((Bq, 128), jnp.int32)
        s2 = pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                s2, s2, s2, s2,
                pl.BlockSpec(
                    (NBLK, 4, R, 128), lambda i: (0, 0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (JW, R, 128), lambda i: (0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=(s2, s2, s2, s2),
            out_shape=(o, o, o, o),
            cost_estimate=pl.CostEstimate(
                flops=Bq * 128 * J * K * 30, bytes_accessed=peq.size * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(la_rel2, la2, lb2, d02, peq, bpk)

    return run


def _make_myers_rev(W: int, J: int, interpret: bool = False,
                    R: int = BLK_ROWS):
    """Reverse (anchored-end start recovery) kernel factory.  Returns
    run(row_off2, la2, lb2, peq_r, bpk_r) -> (cost2, best_row2) int32."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = rev_K(W)
    NB = J // WB
    NBLK = NB + K
    JW = J // 16

    def kernel(row_off_ref, la_ref, lb_ref, peq_ref, bpk_ref,
               cost_ref, row_ref):
        u32 = jnp.uint32
        row_off = row_off_ref[:]
        la = la_ref[:]
        lb = lb_ref[:]
        zero_u = jnp.zeros((R, 128), u32)
        all1_u = jnp.full((R, 128), 0xFFFFFFFF, u32)

        # anchored-start init: D[row, 0] = |row|; VP bit where the next row
        # value is > 0, VN where it is <= 0
        VP0, VN0 = [], []
        for k in range(K):
            def tbody(t, c, _k=k):
                vp, vn = c
                nxt = row_off + _k * WB + t + 1
                tu = t.astype(u32)
                vp = vp | (jnp.where(nxt > 0, u32(1), u32(0)) << tu)
                vn = vn | (jnp.where(nxt <= 0, u32(1), u32(0)) << tu)
                return vp, vn

            vp, vn = jax.lax.fori_loop(0, WB, tbody, (zero_u, zero_u))
            VP0.append(vp)
            VN0.append(vn)
        s_top0 = jnp.abs(row_off)

        def block_body(blk, carry):
            VP, VN, s_top = carry
            act_s = (blk > 0) & (blk * WB < lb)
            d_top = _popcount32(VP[0]) - _popcount32(VN[0])
            s_top = jnp.where(act_s, s_top + d_top, s_top)
            VP = tuple(
                jnp.where(act_s, VP[k + 1], VP[k]) for k in range(K - 1)
            ) + (jnp.where(act_s, all1_u, VP[K - 1]),)
            VN = tuple(
                jnp.where(act_s, VN[k + 1], VN[k]) for k in range(K - 1)
            ) + (jnp.where(act_s, zero_u, VN[K - 1]),)

            pq = [peq_ref[blk + k] for k in range(K)]

            bw0 = bpk_ref[blk * 2]
            bw1 = bpk_ref[blk * 2 + 1]

            def col_step(u, cc):
                VP, VN, s_top = cc
                j = blk * WB + u
                bw = jnp.where(u < 16, bw0, bw1)
                bj = (bw >> (2 * (u % 16))) & 3
                active = j < lb
                hp = jnp.where(active, u32(1), u32(0))
                hn = zero_u
                nVP, nVN = [], []
                for k in range(K):
                    e = pq[k]
                    Eq = jnp.where(
                        bj == 0, e[0],
                        jnp.where(bj == 1, e[1],
                                  jnp.where(bj == 2, e[2], e[3])),
                    )
                    vpk, vnk, _, _, hp2, hn2 = _word_step(
                        Eq, VP[k], VN[k], hp, hn
                    )
                    nVP.append(jnp.where(active, vpk, VP[k]))
                    nVN.append(jnp.where(active, vnk, VN[k]))
                    hp = jnp.where(active, hp2, zero_u)
                    hn = jnp.where(active, hn2, zero_u)
                s_top = s_top + jnp.where(active, 1, 0)
                return (tuple(nVP), tuple(nVN), s_top)

            return jax.lax.fori_loop(0, WB, col_step, (VP, VN, s_top))

        VP, VN, s_top = jax.lax.fori_loop(
            0, NB, block_body, (tuple(VP0), tuple(VN0), s_top0)
        )

        # frozen-state extraction: min cost, tie -> LARGEST reverse row
        m_fr = jnp.maximum(lb - 1, 0) // WB
        base_rel = m_fr * WB
        row0 = base_rel + row_off
        ok0 = (row0 >= 0) & (row0 <= la)
        bc = jnp.where(ok0, s_top, MBIG)
        br = jnp.where(ok0, row0, -(1 << 30))
        val = s_top
        for k in range(K):
            def tbody(t, c, _k=k):
                val, bc, br = c
                tu = t.astype(u32)
                bp = ((VP[_k] >> tu) & u32(1)).astype(jnp.int32)
                bn = ((VN[_k] >> tu) & u32(1)).astype(jnp.int32)
                val = val + bp - bn
                row = base_rel + 1 + _k * WB + t + row_off
                ok = (row >= 0) & (row <= la)
                cc = jnp.where(ok, val, MBIG)
                better = (cc < bc) | ((cc == bc) & (row > br))
                bc = jnp.where(better, cc, bc)
                br = jnp.where(better, row, br)
                return val, bc, br

            val, bc, br = jax.lax.fori_loop(0, WB, tbody, (val, bc, br))

        cost_ref[:] = bc
        row_ref[:] = br

    def run(row_off2, la2, lb2, peq, bpk):
        Bq = row_off2.shape[0]
        grid = (Bq // R,)
        o = jax.ShapeDtypeStruct((Bq, 128), jnp.int32)
        s2 = pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                s2, s2, s2,
                pl.BlockSpec(
                    (NBLK, 4, R, 128), lambda i: (0, 0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (JW, R, 128), lambda i: (0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=(s2, s2),
            out_shape=(o, o),
            cost_estimate=pl.CostEstimate(
                flops=Bq * 128 * J * K * 30, bytes_accessed=peq.size * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(row_off2, la2, lb2, peq, bpk)

    return run


def _pack_b(b2T):
    """b2T [J, B] codes -> [J/16, B] int32, 16 codes x 2 bits per word.
    PAD codes (>= 4) lose their high bits — safe: columns j >= lb are gated
    off by ``active`` in-kernel, identical to the jnp core's masking."""
    import jax.numpy as jnp

    import jax

    J, B = b2T.shape
    w = (b2T.astype(jnp.uint32) & 3).reshape(J // 16, 16, B)
    sh = (2 * jnp.arange(16, dtype=jnp.uint32))[None, :, None]
    return jax.lax.bitcast_convert_type((w << sh).sum(axis=1), jnp.int32)


def _q(x):
    """[..., B] -> [..., B/128, 128] (pair axis to sublane x lane)."""
    return x.reshape(*x.shape[:-1], x.shape[-1] // 128, 128)


def myers_pallas_pair_core(
    a_rows, b_rows, la, lb, d0, W: int, J: int, interpret: bool = False
):
    """Drop-in replacement for myers._myers_pair_core with both cores as
    Pallas kernels.  Pads B in-trace to the (W, J)-chosen pair-block."""
    import jax.numpy as jnp

    from phasm_tpu.overlap.extend import BIG
    from phasm_tpu.overlap.myers import _fwd_prep, _rev_prep

    R = blk_rows(W, J)
    B0 = a_rows.shape[0]
    B = -(-B0 // (R * 128)) * (R * 128)
    if B != B0:
        a_rows = jnp.pad(jnp.asarray(a_rows), ((0, B - B0), (0, 0)),
                         constant_values=4)
        b_rows = jnp.pad(jnp.asarray(b_rows), ((0, B - B0), (0, 0)),
                         constant_values=4)
        la = jnp.pad(jnp.asarray(la), (0, B - B0), constant_values=1)
        lb = jnp.pad(jnp.asarray(lb), (0, B - B0))
        d0 = jnp.pad(jnp.asarray(d0), (0, B - B0))

    peq_f, b2T, la_rel, m0 = _fwd_prep(a_rows, b_rows, la, lb, d0, W, J)
    fwd = _get_fwd(W, J, interpret, R)
    cost_f, iend_rel, jend, win = [
        x.reshape(B)
        for x in fwd(
            _q(la_rel), _q(la), _q(lb), _q(d0), _q(peq_f), _q(_pack_b(b2T))
        )
    ]
    iend = iend_rel + m0 * WB

    peq_r, b2T_r, row_off = _rev_prep(
        a_rows, b_rows, la, lb, iend, jend, d0, W, J
    )
    rev = _get_rev(W, J, interpret, R)
    cost_r, best_row = [
        x.reshape(B)
        for x in rev(
            _q(row_off), _q(iend), _q(jend), _q(peq_r), _q(_pack_b(b2T_r))
        )
    ]
    i0 = iend - best_row

    cost_r = jnp.where(jend == 0, 0, cost_r)
    i0 = jnp.where(jend == 0, iend, i0)
    valid = cost_f < MBIG
    return (
        jnp.where(valid, cost_r, jnp.int32(BIG))[:B0],
        jnp.where(valid, i0, 0)[:B0],
        jnp.where(valid, iend, 0)[:B0],
        jnp.where(valid, jend, 0)[:B0],
        jnp.where(valid, win, 0)[:B0],
    )


_FWD: dict = {}
_REV: dict = {}


def _get_fwd(W: int, J: int, interpret: bool, R: int | None = None):
    if R is None:
        R = blk_rows(W, J)
    key = (W, J, interpret, R)
    if key not in _FWD:
        _FWD[key] = _make_myers_fwd(W, J, interpret, R)
    return _FWD[key]


def _get_rev(W: int, J: int, interpret: bool, R: int | None = None):
    if R is None:
        R = blk_rows(W, J)
    key = (W, J, interpret, R)
    if key not in _REV:
        _REV[key] = _make_myers_rev(W, J, interpret, R)
    return _REV[key]


def myers_pallas_compute(
    oriented, lengths, a_oid, b_oid, d0, *, W: int, J: int,
    interpret: bool = False,
):
    """Traceable HBM-resident entry for DeviceExtender
    (backend="myers_pallas"): same contract as myers.myers_compute."""
    la = lengths[a_oid >> 1]
    lb = lengths[b_oid >> 1]
    a_rows = oriented[a_oid]
    b_rows = oriented[b_oid]
    return myers_pallas_pair_core(
        a_rows, b_rows, la, lb, d0, W, J, interpret
    )


def myers_pallas_compute_tab(
    peq_tab, bpk_tab, lengths, a_oid, b_oid, d0, *, LA: int, W: int, J: int,
    interpret: bool = False,
):
    """Table-driven production entry (round 3): windows built from the
    precomputed whole-read tables (myers.build_myers_tables) via barrel
    shift + funnel — no per-pair-offset gathers, no byte-level row gathers.
    Bit-identical outputs to myers_pallas_compute (tested); the only
    remaining per-pair data movement is one contiguous row gather per
    table.  LA is the static oriented-matrix width the tables were built
    from."""
    import jax.numpy as jnp

    from phasm_tpu.overlap.extend import BIG
    from phasm_tpu.overlap.myers import fwd_prep_tab, rev_prep_tab

    R = blk_rows(W, J)
    B0 = a_oid.shape[0]
    # mesh shards can fall below the pair-block size: pad in-trace with
    # benign oid-0 pairs, slice the outputs back
    B = -(-B0 // (R * 128)) * (R * 128)
    if B != B0:
        a_oid = jnp.pad(a_oid, (0, B - B0))
        b_oid = jnp.pad(b_oid, (0, B - B0))
        d0 = jnp.pad(d0, (0, B - B0))
    la = lengths[a_oid >> 1]
    lb = lengths[b_oid >> 1]
    peqT = jnp.transpose(peq_tab[a_oid], (2, 1, 0))  # [PW, 8, B]
    bpkT = jnp.transpose(bpk_tab[b_oid], (2, 1, 0))  # [BW, 2, B]

    peq_f, bpk_f, la_rel, m0 = fwd_prep_tab(peqT, bpkT, la, d0, W, J)
    fwd = _get_fwd(W, J, interpret, R)
    cost_f, iend_rel, jend, win = [
        x.reshape(B)
        for x in fwd(
            _q(la_rel), _q(la), _q(lb), _q(d0), _q(peq_f), _q(bpk_f)
        )
    ]
    iend = iend_rel + m0 * WB

    peq_r, bpk_r, row_off = rev_prep_tab(
        peqT, bpkT, LA, iend, jend, d0, W, J
    )
    rev = _get_rev(W, J, interpret, R)
    cost_r, best_row = [
        x.reshape(B)
        for x in rev(_q(row_off), _q(iend), _q(jend), _q(peq_r), _q(bpk_r))
    ]
    i0 = iend - best_row

    cost_r = jnp.where(jend == 0, 0, cost_r)
    i0 = jnp.where(jend == 0, iend, i0)
    valid = cost_f < MBIG
    return (
        jnp.where(valid, cost_r, jnp.int32(BIG))[:B0],
        jnp.where(valid, i0, 0)[:B0],
        jnp.where(valid, iend, 0)[:B0],
        jnp.where(valid, jend, 0)[:B0],
        jnp.where(valid, win, 0)[:B0],
    )
