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


def _residual_barrel(x, srem, n_out, zeros_like_word, res: int | None = None):
    """In-kernel residual barrel: out[w] = x[w + srem] for w < n_out, with
    per-pair srem in [0, res) on the trailing (R, 128) axes.  High-bit-first
    levels with progressive truncation keep the live set shrinking; all
    selects are VMEM-resident VPU work (the round-3 XLA barrel paid an HBM
    round trip per level)."""
    import jax.numpy as jnp

    bits = ((res or BK2) - 1).bit_length()
    for j in reversed(range(bits)):
        step = 1 << j
        if step >= x.shape[0]:
            continue
        shifted = jnp.concatenate(
            [x[step:]] + [zeros_like_word] * step, axis=0
        )[: x.shape[0]]
        sel = ((srem >> j) & 1) == 1
        x = jnp.where(sel[(None,) * (x.ndim - 2)], shifted, x)
        keep = n_out + step - 1
        if keep < x.shape[0]:
            x = x[:keep]
    return x[:n_out]


BK2 = 32  # must equal myers.BK (peq fetch-block size; residual < BK2)
BKB2 = 128  # must equal myers.BKB (packed-b fetch-row size)


def _make_myers_fwd(W: int, J: int, interpret: bool = False,
                    R: int = BLK_ROWS, tab2: bool = False):
    """Forward kernel factory.  Returns run(la_rel2, la2, lb2, peq, bpk)
    -> (cost2, iend_rel2, jend2, win2), all [B/128, 128] int32.

    With ``tab2`` the peq window arrives as per-pair COARSE FETCH BLOCKS
    (step-major slab [NSTEP, GF*BK, 4, R, 128] in HBM, manually DMA'd and
    single-buffered) plus the per-pair residual word shift; the kernel
    barrel-shifts the residual in VMEM before the identical DP loop.  See
    myers.build_myers_tables_blocked."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from phasm_tpu.overlap.extend import WINDOW
    from phasm_tpu.overlap.myers import tab2_geometry

    K = K_of(W)
    NB = J // WB
    NBLK = NB + K
    JW = J // 16
    assert J % WB == 0 and J % (WINDOW // 2) == 0
    GF = tab2_geometry(W, J)[0]
    GW = GF * BK2

    def kernel(*refs):
        u32 = jnp.uint32
        if tab2:
            (la_rel_ref, la_ref, lb_ref, d0_ref, srem_ref, sm_ref,
             cost_ref, iend_ref, jend_ref, win_ref,
             pq_scr, bpk_scr, sems) = refs
            bpk_ref = bpk_scr
        else:
            (la_rel_ref, la_ref, lb_ref, d0_ref, peq_ref, bpk_ref,
             cost_ref, iend_ref, jend_ref, win_ref) = refs
            pq_scr = peq_ref
        if tab2:
            step_i = pl.program_id(0)  # hoisted: not traceable in run_scoped

            def prologue(slab):
                cp = pltpu.make_async_copy(
                    sm_ref.at[step_i, 0:GF], slab, sems.at[0]
                )
                cb = pltpu.make_async_copy(
                    sm_ref.at[step_i, GF, 0:JW], bpk_scr, sems.at[1]
                )
                cp.start()
                cb.start()
                cp.wait()
                # word-major flat rows: [GF, 128, R, 128] IS
                # [GF*BK, 4, R, 128] (lane w*4 + c), reshape is free
                x = slab[:].reshape(GF * BK2, 4, R, 128)
                pq_scr[:, :] = _residual_barrel(
                    x, srem_ref[:],
                    NBLK, jnp.zeros((1, 4, R, 128), u32),
                )
                cb.wait()

            pl.run_scoped(
                prologue, pltpu.VMEM((GF, 128, R, 128), jnp.uint32)
            )
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
            pq = [pq_scr[blk + k] for k in range(K)]
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

    def run(la_rel2, la2, lb2, d02, *rest):
        Bq = la_rel2.shape[0]
        grid = (Bq // R,)
        o = jax.ShapeDtypeStruct((Bq, 128), jnp.int32)
        s2 = pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
        bpk_spec = pl.BlockSpec(
            (JW, R, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )
        if tab2:
            in_specs = [
                s2, s2, s2, s2, s2,
                pl.BlockSpec(memory_space=pltpu.HBM),  # combined slab
            ]
            scratch = [
                pltpu.VMEM((NBLK, 4, R, 128), jnp.uint32),
                pltpu.VMEM((JW, R, 128), jnp.uint32),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        else:
            in_specs = [
                s2, s2, s2, s2,
                pl.BlockSpec(
                    (NBLK, 4, R, 128), lambda i: (0, 0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                bpk_spec,
            ]
            scratch = []
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=(s2, s2, s2, s2),
            out_shape=(o, o, o, o),
            scratch_shapes=scratch,
            cost_estimate=pl.CostEstimate(
                flops=Bq * 128 * J * K * 30,
                bytes_accessed=rest[-2].size * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(la_rel2, la2, lb2, d02, *rest)

    return run


def _make_myers_rev(W: int, J: int, interpret: bool = False,
                    R: int = BLK_ROWS, tab2: bool = False):
    """Reverse (anchored-end start recovery) kernel factory.  Returns
    run(row_off2, la2, lb2, peq_r, bpk_r) -> (cost2, best_row2) int32.

    With ``tab2`` both windows arrive as coarse fetch-block slabs; the
    kernel applies the residual word barrel, the per-pair BIT funnel
    (reverse anchors are not 32-aligned), the below-prefix whole-word mask,
    and the packed-b code funnel in VMEM before the identical DP loop —
    the whole of rev_prep_tab minus the gathers."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from phasm_tpu.overlap.myers import tab2_geometry

    K = rev_K(W)
    NB = J // WB
    NBLK = NB + K
    JW = J // 16
    GR, GB = tab2_geometry(W, J)[1:]

    def kernel(*refs):
        u32 = jnp.uint32
        if tab2:
            (row_off_ref, la_ref, lb_ref, srem_ref, delta_ref, negm0r_ref,
             cbrem_ref, db_ref, sm_ref,
             cost_ref, row_ref, pq_scr, bpk_scr, sems) = refs
        else:
            (row_off_ref, la_ref, lb_ref, peq_ref, bpk_ref,
             cost_ref, row_ref) = refs
            pq_scr, bpk_scr = peq_ref, bpk_ref
        if tab2:
            # two scopes: the peq slab + its barrel temporaries die before
            # the bpk slab allocates, keeping peak scoped VMEM well under
            # the 16 MB v5e limit at R = 16
            step_i = pl.program_id(0)  # hoisted: not traceable in run_scoped

            def peq_prologue(slab):
                cp = pltpu.make_async_copy(
                    sm_ref.at[step_i, 0:GR], slab, sems.at[0]
                )
                cp.start()
                cp.wait()
                # residual word shift, then the bit-level funnel with
                # per-pair delta, then zero whole words below the reversed
                # prefix (absrr < 0 <=> word k < -m0r) — rev_prep_tab exact
                x = _residual_barrel(
                    slab[:].reshape(GR * BK2, 4, R, 128), srem_ref[:],
                    NBLK + 1, jnp.zeros((1, 4, R, 128), u32),
                )
                d = delta_ref[:].astype(u32)[None, None]
                hi_sh = (u32(32) - d) % u32(32)
                y = (x[:NBLK] >> d) | jnp.where(
                    d == 0, u32(0), x[1 : NBLK + 1] << hi_sh
                )
                k_idx = jax.lax.broadcasted_iota(
                    jnp.int32, (NBLK, 4, R, 128), 0
                )
                pq_scr[:, :] = jnp.where(
                    k_idx < negm0r_ref[:][None, None], u32(0), y
                )

            def bpk_prologue(bslab):
                cb = pltpu.make_async_copy(
                    sm_ref.at[step_i, GR : GR + GB], bslab, sems.at[1]
                )
                cb.start()
                cb.wait()
                z = _residual_barrel(
                    bslab[:].reshape(GB * BKB2, R, 128),
                    cbrem_ref[:], JW + 1, jnp.zeros((1, R, 128), u32),
                    res=BKB2,
                )
                dbv = db_ref[:].astype(u32)[None]
                hi_b = (u32(32) - dbv) % u32(32)
                bpk_scr[:, :] = (z[:JW] >> dbv) | jnp.where(
                    dbv == 0, u32(0), z[1 : JW + 1] << hi_b
                )

            pl.run_scoped(
                peq_prologue, pltpu.VMEM((GR, 128, R, 128), jnp.uint32)
            )
            pl.run_scoped(
                bpk_prologue, pltpu.VMEM((GB, BKB2, R, 128), jnp.uint32)
            )
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

            pq = [pq_scr[blk + k] for k in range(K)]

            bw0 = bpk_scr[blk * 2]
            bw1 = bpk_scr[blk * 2 + 1]

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

    def run(row_off2, la2, lb2, *rest):
        Bq = row_off2.shape[0]
        grid = (Bq // R,)
        o = jax.ShapeDtypeStruct((Bq, 128), jnp.int32)
        s2 = pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
        if tab2:
            in_specs = [
                s2, s2, s2, s2, s2, s2, s2, s2,
                pl.BlockSpec(memory_space=pltpu.HBM),  # combined slab
            ]
            scratch = [
                pltpu.VMEM((NBLK, 4, R, 128), jnp.uint32),
                pltpu.VMEM((JW, R, 128), jnp.uint32),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        else:
            in_specs = [
                s2, s2, s2,
                pl.BlockSpec(
                    (NBLK, 4, R, 128), lambda i: (0, 0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (JW, R, 128), lambda i: (0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ]
            scratch = []
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=(s2, s2),
            out_shape=(o, o),
            scratch_shapes=scratch,
            cost_estimate=pl.CostEstimate(
                flops=Bq * 128 * J * K * 30,
                bytes_accessed=rest[-2].size * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(row_off2, la2, lb2, *rest)

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


# ---------------------------------------------------------------------------
# Blocked-table entry (round 4): coarse-block gathers + in-kernel residual
# barrel/funnel.  See myers.build_myers_tables_blocked for the layout and
# the header comment there for why this beats the round-3 XLA prep.
# ---------------------------------------------------------------------------


def kernel_vmem_bytes_tab2(W: int, J: int, R: int) -> int:
    """Scoped-VMEM estimate for the tab2 kernels (rev dominates): the
    single-buffered slabs + residual-barrel temporaries + window scratch +
    funnel temporaries.  LA-independent by design (the slab covers only the
    J-sized window's fetch blocks)."""
    from phasm_tpu.overlap.myers import tab2_geometry

    GF, GR, GB = tab2_geometry(W, J)
    tile = R * 128 * 4
    nr = J // WB + rev_K(W)
    # the first barrel level holds x + its shifted copy (2x slab); later
    # levels truncate below that, and the funnel runs on the (much smaller)
    # truncated set, so 2x slab bounds each scope's peak
    peq_scope = 2 * max(GF, GR) * 128
    bpk_scope = 2 * GB * BKB2
    persistent = nr * 4 + J // 16  # pq_scr + bpk_scr
    return (persistent + max(peq_scope, bpk_scope)) * tile


def blk_rows2(W: int, J: int) -> int:
    return 16 if kernel_vmem_bytes_tab2(W, J, 16) <= VMEM_BUDGET else 8


def tab2_fits(W: int, J: int) -> bool:
    """True when (W, J) can route to the tab2 kernels at R = 8 at least."""
    from phasm_tpu.overlap.myers import JWMAX

    return J // 16 <= JWMAX and kernel_vmem_bytes_tab2(W, J, 8) <= VMEM_BUDGET


_FWD2: dict = {}
_REV2: dict = {}


def _get_fwd_tab2(W: int, J: int, interpret: bool, R: int):
    key = (W, J, interpret, R)
    if key not in _FWD2:
        _FWD2[key] = _make_myers_fwd(W, J, interpret, R, tab2=True)
    return _FWD2[key]


def _get_rev_tab2(W: int, J: int, interpret: bool, R: int):
    key = (W, J, interpret, R)
    if key not in _REV2:
        _REV2[key] = _make_myers_rev(W, J, interpret, R, tab2=True)
    return _REV2[key]


def _step_major(g, R: int):
    """Gathered 128-lane fetch rows -> the kernels' step-major slab layout.

    g [B, G, 128] -> [B/(R*128), G, 128, R, 128] so a grid step's sub-slabs
    are leading-index DMAs (tile-aligned trailing dims; Mosaic rejects
    arbitrary-offset slices of tiled memrefs).  This is the ONE relayout
    pass per kernel — everything else is free leading-dim reshapes thanks
    to the word-major flat rows."""
    import jax.numpy as jnp

    B, G = g.shape[0], g.shape[1]
    ns = B // (R * 128)
    return jnp.transpose(
        g.reshape(ns, R, 128, G, 128), (0, 3, 4, 1, 2)
    )


def myers_pallas_compute_tab2(
    win_tab, lengths,
    a_oid, b_oid, d0, *, LA: int, W: int, J: int, interpret: bool = False,
):
    """Production blocked-table entry: same contract and bit-identical
    outputs as myers_pallas_compute_tab (tested), with the window shift
    networks in-kernel and, per kernel, ONE combined coarse-block gather +
    ONE step-major relayout in XLA (row gathers are per-index bound: four
    separate gathers cost ~2x two combined ones)."""
    import jax.numpy as jnp

    from phasm_tpu.overlap.extend import BIG
    from phasm_tpu.overlap.myers import (
        F_TAB,
        blocked_counts,
        fwd_anchor,
        rev_anchor,
        tab2_geometry,
        tab2_offsets,
    )

    R = blk_rows2(W, J)
    NBb, NBc = blocked_counts(LA)
    GF, GR, GB = tab2_geometry(W, J)
    n_rows = win_tab.shape[0]
    n_o = n_rows // (2 * NBb + 1 + NBc)
    OFF_R, OFF_BF, OFF_BR = tab2_offsets(n_o, LA)

    B0 = a_oid.shape[0]
    B = -(-B0 // (R * 128)) * (R * 128)
    if B != B0:
        a_oid = jnp.pad(a_oid, (0, B - B0))
        b_oid = jnp.pad(b_oid, (0, B - B0))
        d0 = jnp.pad(d0, (0, B - B0))
    la = lengths[a_oid >> 1]
    lb = lengths[b_oid >> 1]

    m0 = fwd_anchor(d0, W)
    s = m0 + F_TAB  # >= F_TAB - 2 (non-negative word offset)
    s32 = s // BK2
    srem = s - s32 * BK2
    # bounds derivation (myers.F_TAB comment): s <= PW - 2, so
    # s32 + GF - 1 < NBb; the clamp is belt-and-braces for padded pairs
    idx_f = jnp.concatenate(
        [
            jnp.clip(
                (a_oid * NBb + s32)[:, None]
                + jnp.arange(GF, dtype=jnp.int32)[None, :],
                0, OFF_R - 1,
            ),
            (OFF_BF + b_oid)[:, None],
        ],
        axis=1,
    )
    sm_f = _step_major(win_tab[idx_f], R)

    fwd = _get_fwd_tab2(W, J, interpret, R)
    la_rel = la - m0 * WB
    cost_f, iend_rel, jend, win = [
        x.reshape(B)
        for x in fwd(
            _q(la_rel), _q(la), _q(lb), _q(d0), _q(srem), sm_f,
        )
    ]
    iend = iend_rel + m0 * WB

    m0r = rev_anchor(iend, jend, d0, W)
    obit = (LA - iend) + m0r * WB + F_TAB * WB
    q0 = obit // WB  # >= 0 (F_TAB bound), <= PW - K_of(W)
    delta = obit - q0 * WB
    q32 = q0 // BK2
    qrem = q0 - q32 * BK2
    cb = LA - jend
    cbw = cb // 16
    db = (2 * (cb - cbw * 16)).astype(jnp.int32)
    c128 = cbw // BKB2
    crem = cbw - c128 * BKB2
    idx_r = jnp.concatenate(
        [
            jnp.clip(
                (OFF_R + a_oid * NBb + q32)[:, None]
                + jnp.arange(GR, dtype=jnp.int32)[None, :],
                OFF_R, OFF_BF - 1,
            ),
            jnp.clip(
                (OFF_BR + b_oid * NBc + c128)[:, None]
                + jnp.arange(GB, dtype=jnp.int32)[None, :],
                OFF_BR, n_rows - 1,
            ),
        ],
        axis=1,
    )
    sm_r = _step_major(win_tab[idx_r], R)

    rev = _get_rev_tab2(W, J, interpret, R)
    cost_r, best_row = [
        x.reshape(B)
        for x in rev(
            _q(m0r * WB), _q(iend), _q(jend), _q(qrem), _q(delta),
            _q(-m0r), _q(crem), _q(db), sm_r,
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
