"""Banded overlap alignment: numpy oracle, batched jnp, Pallas TPU kernel.

Replaces DALIGNER's O(nd)-style wave extension (SURVEY.md §3.2).  All three
implementations compute the SAME function (tested for equality):

Given read codes a, b (b already oriented) and a seed diagonal d0 >= 0
(callers swap a/b so the alignment starts near a[d0] ~ b[0]), compute the
best *banded semiglobal* alignment under unit edit costs:

  * start: any a-position at b-position 0 (free a-prefix: overlap semantics);
  * band: diagonals d in [d0 - W/2, d0 + W/2);
  * end: first index exhausted — either i = la (suffix-prefix overlap, with
    b_end = j) or j = lb (b contained / overlap reaching b's end);
  * output: (a_start, a_end, b_start=0, b_end, diffs), ties broken toward
    smaller cost then longer alignment (deterministic).

Band-coordinate recurrence (column j, band offset w, i = d0 + j + w - W/2):

  pre[w]  = min(C[w] + (a[i] != b[j]),  C[w+1] + 1)        # diag, up
  C'[w]   = min_{t<=w} pre[t] + (w - t)                    # left (prefix-min)

The prefix-min is a log2(W) shift-scan — this is what makes the DP a pure
vector program with no sequential inner dependency, ideal for the VPU.
"""
from __future__ import annotations

import dataclasses

import numpy as np

BIG = np.int32(1 << 28)


@dataclasses.dataclass
class ExtendResult:
    a_start: np.ndarray
    a_end: np.ndarray
    b_start: np.ndarray
    b_end: np.ndarray
    diffs: np.ndarray


# ---------------------------------------------------------------------------
# numpy oracle (scalar, obviously-correct full-matrix DP within the band)
# ---------------------------------------------------------------------------


def banded_overlap_np(
    a: np.ndarray, b: np.ndarray, d0: int, band: int
) -> tuple[int, int, int, int, int]:
    """Reference implementation via explicit DP matrix (small inputs only)."""
    la, lb = a.shape[0], b.shape[0]
    lo = d0 - band // 2
    hi = d0 + band // 2  # exclusive
    INF = 1 << 28

    # D[j][i] over the band only, but implement dense for clarity
    D = np.full((lb + 1, la + 1), INF, dtype=np.int64)
    S = np.full((lb + 1, la + 1), -1, dtype=np.int64)  # start i0
    for i in range(la + 1):
        if lo <= i < hi:  # starts allowed near the seed diagonal
            D[0][i] = 0
            S[0][i] = i
    for j in range(1, lb + 1):
        for i in range(la + 1):
            d = i - j
            if not (lo <= d < hi):
                continue
            best, bs = INF, -1
            if i > 0:
                sub = 0 if a[i - 1] == b[j - 1] else 1
                if D[j - 1][i - 1] + sub < best:
                    best, bs = D[j - 1][i - 1] + sub, S[j - 1][i - 1]
            if D[j - 1][i] + 1 < best:
                best, bs = D[j - 1][i] + 1, S[j - 1][i]
            if i > 0 and D[j][i - 1] + 1 < best:
                best, bs = D[j][i - 1] + 1, S[j][i - 1]
            D[j][i] = best
            S[j][i] = bs

    # best end: i == la (any j >= 1) or j == lb (any i)
    best = (INF, -1, -1)  # (cost, -alignlen, j_end) for deterministic ties
    out = None
    for j in range(1, lb + 1):
        cands = []
        if D[j][la] < INF:
            cands.append((int(D[j][la]), la, j, int(S[j][la])))
        if j == lb:
            for i in range(la + 1):
                if D[j][i] < INF:
                    cands.append((int(D[j][i]), i, j, int(S[j][i])))
        for cost, i_end, j_end, i0 in cands:
            keyed = (cost, -(i_end - i0 + j_end), j_end)
            if keyed < best:
                best = keyed
                out = (i0, i_end, 0, j_end, cost)
    if out is None:
        return (0, 0, 0, 0, int(BIG))
    return out


# ---------------------------------------------------------------------------
# batched jnp implementation (lax.scan over columns, runs on CPU or TPU)
# ---------------------------------------------------------------------------

_jit_batch = None


def dp_core(a2, b2, la, lb, d0, band):
    """Pure-jnp banded DP (traceable; used by the jit wrapper AND the
    shard_map data-parallel step in parallel/sharded_overlap.py).

    a2 [B, J + W] band-aligned a-codes (see prepare_pair_tensors);
    b2 [B, J]; la/lb/d0 [B].  Returns (cost, i0, a_end, b_end) each [B].
    """
    import jax
    import jax.numpy as jnp

    if True:
        if True:
            B, J = b2.shape
            W = band
            iota_w = jnp.arange(W, dtype=jnp.int32)

            # i index per (w, j): i = d0 + j + w - W/2 (cell ending at column j+1)
            # C[w] = cost of best path to (i(w,j), j); S[w] = start i0
            i_at_j0 = d0[:, None] + iota_w[None, :] - W // 2  # i at j=0
            C0 = jnp.where(
                (i_at_j0 >= 0) & (i_at_j0 <= la[:, None]), 0, BIG
            ).astype(jnp.int32)
            S0 = i_at_j0.astype(jnp.int32)

            def prefix_min_scan(pre_c, pre_s):
                # m[w] = min_{t<=w} (pre_c[t] - t); carry start of argmin
                xc = pre_c - iota_w[None, :]
                xs = pre_s
                shift = 1
                while shift < W:
                    xc_sh = jnp.concatenate(
                        [jnp.full((B, shift), BIG, jnp.int32), xc[:, :-shift]], axis=1
                    )
                    xs_sh = jnp.concatenate(
                        [jnp.zeros((B, shift), jnp.int32), xs[:, :-shift]], axis=1
                    )
                    take = xc_sh < xc  # strict: prefer current (later t) on ties
                    xc = jnp.where(take, xc_sh, xc)
                    xs = jnp.where(take, xs_sh, xs)
                    shift *= 2
                return xc + iota_w[None, :], xs

            def body(j, carry):
                C, S, best_cost, best_len, best_i0, best_iend, best_jend = carry
                aw = jax.lax.dynamic_slice_in_dim(a2, j, W, axis=1)  # [B, W]
                bc = jax.lax.dynamic_slice_in_dim(b2, j, 1, axis=1)  # [B, 1]
                sub = (aw != bc).astype(jnp.int32)
                i_cell = d0[:, None] + (j + 1) + iota_w[None, :] - W // 2

                diag_c = C + sub
                up_c = jnp.concatenate(
                    [C[:, 1:], jnp.full((B, 1), BIG, jnp.int32)], axis=1
                ) + 1
                up_s = jnp.concatenate(
                    [S[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1
                )
                take_up = up_c < diag_c
                pre_c = jnp.where(take_up, up_c, diag_c)
                pre_s = jnp.where(take_up, up_s, S)
                Cn, Sn = prefix_min_scan(pre_c, pre_s)
                # invalidate cells outside [0, la] on a-axis or beyond column
                valid = (i_cell >= 0) & (i_cell <= la[:, None]) & (j < lb)[:, None]
                Cn = jnp.where(valid, Cn, BIG)
                Cn = jnp.minimum(Cn, BIG)

                def consider(state, cost, i0, i_end, mask):
                    bc, bl, b0, bi, bj = state
                    alen = (i_end - i0) + (j + 1)
                    better = mask & (
                        (cost < bc) | ((cost == bc) & (alen > bl))
                    )
                    return (
                        jnp.where(better, cost, bc),
                        jnp.where(better, alen, bl),
                        jnp.where(better, i0, b0),
                        jnp.where(better, i_end, bi),
                        jnp.where(better, j + 1, bj),
                    )

                state = (best_cost, best_len, best_i0, best_iend, best_jend)

                # endpoint: i == la at this column (j+1): at most one cell
                at_la = i_cell == la[:, None]
                cost_la = jnp.where(at_la, Cn, BIG).min(axis=1)
                arg_la = jnp.where(at_la, Cn, BIG).argmin(axis=1)
                i0_la = jnp.take_along_axis(Sn, arg_la[:, None], axis=1)[:, 0]
                state = consider(state, cost_la, i0_la, la, cost_la < BIG)

                # endpoint: j+1 == lb (b exhausted): best cell in final column
                at_end = (j + 1) == lb
                cost_be = Cn.min(axis=1)
                arg_be = Cn.argmin(axis=1)
                i_be = jnp.take_along_axis(i_cell, arg_be[:, None], axis=1)[:, 0]
                i0_be = jnp.take_along_axis(Sn, arg_be[:, None], axis=1)[:, 0]
                state = consider(
                    state, cost_be, i0_be, jnp.minimum(i_be, la),
                    at_end & (cost_be < BIG),
                )

                best_cost, best_len, best_i0, best_iend, best_jend = state
                return (Cn, Sn, best_cost, best_len, best_i0, best_iend, best_jend)

            # init derives from d0 (full_like) so the carry keeps the same
            # varying-axes type as the inputs under shard_map
            zero = jnp.zeros_like(d0, dtype=jnp.int32)
            init = (
                C0,
                S0,
                zero + BIG,
                zero - 1,
                zero,
                zero,
                zero,
            )
            out = jax.lax.fori_loop(0, J, body, init)
            _, _, bc_, _, bi0, bie, bje = out
            return bc_, bi0, bie, bje


def _get_jit_batch():
    global _jit_batch
    if _jit_batch is None:
        import jax
        from functools import partial

        _jit_batch = partial(jax.jit, static_argnames=("band",))(dp_core)
    return _jit_batch


def prepare_pair_tensors(
    oriented: np.ndarray,
    lengths: np.ndarray,
    a_oid: np.ndarray,
    b_oid: np.ndarray,
    d0: np.ndarray,
    band: int,
    jmax: int,
):
    """Gather band-aligned per-pair tensors (XLA-friendly host prep).

    a2[p, t] = a[d0 + t - W/2] for t in [0, jmax + W); out-of-range -> 254
    b2[p, j] = b[j] for j in [0, jmax); out-of-range -> 255 (never matches)
    """
    B = a_oid.shape[0]
    W = band
    a_rows = oriented[a_oid]
    b_rows = oriented[b_oid]
    la = lengths[a_oid >> 1].astype(np.int32)
    lb = lengths[b_oid >> 1].astype(np.int32)

    t = np.arange(jmax + W, dtype=np.int64)[None, :]
    ai = d0[:, None].astype(np.int64) + t - W // 2
    a_ok = (ai >= 0) & (ai < la[:, None])
    a2 = np.where(a_ok, a_rows[np.arange(B)[:, None], np.clip(ai, 0, a_rows.shape[1] - 1)], 254).astype(np.uint8)

    if b_rows.shape[1] < jmax:
        b_rows = np.pad(b_rows, ((0, 0), (0, jmax - b_rows.shape[1])))
    j = np.arange(jmax, dtype=np.int64)[None, :]
    b2 = np.where(j < lb[:, None], b_rows[:, :jmax], 255).astype(np.uint8)
    return a2, b2, la, lb


def banded_overlap_batch(
    oriented: np.ndarray,
    lengths: np.ndarray,
    a_oid: np.ndarray,
    b_oid: np.ndarray,
    d0: np.ndarray,
    band: int = 64,
    jmax: int = 4096,
) -> ExtendResult:
    """Batched banded overlap via the jnp scan implementation."""
    a2, b2, la, lb = prepare_pair_tensors(
        oriented, lengths, a_oid, b_oid, d0, band, jmax
    )
    run = _get_jit_batch()
    cost, i0, iend, jend = run(a2, b2, la, lb, d0.astype(np.int32), band)
    return ExtendResult(
        a_start=np.asarray(i0),
        a_end=np.asarray(iend),
        b_start=np.zeros_like(np.asarray(i0)),
        b_end=np.asarray(jend),
        diffs=np.asarray(cost),
    )


# ---------------------------------------------------------------------------
# Pallas TPU kernel: band on sublanes (W x B tile), pairs on lanes
# ---------------------------------------------------------------------------


def _make_pallas_extend(band: int, jmax: int, block_b: int = 128, interpret: bool = False):
    """Build the Pallas kernel for a given (band, jmax) bucket.

    Layout: a2T [jmax+W, M], b2T [jmax, M] (pairs on the 128-lane axis), DP
    state C/S [W, block_b] lives in registers/VMEM across a fori_loop over
    columns.  The prefix-min scan is log2(W) sublane shifts — no sequential
    inner dependency, so the VPU runs at full width (SURVEY.md §8.3 item 3).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = band
    half = W // 2

    def kernel(d0_ref, la_ref, lb_ref, a2_ref, b2_ref, out_ref):
        B = block_b
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, B), 0)
        d0 = d0_ref[0, :]
        la = la_ref[0, :]
        lb = lb_ref[0, :]

        i_at_j0 = d0[None, :] + iota_w - half
        C0 = jnp.where((i_at_j0 >= 0) & (i_at_j0 <= la[None, :]), 0, BIG).astype(
            jnp.int32
        )
        S0 = i_at_j0.astype(jnp.int32)

        def prefix_min(pre_c, pre_s):
            xc = pre_c - iota_w
            xs = pre_s
            shift = 1
            while shift < W:
                down = jax.lax.broadcasted_iota(jnp.int32, (W, B), 0) < shift
                xc_sh = jnp.where(down, BIG, pltpu.roll(xc, shift=shift, axis=0))
                xs_sh = jnp.where(down, 0, pltpu.roll(xs, shift=shift, axis=0))
                take = xc_sh < xc
                xc = jnp.where(take, xc_sh, xc)
                xs = jnp.where(take, xs_sh, xs)
                shift *= 2
            return xc + iota_w, xs

        iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, B), 0)

        def step(j, u, ablk, bblk, carry):
            """One DP column. u is the STATIC offset of j within its 8-block;
            ablk [W+8, B] / bblk [8, B] are the block-aligned loads (Mosaic
            requires 8-aligned dynamic sublane slices, so per-column loads are
            done per 8-block and sliced statically here)."""
            C, S, best_cost, best_len, best_i0, best_iend, best_jend = carry
            # rows u..u+W of ablk == a chars for this column (roll is circular
            # but u+W <= W+8 so no wraparound enters the slice)
            aw = jax.lax.slice_in_dim(
                pltpu.roll(ablk, shift=(W + 8 - u) % (W + 8), axis=0), 0, W, axis=0
            )
            bc = jnp.min(jnp.where(iota8 == u, bblk, BIG), axis=0, keepdims=True)
            sub = (aw != bc).astype(jnp.int32)
            i_cell = d0[None, :] + (j + 1) + iota_w - half

            diag_c = C + sub
            up = jax.lax.broadcasted_iota(jnp.int32, (W, B), 0) >= W - 1
            # roll by W-1 == circular shift by -1 (pltpu.roll needs shift >= 0)
            up_c = jnp.where(up, BIG, pltpu.roll(C, shift=W - 1, axis=0)) + 1
            up_s = jnp.where(up, 0, pltpu.roll(S, shift=W - 1, axis=0))
            take_up = up_c < diag_c
            pre_c = jnp.where(take_up, up_c, diag_c)
            pre_s = jnp.where(take_up, up_s, S)
            Cn, Sn = prefix_min(pre_c, pre_s)
            valid = (i_cell >= 0) & (i_cell <= la[None, :]) & (j < lb)[None, :]
            Cn = jnp.where(valid, Cn, BIG)

            def consider(state, cost, i0, i_end, mask):
                bcost, blen, b0, bi, bj = state
                alen = (i_end - i0) + (j + 1)
                better = mask & ((cost < bcost) | ((cost == bcost) & (alen > blen)))
                return (
                    jnp.where(better, cost, bcost),
                    jnp.where(better, alen, blen),
                    jnp.where(better, i0, b0),
                    jnp.where(better, i_end, bi),
                    jnp.where(better, j + 1, bj),
                )

            state = (best_cost, best_len, best_i0, best_iend, best_jend)

            # i == la endpoint: at most one band cell (i_cell strictly
            # increases with w), so plain masked mins select it (int argmin /
            # gather do not lower on TPU Mosaic)
            at_la = i_cell == la[None, :]
            c_la = jnp.min(jnp.where(at_la, Cn, BIG), axis=0)
            i0_la = jnp.min(jnp.where(at_la, Sn, BIG), axis=0)
            state = consider(state, c_la, i0_la, la, c_la < BIG)

            # j+1 == lb endpoint: pick first w attaining the column min
            at_end = (j + 1) == lb
            c_be = jnp.min(Cn, axis=0)
            first_w = jnp.min(
                jnp.where(Cn == c_be[None, :], iota_w, W), axis=0
            )
            sel = iota_w == first_w[None, :]
            i_be = jnp.min(jnp.where(sel, i_cell, BIG), axis=0)
            i0_be = jnp.min(jnp.where(sel, Sn, BIG), axis=0)
            state = consider(
                state, c_be, i0_be, jnp.minimum(i_be, la), at_end & (c_be < BIG)
            )

            best_cost, best_len, best_i0, best_iend, best_jend = state
            return (Cn, Sn, best_cost, best_len, best_i0, best_iend, best_jend)

        def outer(t, carry):
            off = pl.multiple_of(t * 8, 8)
            ablk = a2_ref[pl.ds(off, W + 8), :]
            bblk = b2_ref[pl.ds(off, 8), :]
            for u in range(8):
                carry = step(t * 8 + u, u, ablk, bblk, carry)
            return carry

        init = (
            C0,
            S0,
            jnp.full((block_b,), BIG, jnp.int32),
            jnp.full((block_b,), -1, jnp.int32),
            jnp.zeros((block_b,), jnp.int32),
            jnp.zeros((block_b,), jnp.int32),
            jnp.zeros((block_b,), jnp.int32),
        )
        out = jax.lax.fori_loop(0, jmax // 8, outer, init)
        _, _, bcost, _, bi0, bie, bje = out
        out_ref[0, :] = bcost
        out_ref[1, :] = bi0
        out_ref[2, :] = bie
        out_ref[3, :] = bje

    @jax.jit
    def run(d0, la, lb, a2T, b2T):
        M = d0.shape[1]
        grid = (M // block_b,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (jmax + W, block_b), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((jmax, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (4, block_b), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((4, M), jnp.int32),
            cost_estimate=pl.CostEstimate(
                flops=8 * M * jmax * W, bytes_accessed=M * (2 * jmax + W), transcendentals=0
            ),
            interpret=interpret,
        )(d0, la, lb, a2T, b2T)

    return run


_pallas_cache: dict = {}


def banded_overlap_pallas(
    oriented: np.ndarray,
    lengths: np.ndarray,
    a_oid: np.ndarray,
    b_oid: np.ndarray,
    d0: np.ndarray,
    band: int = 64,
    jmax: int = 4096,
    block_b: int = 128,
    interpret: bool | None = None,
) -> ExtendResult:
    """Pallas TPU path; same function as banded_overlap_batch.

    interpret=None auto-selects interpreter mode on non-TPU backends (tests).
    """
    if interpret is None:
        import jax

        interpret = jax.default_backend() != "tpu"
    a2, b2, la, lb = prepare_pair_tensors(
        oriented, lengths, a_oid, b_oid, d0, band, jmax
    )
    M = a2.shape[0]
    Mp = ((M + block_b - 1) // block_b) * block_b
    if Mp != M:
        pad = Mp - M
        a2 = np.pad(a2, ((0, pad), (0, 0)), constant_values=254)
        b2 = np.pad(b2, ((0, pad), (0, 0)), constant_values=255)
        la = np.pad(la, (0, pad), constant_values=1)
        lb = np.pad(lb, (0, pad), constant_values=1)
        d0 = np.pad(d0, (0, pad))
    key = (band, jmax, block_b, interpret)
    if key not in _pallas_cache:
        _pallas_cache[key] = _make_pallas_extend(band, jmax, block_b, interpret)
    run = _pallas_cache[key]
    assert jmax % 8 == 0, "jmax must be a multiple of 8 (aligned column blocks)"
    out = np.asarray(
        run(
            d0.astype(np.int32)[None, :],
            la.astype(np.int32)[None, :],
            lb.astype(np.int32)[None, :],
            np.ascontiguousarray(a2.T).astype(np.int32),
            np.ascontiguousarray(b2.T).astype(np.int32),
        )
    )[:, :M]
    return ExtendResult(
        a_start=out[1],
        a_end=out[2],
        b_start=np.zeros(M, dtype=np.int32),
        b_end=out[3],
        diffs=out[0],
    )
