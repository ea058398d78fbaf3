"""Bisect the myers prep chains on TPU: which op eats the time?

    python scripts/myers_prep_bisect.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import make_batch, put_chunked, robust


def scalarize(piece):
    """jit a piece so only an int32 scalar crosses the tunnel: the fetch
    barrier otherwise swamps compute (67 MB through a ~5 ms RTT link)."""
    import jax
    import jax.numpy as jnp

    def wrapped(*a):
        out = piece(*a)
        return sum(
            jnp.sum(x.astype(jnp.int32) if x.dtype != jnp.int32 else x)
            for x in jax.tree_util.tree_leaves(out)
        )

    return jax.jit(wrapped)


def timed(piece, args=(), iters=10):
    fn = scalarize(piece)
    robust(lambda: np.asarray(fn(*args)), "compile+warm", delays=(10, 30, 60))

    def loop():
        t0 = time.time()
        o = None
        for _ in range(iters):
            o = fn(*args)
        np.asarray(o)
        return (time.time() - t0) / iters * 1e3

    return round(robust(loop, "timed loop"), 2)


def main():
    import jax
    import jax.numpy as jnp

    from phasm_tpu.overlap.extend import _enable_compilation_cache
    from phasm_tpu.overlap import myers as M

    _enable_compilation_cache()
    W, J, Mn = 64, 2048, 16384
    rng = np.random.default_rng(0)
    oriented, lengths, a_oid, b_oid, d0 = make_batch(rng, 512, 4096, Mn, J)

    dev_o = put_chunked(oriented)
    la = robust(lambda: jax.device_put(lengths.astype(np.int32)[a_oid >> 1]), "la")
    lb = robust(lambda: jax.device_put(lengths.astype(np.int32)[b_oid >> 1]), "lb")
    d0_d = robust(lambda: jax.device_put(d0.astype(np.int32)), "d0")
    ai = robust(lambda: jax.device_put(a_oid.astype(np.int32)), "ai")
    bi = robust(lambda: jax.device_put(b_oid.astype(np.int32)), "bi")

    gather = jax.jit(lambda o, ai, bi: (o[ai], o[bi]))
    a_rows, b_rows = gather(dev_o, ai, bi)
    np.asarray(a_rows[0])

    res = {}
    res["row_gather"] = timed(lambda o, x, y: (o[x], o[y]), (dev_o, ai, bi))

    Kf = M.K_of(W)
    NBLK = J // M.WB + Kf
    R = NBLK * M.WB

    # fwd window: pad + vmap slice + mask
    def fwd_win(a_rows, la, d0):
        LA = a_rows.shape[1]
        m0 = M.fwd_anchor(d0, W)
        start_f = jnp.clip(m0 * M.WB, -R, LA) + R
        a_pad = jnp.pad(a_rows, ((0, 0), (R, R)), constant_values=4)

        def slc(row, s):
            return jax.lax.dynamic_slice(row, (s,), (R,))

        win_f = jax.vmap(slc)(a_pad, start_f)
        q = jnp.arange(R, dtype=jnp.int32)[None, :]
        absr = m0[:, None] * M.WB + q
        win_f = jnp.where((absr >= 0) & (absr < la[:, None]), win_f, 4)
        return win_f

    jf = jax.jit(fwd_win)
    res["fwd_window"] = timed(fwd_win, (a_rows, la, d0_d))
    win_f = jf(a_rows, la, d0_d)
    np.asarray(win_f[0])

    jp = jax.jit(lambda w: M._build_peq(w, NBLK))
    res["peq_pack"] = timed(lambda w: M._build_peq(w, NBLK), (win_f,))

    jt = jax.jit(lambda w: w.T)
    res["transpose_u8"] = timed(lambda w: w.T, (win_f,))

    # pack alone on pre-transposed input
    def pack_only(winT):
        t = jnp.arange(M.WB, dtype=jnp.uint32)[None, :, None]
        return jnp.stack(
            [
                ((winT == c).astype(jnp.uint32) << t).sum(
                    axis=1, dtype=jnp.uint32
                )
                for c in range(4)
            ],
            axis=1,
        )

    winT = jt(win_f).reshape(NBLK, M.WB, -1)
    np.asarray(winT[0, 0, :8])
    jpo = jax.jit(pack_only)
    res["pack_posttrans"] = timed(pack_only, (winT,))

    # rev pieces
    fp = jax.jit(lambda *a: M._fwd_prep(*a, W=W, J=J))
    peq_f, b2T, la_rel, m0 = fp(a_rows, b_rows, la, lb, d0_d)
    from phasm_tpu.overlap import myers_pallas as MP

    fwd = MP._get_fwd(W, J, False)
    qf = jax.jit(
        lambda la_rel, la, lb, d0, peq, bpk: fwd(
            MP._q(la_rel), MP._q(la), MP._q(lb), MP._q(d0), MP._q(peq),
            MP._q(bpk)
        )
    )
    bpk = jax.jit(MP._pack_b)(b2T)
    res["pack_b"] = timed(MP._pack_b, (b2T,))
    cost_f, iend_rel, jend2, win2 = qf(la_rel, la, lb, d0_d, peq_f, bpk)
    iend = jax.jit(lambda ir, m0: (ir.reshape(-1) + m0 * 32).astype(jnp.int32))(
        iend_rel, m0
    )
    jend = jend2.reshape(-1).astype(jnp.int32)
    np.asarray(iend[0])

    Kr = M.rev_K(W)
    NBLKr = J // M.WB + Kr
    Rr = NBLKr * M.WB

    def rev_win(a_rows, la, iend, jend, d0):
        LA = a_rows.shape[1]
        m0r = M.rev_anchor(iend, jend, d0, W)
        a_flip = jnp.flip(
            jnp.where(jnp.arange(LA)[None, :] < la[:, None], a_rows, 4), axis=1
        )
        start_r = jnp.clip(LA - iend + m0r * M.WB, -Rr, LA) + Rr
        af_pad = jnp.pad(a_flip, ((0, 0), (Rr, Rr)), constant_values=4)

        def slcr(row, s):
            return jax.lax.dynamic_slice(row, (s,), (Rr,))

        win_r = jax.vmap(slcr)(af_pad, start_r)
        qr = jnp.arange(Rr, dtype=jnp.int32)[None, :]
        absrr = m0r[:, None] * M.WB + qr
        win_r = jnp.where((absrr >= 0) & (absrr < iend[:, None]), win_r, 4)
        return win_r

    jrw = jax.jit(rev_win)
    res["rev_window"] = timed(rev_win, (a_rows, la, iend, jend, d0_d))
    win_r = jrw(a_rows, la, iend, jend, d0_d)
    np.asarray(win_r[0])
    jpr = jax.jit(lambda w: M._build_peq(w, NBLKr))
    res["rev_peq_pack"] = timed(lambda w: M._build_peq(w, NBLKr), (win_r,))

    def rev_b(b_rows, lb, jend):
        PAD = jnp.asarray(4, b_rows.dtype)
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
        return jnp.where(jcol < jend[None, :], brw.T, PAD)

    jrb = jax.jit(rev_b)
    res["rev_b2T"] = timed(rev_b, (b_rows, lb, jend))

    from functools import partial
    res["fwd_prep_total"] = timed(partial(M._fwd_prep, W=W, J=J),
                                  (a_rows, b_rows, la, lb, d0_d))
    res["rev_prep_total"] = timed(partial(M._rev_prep, W=W, J=J),
                                  (a_rows, b_rows, la, lb, iend, jend, d0_d))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
