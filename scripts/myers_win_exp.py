"""Window-slice strategy experiments on TPU (myers prep bottleneck).

Candidates for win_f[p, q] = a_pad[p, start_p + q] with start 32-aligned:
  v0_current   pad + vmapped per-element dynamic_slice + mask (baseline)
  v1_sliceonly baseline without the validity mask
  v2_maskonly  the validity mask alone on a materialized window
  v3_block8    pad + reshape [B, L/8, 8] + vmapped block slice + mask
  v4_word      pad + bitcast uint32 [B, L/4] + vmapped slice + mask
  v5_i32       whole chain in int32 (no uint8 vector ops)

    python scripts/myers_win_exp.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import make_batch, put_chunked, robust


def scalarize(piece):
    import jax
    import jax.numpy as jnp

    def wrapped(*a):
        out = piece(*a)
        return sum(
            jnp.sum(x.astype(jnp.int32)) for x in jax.tree_util.tree_leaves(out)
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
    d0_d = robust(lambda: jax.device_put(d0.astype(np.int32)), "d0")
    ai = robust(lambda: jax.device_put(a_oid.astype(np.int32)), "ai")

    a_rows = jax.jit(lambda o, x: o[x])(dev_o, ai)
    np.asarray(a_rows[0])

    Kf = M.K_of(W)
    NBLK = J // M.WB + Kf
    R = NBLK * M.WB

    def starts(d0, LA):
        m0 = M.fwd_anchor(d0, W)
        return jnp.clip(m0 * M.WB, -R, LA) + R, m0

    def v0(a_rows, la, d0):
        LA = a_rows.shape[1]
        start_f, m0 = starts(d0, LA)
        a_pad = jnp.pad(a_rows, ((0, 0), (R, R)), constant_values=4)
        win = jax.vmap(lambda row, s: jax.lax.dynamic_slice(row, (s,), (R,)))(
            a_pad, start_f
        )
        q = jnp.arange(R, dtype=jnp.int32)[None, :]
        absr = m0[:, None] * M.WB + q
        return jnp.where((absr >= 0) & (absr < la[:, None]), win, 4)

    def v1(a_rows, la, d0):
        LA = a_rows.shape[1]
        start_f, m0 = starts(d0, LA)
        a_pad = jnp.pad(a_rows, ((0, 0), (R, R)), constant_values=4)
        return jax.vmap(
            lambda row, s: jax.lax.dynamic_slice(row, (s,), (R,))
        )(a_pad, start_f)

    def v2(win, la, d0):
        m0 = M.fwd_anchor(d0, W)
        q = jnp.arange(R, dtype=jnp.int32)[None, :]
        absr = m0[:, None] * M.WB + q
        return jnp.where((absr >= 0) & (absr < la[:, None]), win, 4)

    def v3(a_rows, la, d0):
        LA = a_rows.shape[1]
        start_f, m0 = starts(d0, LA)
        a_pad = jnp.pad(a_rows, ((0, 0), (R, R)), constant_values=4)
        nb = a_pad.shape[1] // 8
        a_blk = a_pad.reshape(-1, nb, 8)
        win = jax.vmap(
            lambda row, s: jax.lax.dynamic_slice(row, (s, 0), (R // 8, 8))
        )(a_blk, start_f // 8).reshape(-1, R)
        q = jnp.arange(R, dtype=jnp.int32)[None, :]
        absr = m0[:, None] * M.WB + q
        return jnp.where((absr >= 0) & (absr < la[:, None]), win, 4)

    def v4(a_rows, la, d0):
        LA = a_rows.shape[1]
        start_f, m0 = starts(d0, LA)
        a_pad = jnp.pad(a_rows, ((0, 0), (R, R)), constant_values=4)
        aw = jax.lax.bitcast_convert_type(
            a_pad.reshape(a_pad.shape[0], -1, 4), jnp.uint32
        )
        winw = jax.vmap(
            lambda row, s: jax.lax.dynamic_slice(row, (s,), (R // 4,))
        )(aw, start_f // 4)
        win = jax.lax.bitcast_convert_type(winw, jnp.uint8).reshape(-1, R)
        q = jnp.arange(R, dtype=jnp.int32)[None, :]
        absr = m0[:, None] * M.WB + q
        return jnp.where((absr >= 0) & (absr < la[:, None]), win, 4)

    def v5(a_rows, la, d0):
        LA = a_rows.shape[1]
        start_f, m0 = starts(d0, LA)
        a_pad = jnp.pad(
            a_rows.astype(jnp.int32), ((0, 0), (R, R)), constant_values=4
        )
        win = jax.vmap(lambda row, s: jax.lax.dynamic_slice(row, (s,), (R,)))(
            a_pad, start_f
        )
        q = jnp.arange(R, dtype=jnp.int32)[None, :]
        absr = m0[:, None] * M.WB + q
        return jnp.where((absr >= 0) & (absr < la[:, None]), win, 4)

    res = {}
    res["v0_current"] = timed(v0, (a_rows, la, d0_d))
    res["v1_sliceonly"] = timed(v1, (a_rows, la, d0_d))
    win = jax.jit(v1)(a_rows, la, d0_d)
    np.asarray(win[0, :8])
    res["v2_maskonly"] = timed(v2, (win, la, d0_d))
    res["v3_block8"] = timed(v3, (a_rows, la, d0_d))
    res["v4_word"] = timed(v4, (a_rows, la, d0_d))
    res["v5_i32"] = timed(v5, (a_rows, la, d0_d))

    # correctness cross-check on host
    w0 = np.asarray(jax.jit(v0)(a_rows, la, d0_d))
    for name, f in (("v3", v3), ("v4", v4), ("v5", v5)):
        wx = np.asarray(jax.jit(f)(a_rows, la, d0_d)).astype(w0.dtype)
        res[f"{name}_equal"] = bool((wx == w0).all())

    print(json.dumps(res))


if __name__ == "__main__":
    main()
