"""Bisect the table-driven myers prep on TPU: gather/transpose vs barrel
shift vs funnel, scalarized fetches (one int32 crosses the tunnel).

    python scripts/myers_tab_bisect.py
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

    from phasm_tpu.overlap import myers as M
    from phasm_tpu.overlap.extend import _enable_compilation_cache

    _enable_compilation_cache()
    W, J, Mn = 64, 2048, 16384
    rng = np.random.default_rng(0)
    oriented, lengths, a_oid, b_oid, d0 = make_batch(rng, 512, 4096, Mn, J)

    dev_o = put_chunked(oriented)
    lengths_d = robust(
        lambda: jax.device_put(lengths.astype(np.int32)), "lengths"
    )
    ai = robust(lambda: jax.device_put(a_oid.astype(np.int32)), "ai")
    bi = robust(lambda: jax.device_put(b_oid.astype(np.int32)), "bi")
    d0_d = robust(lambda: jax.device_put(d0.astype(np.int32)), "d0")

    tabs = jax.jit(M.build_myers_tables)(dev_o, lengths_d)
    peq, bpk = tabs["peq"], tabs["bpk"]
    np.asarray(peq[0, 0, :4])
    la = jax.jit(lambda l, a: l[a >> 1])(lengths_d, ai)
    res = {"PW": int(peq.shape[2]), "BW": int(bpk.shape[2])}

    res["tables_build_ms"] = timed(M.build_myers_tables, (dev_o, lengths_d))
    res["peq_gather_ms"] = timed(lambda p, a: p[a], (peq, ai))
    res["peq_gather_T_ms"] = timed(
        lambda p, a: jnp.transpose(p[a], (2, 1, 0)), (peq, ai)
    )
    peqT = jax.jit(lambda p, a: jnp.transpose(p[a], (2, 1, 0)))(peq, ai)
    np.asarray(peqT[0, 0, :4])
    res["bpk_gather_T_ms"] = timed(
        lambda p, a: jnp.transpose(p[a], (2, 1, 0)), (bpk, bi)
    )
    bpkT = jax.jit(lambda p, a: jnp.transpose(p[a], (2, 1, 0)))(bpk, bi)
    np.asarray(bpkT[0, 0, :4])

    m0 = jax.jit(lambda d: M.fwd_anchor(d, W))(d0_d)
    res["barrel_fwd_ms"] = timed(
        lambda x, s: M.shift_words(x[:, 0:4, :], s + M.F_TAB), (peqT, m0)
    )
    res["fwd_prep_tab_ms"] = timed(
        lambda pt, bt, l, d: M.fwd_prep_tab(pt, bt, l, d, W, J),
        (peqT, bpkT, la, d0_d),
    )
    iend = jax.jit(lambda l: jnp.minimum(l, 3000))(la)  # stand-in anchors
    jend = jax.jit(lambda l: jnp.maximum(l - 600, 1))(la)
    res["rev_prep_tab_ms"] = timed(
        lambda pt, bt, i, j, d: M.rev_prep_tab(
            pt, bt, int(oriented.shape[1]), i, j, d, W, J
        ),
        (peqT, bpkT, iend, jend, d0_d),
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
