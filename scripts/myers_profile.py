"""Break down the myers_pallas production path on TPU: prep vs kernels.

Times, each jitted separately with a fetch barrier:
  fwd_prep   — _fwd_prep (pad/slice/peq build) alone
  fwd_kernel — forward Pallas kernel on pre-built device operands
  rev_prep   — _rev_prep alone (with fixed iend/jend)
  rev_kernel — reverse Pallas kernel on pre-built operands
  full       — myers_pallas_pair_core end-to-end

    python scripts/myers_profile.py [--m 16384] [--iters 10]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import make_batch, put_chunked, robust


def timed(fn, iters):
    out = robust(fn, "compile+warm", delays=(10, 30, 60))
    np.asarray(jax_first_leaf(out))

    def loop():
        t0 = time.time()
        o = None
        for _ in range(iters):
            o = fn()
        np.asarray(jax_first_leaf(o))
        return (time.time() - t0) / iters

    return robust(loop, "timed loop")


def jax_first_leaf(out):
    import jax

    return jax.tree_util.tree_leaves(out)[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--m", type=int, default=16384)
    ap.add_argument("--jmax", type=int, default=2048)
    ap.add_argument("--band", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    from phasm_tpu.overlap.extend import _enable_compilation_cache
    from phasm_tpu.overlap import myers as M
    from phasm_tpu.overlap import myers_pallas as MP

    _enable_compilation_cache()
    W, J, Mn, iters = args.band, args.jmax, args.m, args.iters
    rng = np.random.default_rng(0)
    oriented, lengths, a_oid, b_oid, d0 = make_batch(rng, 512, 4096, Mn, J)

    dev_o = put_chunked(oriented)
    la = robust(lambda: jax.device_put(lengths.astype(np.int32)[a_oid >> 1]), "la")
    lb = robust(lambda: jax.device_put(lengths.astype(np.int32)[b_oid >> 1]), "lb")
    d0_d = robust(lambda: jax.device_put(d0.astype(np.int32)), "d0")
    a_oid_d = robust(lambda: jax.device_put(a_oid.astype(np.int32)), "a_oid")
    b_oid_d = robust(lambda: jax.device_put(b_oid.astype(np.int32)), "b_oid")

    res = {"m": Mn, "jmax": J, "band": W, "iters": iters}

    gather = jax.jit(lambda o, ai, bi: (o[ai], o[bi]))
    a_rows, b_rows = gather(dev_o, a_oid_d, b_oid_d)
    np.asarray(a_rows[0])

    fwd_prep = jax.jit(partial(M._fwd_prep, W=W, J=J))
    res["fwd_prep_ms"] = round(
        timed(lambda: fwd_prep(a_rows, b_rows, la, lb, d0_d), iters) * 1e3, 2
    )

    peq_f, b2T, la_rel, m0 = fwd_prep(a_rows, b_rows, la, lb, d0_d)
    bpk = jax.jit(MP._pack_b)(b2T)
    fwd = MP._get_fwd(W, J, False)
    qf = jax.jit(
        lambda la_rel, la, lb, d0, peq, bpk: fwd(
            MP._q(la_rel), MP._q(la), MP._q(lb), MP._q(d0), MP._q(peq), MP._q(bpk)
        )
    )
    res["fwd_kernel_ms"] = round(
        timed(lambda: qf(la_rel, la, lb, d0_d, peq_f, bpk), iters) * 1e3, 2
    )

    cost_f, iend_rel, jend2, win = qf(la_rel, la, lb, d0_d, peq_f, bpk)
    iend = (iend_rel.reshape(-1) + m0 * 32).astype(jnp.int32)
    jend = jend2.reshape(-1).astype(jnp.int32)

    rev_prep = jax.jit(partial(M._rev_prep, W=W, J=J))
    res["rev_prep_ms"] = round(
        timed(lambda: rev_prep(a_rows, b_rows, la, lb, iend, jend, d0_d), iters)
        * 1e3, 2,
    )

    peq_r, b2T_r, row_off = rev_prep(a_rows, b_rows, la, lb, iend, jend, d0_d)
    bpk_r = jax.jit(MP._pack_b)(b2T_r)
    rev = MP._get_rev(W, J, False)
    qr = jax.jit(
        lambda row_off, iend, jend, peq, bpk: rev(
            MP._q(row_off), MP._q(iend), MP._q(jend), MP._q(peq), MP._q(bpk)
        )
    )
    res["rev_kernel_ms"] = round(
        timed(lambda: qr(row_off, iend, jend, peq_r, bpk_r), iters) * 1e3, 2
    )

    full = jax.jit(partial(MP.myers_pallas_pair_core, W=W, J=J))
    res["full_ms"] = round(
        timed(lambda: full(a_rows, b_rows, la, lb, d0_d), iters) * 1e3, 2
    )

    print(json.dumps(res))


if __name__ == "__main__":
    main()
