"""Prototype: per-pair DMA window-fetch kernels for the myers table path.

Replaces the XLA gather+transpose+barrel/funnel prep (measured 11.6 ms of
the 22.7 ms production batch, myers_tab_bisect round 4) with Pallas kernels
that DMA each pair's window words straight from the HBM-resident tables
(scalar-prefetched oids/offsets), transpose in VMEM, and emit the exact
peq/bpk layouts the DP kernels consume.

    python scripts/myers_dma_proto.py [--check]   # CPU interpret-mode check
    python scripts/myers_dma_proto.py --tpu       # TPU timing
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WB = 32


def make_fwd_fetch(W, J, PWp, BWp, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from phasm_tpu.overlap.myers import K_of

    K = K_of(W)
    NBLK = J // WB + K
    JW = J // 16
    R = 8
    BLK = R * 128

    def kernel(a_s, b_s, s_s, peq_hbm, bpk_hbm, peq_out, bpk_out,
               pbuf, bbuf, sems):
        step = pl.program_id(0)
        base = step * BLK

        def pdma(p):
            return pltpu.make_async_copy(
                peq_hbm.at[a_s[base + p], 0:4, pl.ds(s_s[base + p], NBLK)],
                pbuf.at[p],
                sems.at[0],
            )

        def bdma(p):
            return pltpu.make_async_copy(
                bpk_hbm.at[b_s[base + p], 0, pl.ds(0, JW)],
                bbuf.at[p],
                sems.at[1],
            )

        def issue(p, _):
            pdma(p).start()
            bdma(p).start()
            return _

        jax.lax.fori_loop(0, BLK, issue, None)

        def drain(p, _):
            pdma(p).wait()
            bdma(p).wait()
            return _

        jax.lax.fori_loop(0, BLK, drain, None)

        peq_out[:] = jnp.transpose(pbuf[:], (2, 1, 0)).reshape(
            NBLK, 4, R, 128
        )
        bpk_out[:] = jnp.transpose(bbuf[:], (1, 0)).reshape(JW, R, 128)

    def run(a_oid, b_oid, sfw, peq_tab, bpk_tab):
        B = a_oid.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B // BLK,),
            in_specs=[
                # tables MUST stay in HBM: Mosaic places small ANY inputs in
                # VMEM, where a 4-plane / arbitrary-word slice breaks (8,128)
                # tiling ("Slice shape along dimension 1 must be aligned");
                # HBM refs are byte-addressed so per-pair window slices with
                # arbitrary word offsets are legal DMA sources
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=(
                pl.BlockSpec(
                    (NBLK, 4, R, 128), lambda i, *_: (0, 0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (JW, R, 128), lambda i, *_: (0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            scratch_shapes=[
                pltpu.VMEM((BLK, 4, NBLK), jnp.uint32),
                pltpu.VMEM((BLK, JW), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((NBLK, 4, B // 128, 128), jnp.uint32),
                jax.ShapeDtypeStruct((JW, B // 128, 128), jnp.int32),
            ),
            interpret=interpret,
        )(a_oid, b_oid, sfw, peq_tab, bpk_tab)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--B", type=int, default=2048)
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from phasm_tpu.overlap import myers as M
    from phasm_tpu.overlap import myers_pallas as MP
    from phasm_tpu.overlap.extend import _enable_compilation_cache

    _enable_compilation_cache()
    interpret = not args.tpu
    W, J = 64, 2048
    B = args.B
    rng = np.random.default_rng(0)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")
    from bench import make_batch, put_chunked, robust

    n_reads, read_len = 512, 4096
    oriented, lengths, a_oid, b_oid, d0 = make_batch(
        rng, n_reads, read_len, B, J
    )
    dev_o = put_chunked(oriented) if args.tpu else jnp.asarray(oriented)
    lengths_d = jnp.asarray(lengths.astype(np.int32))
    tabs = jax.jit(M.build_myers_tables)(dev_o, lengths_d)
    peq, bpk = tabs["peq"], tabs["bpk"]
    PW, BW = peq.shape[2], bpk.shape[2]
    # DMA pad: fetch windows can start up to ~PW-4 and read NBLK(+1) words
    PAD = 96
    peq_p = jnp.pad(peq, ((0, 0), (0, 0), (0, PAD)))
    bpk_p = jnp.pad(bpk, ((0, 0), (0, 0), (0, J // 16 + 8)))

    ai = jnp.asarray(a_oid.astype(np.int32))
    bi = jnp.asarray(b_oid.astype(np.int32))
    d0d = jnp.asarray(d0.astype(np.int32))

    @jax.jit
    def ref_prep(peq_tab, bpk_tab, a_oid, b_oid, d0):
        la = lengths_d[a_oid >> 1]
        peqT = jnp.transpose(peq_tab[a_oid], (2, 1, 0))
        bpkT = jnp.transpose(bpk_tab[b_oid], (2, 1, 0))
        return M.fwd_prep_tab(peqT, bpkT, la, d0, W, J)

    peq_f, bpk_f, la_rel, m0 = ref_prep(peq, bpk, ai, bi, d0d)

    fetch = make_fwd_fetch(W, J, PW + PAD, BW, interpret=interpret)
    sfw = jax.jit(lambda d: (M.fwd_anchor(d, W) + M.F_TAB).astype(jnp.int32))(
        d0d
    )
    print("sfw range:", int(sfw.min()), int(sfw.max()), "PW", PW)
    fetch_j = jax.jit(lambda a, b, s, p, k: fetch(a, b, s, p, k))
    peq_g, bpk_g = fetch_j(ai, bi, sfw, peq_p, bpk_p)

    pf = np.asarray(peq_f).reshape(-1, 4, B // 128, 128)
    pg = np.asarray(peq_g)
    bf = np.asarray(bpk_f).reshape(-1, B // 128, 128)
    bg = np.asarray(bpk_g)
    print("peq equal:", np.array_equal(pf, pg.astype(pf.dtype)))
    print("bpk equal:", np.array_equal(bf, bg))
    if not np.array_equal(pf, pg.astype(pf.dtype)):
        bad = np.nonzero(pf != pg)
        print("first mismatch:", [x[:5] for x in bad])

    if args.tpu:
        def loop(fn, args_, iters=20):
            robust(lambda: np.asarray(fn(*args_)[0][0]), "warm",
                   delays=(10, 30, 60))

            def t():
                t0 = time.time()
                o = None
                for _ in range(iters):
                    o = fn(*args_)
                np.asarray(o[0][0])
                return (time.time() - t0) / iters * 1e3

            return round(robust(t, "timed"), 2)

        print("fwd_fetch_ms:", loop(fetch_j, (ai, bi, sfw, peq_p, bpk_p)))
        print("ref_prep_ms:", loop(ref_prep, (peq, bpk, ai, bi, d0d)))


if __name__ == "__main__":
    main()
