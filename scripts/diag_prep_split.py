"""Time the tab2 XLA prep (gather, step-major relayout) vs the kernels."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from phasm_tpu.overlap import myers as MY
    from phasm_tpu.overlap import myers_pallas as MP
    from phasm_tpu.overlap.extend import _enable_compilation_cache, put_chunked

    _enable_compilation_cache()
    W, J, B = 64, 2048, 65536
    LA = 4096
    n_reads = 512
    rng = np.random.default_rng(0)
    oriented = rng.integers(0, 4, (2 * n_reads, LA)).astype(np.uint8)
    lengths = np.full(n_reads, LA, dtype=np.int32)
    dev_o = put_chunked(oriented)
    lengths_d = jax.device_put(lengths)
    tabs = jax.jit(MY.build_myers_tables_blocked)(dev_o, lengths_d)
    win_tab = tabs["win"]
    print("win_tab shape/bytes:", win_tab.shape,
          win_tab.size * win_tab.dtype.itemsize / 1e6, "MB", flush=True)

    R = MP.blk_rows2(W, J)
    NBb, NBc = MY.blocked_counts(LA)
    GF, GR, GB = MY.tab2_geometry(W, J)
    print(f"R={R} GF={GF} GR={GR} GB={GB} NBb={NBb}", flush=True)
    a_oid = jax.device_put((2 * rng.integers(0, n_reads, B)).astype(np.int32))
    s32 = jax.device_put(rng.integers(0, NBb - GF, B).astype(np.int32))

    n_rows = win_tab.shape[0]

    @jax.jit
    def gather_only(a_oid, s32):
        idx = jnp.clip(
            (a_oid * NBb + s32)[:, None]
            + jnp.arange(GF + 1, dtype=jnp.int32)[None, :],
            0, n_rows - 1,
        )
        return jnp.sum(win_tab[idx].astype(jnp.uint32) & 1)

    @jax.jit
    def gather_relayout(a_oid, s32):
        idx = jnp.clip(
            (a_oid * NBb + s32)[:, None]
            + jnp.arange(GF + 1, dtype=jnp.int32)[None, :],
            0, n_rows - 1,
        )
        return jnp.sum(MP._step_major(win_tab[idx], R).astype(jnp.uint32) & 1)

    def timeit(fn, *args, n=10):
        out = fn(*args)
        np.asarray(out)  # warm; scalar fetch
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        np.asarray(out)
        return (time.time() - t0) / n

    tg = timeit(gather_only, a_oid, s32)
    tr = timeit(gather_relayout, a_oid, s32)
    print(f"gather only (+reduce): {tg*1e3:.1f} ms", flush=True)
    print(f"gather + step_major (+reduce): {tr*1e3:.1f} ms", flush=True)
    print(f"(fwd+rev prep ~2x the latter minus reduce; kernel-only 16.9 ms/64k)")


if __name__ == "__main__":
    main()
