"""Sharded-overlap scaling harness.

Measures the data-parallel extension step at mesh sizes 1/2/4/8 and prints
per-size wall time + efficiency vs 1 device.  On this machine only a
*virtual* CPU mesh exists (devices share the same cores), so the numbers
validate plumbing + determinism, not real scaling; on a real pod slice the
same script measures the BASELINE.md 1->2 host >= 85% target (pairs are
embarrassingly parallel and the merged result is 16 bytes/pair, so the
collective is negligible — the target should hold with margin).

    JAX_PLATFORMS=cpu python scripts/scaling_bench.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    # force the virtual CPU mesh via config BEFORE backend init: the axon
    # plugin ignores JAX_PLATFORMS env, and probing default_backend() would
    # initialize the TPU first.  On a real pod slice, delete these two lines.
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    except RuntimeError:
        pass  # backends already initialized by the caller

    from phasm_tpu.overlap.extend import prepare_pair_tensors
    from phasm_tpu.parallel import make_mesh, sharded_extend_step

    rng = np.random.default_rng(0)
    N, L, W, JMAX = 128, 2048, 64, 1024
    M = 512
    oriented = rng.integers(0, 4, (2 * N, L)).astype(np.uint8)
    lengths = np.full(N, L, dtype=np.int32)
    a_oid = 2 * rng.integers(0, N, M)
    b_oid = 2 * rng.integers(0, N, M)
    d0 = rng.integers(0, 256, M).astype(np.int32)
    a2, b2, la, lb = prepare_pair_tensors(oriented, lengths, a_oid, b_oid, d0, W, JMAX)

    n_avail = len(jax.devices())
    results = {}
    base = None
    ref_out = None
    for n in (1, 2, 4, 8):
        if n > n_avail:
            break
        run = sharded_extend_step(make_mesh(n), band=W)
        out = run(a2, b2, la, lb, d0)  # compile + warm
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            out = run(a2, b2, la, lb, d0)
        dt = (time.time() - t0) / reps
        if ref_out is None:
            ref_out = out
            base = dt
        assert np.array_equal(out, ref_out), "sharded result differs!"
        results[n] = {
            "seconds": round(dt, 4),
            "efficiency_vs_1": round(base / (dt * n), 3),
        }
    print(json.dumps({"mesh_scaling": results, "note": "virtual mesh shares cores"}))


if __name__ == "__main__":
    main()
