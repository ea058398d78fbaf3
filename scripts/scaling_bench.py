"""Sharded-overlap scaling harness on the PRODUCTION engine.

Measures ``overlap_reads(mesh=make_mesh(n))`` — the full production path:
host seeding, sharded DeviceExtender batches (shard_map + all_gather merge),
band escalation, canonical dedup — at mesh sizes 1/2/4/8, asserting the
table stays bit-identical at every size.

CAVEAT (recorded in the output): on this machine only a *virtual* CPU mesh
exists — the 8 "devices" share the same physical cores, so wall time CANNOT
improve with mesh size and the efficiency column measures sharding OVERHEAD
(partition + collective cost), not real scaling.  On a real pod slice the
same script measures the BASELINE.md 1->2-host >= 85% target (pair batches
are embarrassingly parallel; the merged result is 20 bytes/pair, so the
all_gather is negligible at any realistic batch).

    python scripts/scaling_bench.py [--out SCALING_r3.json]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    # force the virtual CPU mesh via config BEFORE backend init: the axon
    # plugin ignores JAX_PLATFORMS env, and probing default_backend() would
    # initialize the TPU first.  On a real pod slice, delete these two lines.
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    except RuntimeError:
        pass  # backends already initialized by the caller

    from phasm_tpu.overlap import OverlapConfig, overlap_reads
    from phasm_tpu.parallel import make_mesh
    from phasm_tpu.sim import simulate_reads

    rs, _ = simulate_reads(
        seed=5, genome_len=40_000, ploidy=2, coverage=12, mean_read_len=3000,
        error_rate=0.04, read_len_spread=0.2,
    )
    cfg = OverlapConfig()

    n_avail = len(jax.devices())
    results = {}
    base = None
    ref = None
    for n in (1, 2, 4, 8):
        if n > n_avail:
            break
        mesh = make_mesh(n) if n > 1 else None
        t = overlap_reads(rs, cfg, mesh=mesh)  # compile + warm
        t0 = time.time()
        for _ in range(args.reps):
            t = overlap_reads(rs, cfg, mesh=mesh)
        dt = (time.time() - t0) / args.reps
        if ref is None:
            ref = t
            base = dt
        assert np.array_equal(t.as_matrix(), ref.as_matrix()), (
            f"mesh={n}: sharded table differs from single-device!"
        )
        results[n] = {
            "seconds": round(dt, 3),
            "alignments": len(t),
            "speedup_vs_1": round(base / dt, 3),
            "efficiency_vs_1": round(base / (dt * n), 3),
        }
        print(f"# mesh={n}: {dt:.3f}s, {len(t)} alignments", file=sys.stderr)

    out = {
        "path": "production overlap_reads(mesh=)",
        "reads": rs.n_reads,
        "mesh_scaling": results,
        "bit_identical_across_mesh_sizes": True,
        "caveat": (
            "virtual CPU mesh: all devices share the same physical cores, "
            "so wall time cannot improve with n; efficiency here measures "
            "sharding overhead only.  Real >=85% 1->2-host measurement "
            "remains blocked on multi-chip hardware (single chip via axon "
            "tunnel this round)."
        ),
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
