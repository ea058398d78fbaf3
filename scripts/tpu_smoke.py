"""Real-TPU smoke test: engine pallas path == jnp path on the chip.

Runs the noisy-sim overlap engine twice on the real device (Pallas kernels
and the jnp fallback) and asserts the alignment tables are bit-identical,
then prints a one-line JSON summary.  This is the on-hardware counterpart
of the CPU interpret-mode equality tests in tests/test_overlap.py.

    python scripts/tpu_smoke.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    backend = jax.default_backend()
    from phasm_tpu.overlap import OverlapConfig, overlap_reads
    from phasm_tpu.sim import simulate_reads

    rs, truth = simulate_reads(
        seed=7, genome_len=120_000, ploidy=1, coverage=15, mean_read_len=5000,
        error_rate=0.05, read_len_spread=0.25,
    )
    t0 = time.time()
    t_pallas = overlap_reads(rs, OverlapConfig(backend="pallas"))
    t_pal = time.time() - t0
    t0 = time.time()
    t_jnp = overlap_reads(rs, OverlapConfig(backend="jnp"))
    t_jnp_s = time.time() - t0
    same = bool(np.array_equal(t_pallas.as_matrix(), t_jnp.as_matrix()))
    print(
        json.dumps(
            {
                "backend": backend,
                "n_reads": rs.n_reads,
                "n_alignments": len(t_pallas),
                "pallas_seconds": round(t_pal, 1),
                "jnp_seconds": round(t_jnp_s, 1),
                "bit_identical": same,
            }
        )
    )
    if not same:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
