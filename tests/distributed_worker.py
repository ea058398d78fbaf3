"""Worker for the multi-process jax.distributed CPU harness.

Spawned by tests/test_distributed_procs.py:

    python tests/distributed_worker.py <process_id> <num_processes> <port>

Each process contributes 2 virtual CPU devices; the global mesh spans
num_processes * 2 devices across OS processes with Gloo collectives.  The
worker runs the PRODUCTION overlap engine on the global mesh
(overlap_reads(mesh=...)) and prints digests the parent compares:

    DIGEST <process_id> <sha256(local_table)> <sha256(mesh_table)>

Both digests must be equal to each other (sharded == unsharded) and across
processes (cross-process determinism).  SURVEY.md §5 multi-process harness;
this is what makes phasm_tpu.parallel.distributed.initialize() exercised
code rather than a pass-through (VERDICT r1 #7).
"""
import hashlib
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # axon plugin overrides env vars
jax.config.update("jax_num_cpu_devices", 2)


def main():
    pid, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    from phasm_tpu.parallel.distributed import initialize

    initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=n_proc,
        process_id=pid,
    )
    assert jax.process_count() == n_proc
    assert len(jax.devices()) == 2 * n_proc

    import numpy as np

    from phasm_tpu.overlap import OverlapConfig, overlap_reads
    from phasm_tpu.parallel import make_mesh
    from phasm_tpu.sim import simulate_reads

    rs, _ = simulate_reads(
        seed=5, genome_len=8_000, ploidy=1, coverage=8, mean_read_len=2000,
        error_rate=0.04, read_len_spread=0.2,
    )
    cfg = OverlapConfig()
    t_local = overlap_reads(rs, cfg)  # single-device baseline
    mesh = make_mesh()  # all global devices
    assert mesh.devices.size == 2 * n_proc
    t_mesh = overlap_reads(rs, cfg, mesh=mesh)

    def digest(t):
        return hashlib.sha256(
            np.ascontiguousarray(t.as_matrix()).tobytes()
        ).hexdigest()

    assert len(t_local) > 0
    print(f"DIGEST {pid} {digest(t_local)} {digest(t_mesh)}", flush=True)


if __name__ == "__main__":
    main()
