"""Multi-host initialization helper.

On a real v5e/v5p pod slice each host runs the same program;
`initialize()` wires `jax.distributed` so `jax.devices()` spans the slice
and the dp mesh in mesh.py covers every chip.  Overlap batches are sharded
per-host by `shard_map` (parallel/sharded_overlap.py) and the merged
alignment table is identical on every host (all_gather + canonical dedup),
so the replicated graph/phasing passes need no further communication
(SURVEY.md §3.3 plan).

Not exercisable in this single-chip environment; covered by the virtual-mesh
tests and the driver's dryrun_multichip compile check.
"""
from __future__ import annotations


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Call once per host before any jax operation (TPU pods auto-detect)."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
