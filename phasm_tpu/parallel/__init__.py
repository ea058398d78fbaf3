"""Multi-chip sharding layer (no reference counterpart — SURVEY.md §3.3).

The reference is single-process Python; scale-out here is data parallelism
over reads and candidate pairs on a `jax.sharding.Mesh`, with lax collectives
merging per-shard results (BASELINE.json north star: "read set and candidate
overlap pairs sharded data-parallel per host ... partial results merged via
jax.lax collectives").
"""

from phasm_tpu.parallel.mesh import make_mesh  # noqa: F401
from phasm_tpu.parallel.sharded_overlap import sharded_extend_step  # noqa: F401
