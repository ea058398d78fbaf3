"""Data-parallel overlap extension over a device mesh.

Candidate pair blocks are sharded along the mesh "dp" axis; each device runs
the banded DP on its shard, and compact per-pair results (cost + coords,
4 ints/pair) are merged with an `all_gather` over ICI — the collective-merge
pattern of BASELINE.json's north star ("overlap partial results merged via
jax.lax collectives before a replicated graph-cleaning pass").

Device-side compute reuses extend.dp_core: the SAME traced program as the
single-chip jnp path, so sharded and unsharded runs produce identical
results (determinism discipline, SURVEY.md §8.1).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.6
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from phasm_tpu.overlap.extend import dp_core


def sharded_extend_step(mesh: Mesh, band: int = 64, axis: str = "dp"):
    """Build the jitted data-parallel extension step for a mesh.

    Returns fn(a2, b2, la, lb, d0) -> [M, 5] int32 (cost, i0, a_end, b_end,
    window_cost), replicated on every device.  M must divide evenly by mesh
    size (pad pair batches to a multiple of the dp axis).
    """

    def local(a2, b2, la, lb, d0):
        c, i0, ie, je, wn = dp_core(a2, b2, la, lb, d0, band)
        out = jnp.stack([c, i0, ie, je, wn], axis=1)
        return jax.lax.all_gather(out, axis, axis=0, tiled=True)

    sm = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
        # the all_gather makes the output replicated, but the static
        # varying-axes checker cannot infer that
        check_vma=False,
    )

    in_sh = NamedSharding(mesh, P(axis))

    @jax.jit
    def step(a2, b2, la, lb, d0):
        return sm(a2, b2, la, lb, d0)

    def run(a2, b2, la, lb, d0):
        n = mesh.devices.size
        assert a2.shape[0] % n == 0, "pad pair batch to a multiple of mesh size"
        args = [
            jax.device_put(np.asarray(x), in_sh) for x in (a2, b2, la, lb, d0)
        ]
        return np.asarray(step(*args))

    return run
