"""Mesh construction helpers.

Axes:
  dp — data parallelism over candidate pair blocks (and read blocks during
       seeding).  This is the throughput axis; BASELINE.md's 1->2 host
       scaling target rides it.

The graph-cleaning and phasing passes run replicated in v1 (the graph is
small relative to alignment work — SURVEY.md §8.1); sharded graph passes
are a later milestone.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))
