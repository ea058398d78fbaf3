"""Test env: force CPU backend with 8 virtual devices.

This is the multi-chip-without-a-cluster harness (SURVEY.md §5): sharding
code paths (`jax.sharding.Mesh`, shard_map, collectives) are exercised on an
8-device virtual CPU mesh.

NOTE: in this environment an `axon` PJRT plugin (remote TPU tunnel) overrides
the JAX_PLATFORMS *environment variable*, so plain env forcing silently runs
tests on the real TPU chip — with 1-4 minute remote compiles.  Only
`jax.config.update("jax_platforms", "cpu")` reliably wins; likewise
`jax_num_cpu_devices` is the supported way to fork virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count is ignored here).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # belt and braces; see note above

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
