"""Test env: force CPU backend with 8 virtual devices BEFORE jax import.

This is the multi-chip-without-a-cluster harness (SURVEY.md §5): sharding
code paths (`jax.sharding.Mesh`, shard_map, collectives) are exercised on an
8-device virtual CPU mesh.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
