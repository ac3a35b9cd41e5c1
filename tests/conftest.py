"""Test harness setup: force CPU with 8 virtual devices.

The reference tests multi-node behavior with mpirun -n N on one host
(SURVEY.md §4); our analog is XLA's virtual host-platform device count,
giving a real 8-device mesh for shard_map tests without TPU hardware.
Must run before any JAX backend initialization.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
