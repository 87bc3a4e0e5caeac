"""Test configuration: force CPU with 8 virtual devices so tests run without
TPU hardware and sharding tests exercise a multi-chip mesh (the driver
separately dry-runs the multi-chip path via __graft_entry__.dryrun_multichip).

The container's sitecustomize registers an 'axon' TPU backend and sets
jax_platforms='axon,cpu' via jax.config (overriding the env var), so we must
counter-override through jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
