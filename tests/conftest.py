"""Test configuration: force an 8-virtual-device CPU topology.

Tests run on CPU with ``xla_force_host_platform_device_count=8`` so mesh and
sharding behavior is exercised without TPU hardware (SURVEY.md §4).

Note: this environment's sitecustomize imports jax at interpreter start (TPU
PJRT plugin registration), so env vars alone are too late — the platform is
switched via ``jax.config`` before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
