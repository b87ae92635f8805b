"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
``xla_force_host_platform_device_count`` (SURVEY.md §4: the multi-device
testing the reference lacks).  Note: under the axon TPU harness the
JAX_PLATFORMS env var is overridden, so we must also force the platform
through jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# f64 correctness oracles on CPU (the TPU production path is f32/bf16).
jax.config.update("jax_enable_x64", True)
