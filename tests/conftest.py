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

# skip the drivers' end-of-run PC stage breakdown (3 extra XLA compiles
# per driver invocation — pure compile cost, nothing tested by it)
os.environ.setdefault("PORO_PC_TIMINGS", "0")

import jax

jax.config.update("jax_platforms", "cpu")
# f64 correctness oracles on CPU (the TPU production path is f32/bf16).
jax.config.update("jax_enable_x64", True)
# Persistent XLA executable cache: the sharded-solve tests compile
# multi-minute GSPMD programs on this 2-vCPU host; identical programs
# (across tests and across suite re-runs) load from disk instead.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".cache", "xla")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
