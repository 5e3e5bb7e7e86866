"""Test configuration: force an 8-device virtual CPU platform BEFORE jax import
so multi-chip sharding tests run without TPU hardware (SURVEY.md §4)."""
import os
import sys

# tests always run on the virtual CPU mesh, even when the shell environment
# points JAX at TPU hardware (e.g. JAX_PLATFORMS=axon)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# repo root importable regardless of pytest invocation directory
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# the env var alone is not honored here (the TPU harness pins its own platform
# priority); the config update reliably forces the CPU backend
jax.config.update("jax_platforms", "cpu")

# this environment's default matmul precision is bf16-like even on CPU; tests
# compare against float64/torch references, so force full f32 matmuls
jax.config.update("jax_default_matmul_precision", "highest")
