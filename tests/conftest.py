"""Test configuration: force a virtual 8-device CPU mesh and float64.

Tests run on CPU (the reference tests are CPU; float64 gives clean parity with
its Float64 numerics) with XLA's host-platform device-count override so the
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md
section 4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# NOTE: the environment's sitecustomize re-exports JAX_PLATFORMS=axon at
# interpreter startup, so the env var cannot be trusted; the config update
# below is what actually pins the test backend to CPU.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: recompiles of the jitted solve across test
# sessions are the dominant cost (the solve is one large while-loop program)
from iterativelqr_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache("cpu")  # per-platform dir: see compile_cache.py
