"""Test harness: force an 8-virtual-device CPU backend before JAX loads.

Distributed (data-parallel) logic is tested on a host CPU mesh exactly as
SURVEY.md section 4 prescribes, so no TPU is needed to run the suite.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # XLA:CPU hard-aborts (SIGABRT, rendezvous.cc) any collective whose
    # participant threads don't all arrive within 40 s. The spatially
    # partitioned graphs run hundreds of halo collectives over 8 virtual
    # devices on however few cores the test host has — under load that
    # deadline is reachable, so raise it (correctness tests don't care
    # about stuck-detection latency).
    flags = (flags
             + " --xla_cpu_collective_call_terminate_timeout_seconds=600"
             + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
             ).strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The axon TPU plugin force-registers itself and ignores JAX_PLATFORMS
# from the environment; the config update below reliably pins tests to
# the 8-virtual-device CPU backend.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeat suite runs skip XLA compiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/maskrcnn_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.default_backend() == "cpu"
assert jax.device_count() >= 8, "virtual CPU mesh not active"


@pytest.fixture
def rng():
    return np.random.RandomState(0)
