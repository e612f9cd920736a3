"""Test harness: force an 8-virtual-device CPU backend before JAX loads.

Distributed (data-parallel) logic is tested on a host CPU mesh exactly as
SURVEY.md section 4 prescribes, so no TPU is needed to run the suite.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
