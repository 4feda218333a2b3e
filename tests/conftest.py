"""Test config: force an 8-device virtual CPU platform before jax initializes.

This is the standard JAX substitute for multi-chip testing (SURVEY.md §4): shardings
and collectives compile and run exactly as they would across a real slice.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the session env pins 'axon' (TPU); tests run on CPU
# Disable the axon sitecustomize TPU-session registration: it serializes ALL python
# processes against the single TPU claim; with it cleared, CPU test runs proceed
# concurrently with TPU jobs.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
