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

# NOTE: do NOT pin jax_default_matmul_precision here. The ambient default on
# this stack is bf16-level even for f32 inputs; parity-critical production code
# pins Precision.HIGHEST at each site (model convs, resize, whitening, MMD,
# blur). Tests run under the ambient default precisely so an unpinned site
# fails loudly here instead of silently degrading checkpoint parity in prod.

import numpy as np
import pytest

import jax

# Persistent compile cache (same dir bench.py uses; entries are keyed by
# platform so CPU test programs and TPU bench programs coexist). The suite
# jit-compiles ~100 distinct programs; cold that dominates wall-clock, warm
# reruns skip it entirely.
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: compile-heavy e2e/parallel/whole-step tests (scripts/test.sh "
        "deselects them by default; opt in with scripts/test.sh --slow)")


@pytest.fixture
def rng():
    return np.random.RandomState(0)
