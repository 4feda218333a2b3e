"""Pallas fused covariance kernel vs the jnp reference path (interpret mode on
CPU; the same code compiles on TPU).

NB: ``pltpu.force_tpu_interpret_mode()`` (jax 0.9's faithful TPU simulator)
deadlocks on this CPU stack even for trivial kernels, so these tests force the
generic ``pallas_call(interpret=True)`` path via the module flag instead."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wt_pse_tpu.ops import whitening_pallas
from wt_pse_tpu.ops.whitening import feature_covariance


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(whitening_pallas, "INTERPRET", True)


def test_pallas_covariance_matches_jnp(rng):
    from wt_pse_tpu.ops.whitening_pallas import feature_covariance_pallas

    z = jnp.asarray(rng.randn(3, 64, 64, 16).astype(np.float32))
    got = feature_covariance_pallas(z)
    want = feature_covariance(z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pallas_covariance_nonaligned_hw(rng):
    from wt_pse_tpu.ops.whitening_pallas import feature_covariance_pallas

    z = jnp.asarray(rng.randn(2, 48, 48, 16).astype(np.float32))  # HW=2304 < TILE
    np.testing.assert_allclose(np.asarray(feature_covariance_pallas(z)),
                               np.asarray(feature_covariance(z)),
                               rtol=1e-5, atol=1e-5)


def test_pallas_covariance_gradient_matches(rng):
    from wt_pse_tpu.ops.whitening_pallas import feature_covariance_pallas

    z = jnp.asarray(rng.randn(2, 32, 32, 16).astype(np.float32))

    def loss_p(z):
        cov = feature_covariance_pallas(z)
        return jnp.sum(jnp.abs(cov)) + jnp.sum(cov ** 2)

    def loss_j(z):
        cov = feature_covariance(z)
        return jnp.sum(jnp.abs(cov)) + jnp.sum(cov ** 2)

    gp = jax.grad(loss_p)(z)
    gj = jax.grad(loss_j)(z)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gj), rtol=1e-4, atol=1e-4)
