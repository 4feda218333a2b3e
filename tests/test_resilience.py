"""NaN auto-recovery rollback in the Trainer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wt_pse_tpu.config import default_hparams
from wt_pse_tpu.data.fundus import FundusDomain
from wt_pse_tpu.train.trainer import Trainer

pytestmark = pytest.mark.slow  # compile-heavy; scripts/test.sh default skips


def _dom(n=6, hw=32, seed=0):
    r = np.random.RandomState(seed)
    return FundusDomain(
        images=(r.rand(n, hw, hw, 3) * 255).astype(np.uint8),
        labels=r.choice([0, 128, 255], size=(n, hw, hw)).astype(np.uint8),
        names=[str(i) for i in range(n)])


def test_nan_rollback(tmp_path):
    val = FundusDomain(images=_dom(2).images,
                       labels=[l for l in _dom(2).labels], names=["a", "b"])
    t = Trainer(hparams=default_hparams("WT_PSE"),
                train_domains=[_dom(seed=s) for s in (1, 2, 3)], val_domain=val,
                out_dir=str(tmp_path / "r"), label="OD", batch_size=3,
                max_epoch=4, interval_validate=99, seed=1, image_size=32,
                nan_recovery=True)

    # patch the production (scan) driver; epoch index = first_step // iters
    real_step = t.epoch_step
    calls = {"epochs": []}

    def flaky_step(state, data, key, first_step, n_steps):
        epoch = first_step // t.iter_per_epoch
        calls["epochs"].append(epoch)
        state, metrics = real_step(state, data, key, first_step, n_steps)
        if epoch == 1:  # poison the second epoch
            metrics = dict(metrics)
            # epoch_step returns per-step stacks of shape (n_steps,)
            metrics["loss_seg"] = jnp.full((n_steps,), float("nan"))
        return state, metrics

    t.epoch_step = flaky_step
    best = t.train()  # must NOT raise
    assert len(best) == 6
    # training continued past the poisoned epoch
    assert calls["epochs"] == [0, 1, 2, 3]
    assert np.isfinite(
        float(jax.tree.leaves(t.state.od.params)[0].sum()))


def test_nan_without_recovery_raises(tmp_path):
    import pytest

    val = FundusDomain(images=_dom(2).images,
                       labels=[l for l in _dom(2).labels], names=["a", "b"])
    t = Trainer(hparams=default_hparams("WT_PSE"),
                train_domains=[_dom(seed=s) for s in (1, 2, 3)], val_domain=val,
                out_dir=str(tmp_path / "r2"), label="OD", batch_size=3,
                max_epoch=2, interval_validate=99, seed=1, image_size=32)

    real_step = t.epoch_step

    def poison(state, data, key, first_step, n_steps):
        state, metrics = real_step(state, data, key, first_step, n_steps)
        metrics = dict(metrics)
        metrics["loss_seg"] = jnp.full((n_steps,), float("nan"))
        return state, metrics

    t.epoch_step = poison
    with pytest.raises(ValueError, match="nan"):
        t.train()


def test_nan_in_oc_half_raises(tmp_path):
    """The reference raises on BOTH halves (loss_data at Trainer.py:799 AND
    loss_data_oc at 884-885); the OD/OC param trees are disjoint, so an
    OC-side divergence never reaches loss_seg — the guard must read both."""
    val = FundusDomain(images=_dom(2).images,
                       labels=[l for l in _dom(2).labels], names=["a", "b"])
    t = Trainer(hparams=default_hparams("WT_PSE"),
                train_domains=[_dom(seed=s) for s in (1, 2, 3)], val_domain=val,
                out_dir=str(tmp_path / "r3"), label="OC", batch_size=3,
                max_epoch=2, interval_validate=99, seed=1, image_size=32)

    real_step = t.epoch_step

    def poison_oc(state, data, key, first_step, n_steps):
        state, metrics = real_step(state, data, key, first_step, n_steps)
        metrics = dict(metrics)
        metrics["loss_seg_oc"] = jnp.full((n_steps,), float("nan"))
        return state, metrics

    t.epoch_step = poison_oc
    with pytest.raises(ValueError, match="nan"):
        t.train()
