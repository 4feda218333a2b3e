"""reference_lr_schedule vs the lr_update formula (Trainer.py:989-1004).

The oracle below IS the reference formula, computed with python's
``bisect_right`` exactly as ``lr_update`` does. The reference ships the call
commented out (Trainer.py:1040) but DOES define its arguments right above the
epoch loop (Trainer.py:1017-1022: warmup_factor=0.001, Steps=(100,150),
gamma=0.5, warmup_steps=max_epoch*2) — and the call site sits AFTER
train_epoch(), so training epoch 0 runs at the constructor lr and epoch e at
the formula evaluated at e-1. The schedule reproduces exactly that.
"""

from bisect import bisect_right

import numpy as np
import pytest

from wt_pse_tpu.train.lr import (reference_lr_kwargs, reference_lr_schedule,
                                 reference_lr_value)


def _formula(base_lr, epoch, warmup_steps, warmup_factor, gamma, steps):
    alpha = epoch / warmup_steps
    factor = warmup_factor * (1 - alpha) + alpha
    return base_lr * factor * gamma ** bisect_right(sorted(steps), epoch)


def _oracle(base_lr, epoch, ws, wf, gamma, steps, ctor_lr=None):
    """lr in effect during training epoch e under the reference's
    after-the-epoch call site (Trainer.py:1040)."""
    if epoch == 0:
        return base_lr if ctor_lr is None else ctor_lr
    return _formula(base_lr, epoch - 1, ws, wf, gamma, steps)


def test_reference_kwargs_match_call_site():
    """Trainer.py:1017-1022: the argument block above the epoch loop."""
    kw = reference_lr_kwargs(max_epoch=200)
    assert kw == dict(warmup_steps=400, warmup_factor=0.001, gamma=0.5,
                      milestones=(100, 150))


@pytest.mark.parametrize("milestones", [[], [5], [5, 12], [0, 3, 3, 20]])
def test_schedule_matches_reference_call_timing(milestones):
    base, ws, wf, gamma = 5e-4, 10, 1 / 3, 0.1
    sched = reference_lr_schedule(base, updates_per_epoch=4, warmup_steps=ws,
                                  warmup_factor=wf, gamma=gamma,
                                  milestones=milestones)
    for epoch in range(0, 30):
        want = _oracle(base, epoch, ws, wf, gamma, milestones)
        # every iteration inside the epoch sees the epoch's lr (the reference
        # applies lr_update once per epoch)
        for it in (0, 1, 3):
            got = float(sched(epoch * 4 + it))
            np.testing.assert_allclose(got, want, rtol=1e-6,
                                       err_msg=f"epoch={epoch} it={it}")
        # host-side logging helper agrees with the traced schedule
        np.testing.assert_allclose(
            reference_lr_value(base, epoch, ws, wf, gamma, milestones),
            want, rtol=1e-6)


def test_epoch_zero_uses_constructor_lr():
    """Epoch 0 trains at the CONSTRUCTOR lr (lr_update hasn't run yet); for
    the shape optimizers that is lr_od_shape, not the od base lr that
    lr_update overwrites them with from epoch 1 on (Trainer.py:996-1004)."""
    base, ctor = 5e-4, 1e-4
    sched = reference_lr_schedule(base, updates_per_epoch=2, warmup_steps=8,
                                  warmup_factor=0.001, gamma=0.5,
                                  milestones=(100, 150), first_epoch_lr=ctor)
    assert float(sched(0)) == pytest.approx(ctor)
    assert float(sched(1)) == pytest.approx(ctor)      # still epoch 0
    # epoch 1 -> formula at epoch 0 -> base * warmup_factor
    assert float(sched(2)) == pytest.approx(base * 0.001)
    assert reference_lr_value(base, 0, 8, 0.001, 0.5, (100, 150),
                              first_epoch_lr=ctor) == pytest.approx(ctor)


def test_multi_turn_updates_per_epoch():
    """A shape student stepping multi_turn times per iteration must divide its
    count by iter_per_epoch * multi_turn — same lr trajectory per epoch."""
    kw = dict(warmup_steps=6, warmup_factor=0.1, gamma=0.5, milestones=[3])
    seg = reference_lr_schedule(1e-3, updates_per_epoch=4, **kw)
    shape = reference_lr_schedule(1e-3, updates_per_epoch=8, **kw)  # turn=2
    for epoch in range(10):
        np.testing.assert_allclose(float(seg(epoch * 4)),
                                   float(shape(epoch * 8)), rtol=1e-7)
        np.testing.assert_allclose(float(seg(epoch * 4 + 3)),
                                   float(shape(epoch * 8 + 7)), rtol=1e-7)


def test_warmup_quirk_replicated_and_clampable():
    """The reference formula has no alpha<=1 clamp: past warmup_steps epochs
    the factor keeps growing linearly (warmup_factor*(1-a)+a > 1 for a > 1).
    The default replicates that; clamp_warmup=True pins it at base_lr.
    (applied_after_epoch=False isolates the bare formula.)"""
    kw = dict(updates_per_epoch=1, warmup_steps=4, warmup_factor=0.25,
              gamma=0.1, milestones=[], applied_after_epoch=False)
    quirk = reference_lr_schedule(1.0, **kw)
    clamp = reference_lr_schedule(1.0, clamp_warmup=True, **kw)
    assert float(quirk(4)) == pytest.approx(1.0)
    assert float(quirk(8)) == pytest.approx(0.25 * (1 - 2.0) + 2.0)  # 1.75
    assert float(clamp(8)) == pytest.approx(1.0)
    # warmup start: epoch 0 -> warmup_factor * base
    assert float(quirk(0)) == pytest.approx(0.25)


def test_schedule_drives_optax_adam():
    """optax.adam accepts the schedule; update magnitude scales with it (an
    Adam step on a constant gradient has magnitude ~lr)."""
    import jax.numpy as jnp
    import optax

    sched = reference_lr_schedule(1e-2, updates_per_epoch=1, warmup_steps=1,
                                  warmup_factor=1.0, gamma=0.1, milestones=[2],
                                  applied_after_epoch=False)
    tx = optax.adam(sched, b1=0.9, b2=0.99, eps=1e-8)
    params = {"w": jnp.ones((3,))}
    opt = tx.init(params)
    grads = {"w": jnp.ones((3,))}
    u0, opt = tx.update(grads, opt, params)   # count 0 -> epoch 0: lr 1e-2
    u1, opt = tx.update(grads, opt, params)   # count 1 -> epoch 1: lr 1e-2
    u2, opt = tx.update(grads, opt, params)   # count 2 -> epoch 2: decayed 1e-3
    m0 = float(jnp.abs(u0["w"]).mean())
    m2 = float(jnp.abs(u2["w"]).mean())
    assert m0 == pytest.approx(1e-2, rel=0.05)
    assert m2 == pytest.approx(1e-3, rel=0.05)


def test_schedule_rejects_bad_args():
    with pytest.raises(ValueError):
        reference_lr_schedule(1e-3, updates_per_epoch=1, warmup_steps=0)
    with pytest.raises(ValueError):
        reference_lr_schedule(1e-3, updates_per_epoch=0, warmup_steps=1)
