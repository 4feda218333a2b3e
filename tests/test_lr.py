"""reference_lr_schedule vs the lr_update formula (Trainer.py:989-1004).

The oracle below IS the reference formula, computed with python's
``bisect_right`` exactly as ``lr_update`` does — the reference ships the helper
with its call commented out (Trainer.py:1040), so there is no runnable torch
path to diff against; the formula is the spec.
"""

from bisect import bisect_right

import numpy as np
import pytest

from wt_pse_tpu.train.lr import reference_lr_schedule


def _oracle(base_lr, epoch, warmup_steps, warmup_factor, gamma, steps):
    alpha = epoch / warmup_steps
    factor = warmup_factor * (1 - alpha) + alpha
    return base_lr * factor * gamma ** bisect_right(sorted(steps), epoch)


@pytest.mark.parametrize("milestones", [[], [5], [5, 12], [0, 3, 3, 20]])
def test_schedule_matches_reference_formula(milestones):
    base, ws, wf, gamma = 5e-4, 10, 1 / 3, 0.1
    sched = reference_lr_schedule(base, iter_per_epoch=4, warmup_steps=ws,
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


def test_warmup_quirk_replicated_and_clampable():
    """The reference formula has no alpha<=1 clamp: past warmup_steps epochs the
    factor keeps growing linearly (warmup_factor*(1-a)+a > 1 for a > 1). The
    default replicates that; clamp_warmup=True pins it at base_lr."""
    kw = dict(iter_per_epoch=1, warmup_steps=4, warmup_factor=0.25, gamma=0.1,
              milestones=[])
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

    sched = reference_lr_schedule(1e-2, iter_per_epoch=1, warmup_steps=1,
                                  warmup_factor=1.0, gamma=0.1, milestones=[2])
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
        reference_lr_schedule(1e-3, iter_per_epoch=1, warmup_steps=0)
    with pytest.raises(ValueError):
        reference_lr_schedule(1e-3, iter_per_epoch=0)
