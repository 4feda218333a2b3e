"""Learning-rate schedule parity: the reference's (disabled) ``lr_update``.

``Trainer.lr_update`` (``/root/reference/Trainer.py:989-1004``) implements a
linear-warmup + milestone-step-decay schedule applied once per *epoch*:

    alpha  = epoch / warmup_steps
    factor = warmup_factor * (1 - alpha) + alpha
    lr     = base_lr * factor * gamma ** bisect_right(milestones, epoch)

The call is commented out as shipped (``Trainer.py:1040``), but the arguments
it would receive ARE defined, right above the epoch loop
(``Trainer.py:1017-1022``): ``warmup_factor = 0.001``, ``Steps = (100, 150)``,
``gamma = 0.5``, ``warmup_steps = max_epoch * 2``, with the od base lr applied
to BOTH the od seg and od shape optimizers (and likewise oc)
(``Trainer.py:996-1004``). ``reference_lr_kwargs(max_epoch)`` packages exactly
those values; the schedule stays opt-in (``Trainer(lr_schedule=...)`` /
``--lr-schedule``) because the reference trains at constant lr as shipped.

**Application timing.** The (commented) call site sits AFTER ``train_epoch()``
inside the epoch loop (``Trainer.py:1040``): epoch 0 trains at the constructor
lr, and epoch ``e >= 1`` trains at ``f(e - 1)``. The schedules returned here
reproduce that shift (``applied_after_epoch=True``, the default); pass
``applied_after_epoch=False`` for the conventional train-epoch-e-at-``f(e)``
behavior. ``first_epoch_lr`` is the constructor lr used during epoch 0 —
it matters for the shape optimizers, whose constructor lr
(``--lr_od_shape``/``--lr_oc_shape``) differs from the od/oc base lr that
``lr_update`` overwrites them with from epoch 1 on.

Replicated quirk: the formula has no ``alpha <= 1`` clamp, so past
``warmup_steps`` epochs the warmup factor keeps growing linearly above 1
(standard implementations gate the warmup branch on ``epoch < warmup_steps``).
Pass ``clamp_warmup=True`` for the conventional behavior. (With the reference
constants ``warmup_steps = 2 * max_epoch`` the run always ends mid-warmup, so
the quirk is unreachable there.)

TPU note: the schedule is a pure jnp function of the optax update count, so it
traces into the single fused 4-phase step program — no per-epoch host-side
optimizer rebuilds. ``updates_per_epoch`` is the count advance per training
iteration times ``iter_per_epoch``: 1x for the seg optimizers, but the shape
students step ``hparams['multi-turn']`` times per iteration
(``step.py::_shape_phase``), so their schedules must divide by
``iter_per_epoch * multi_turn`` to recover the epoch index.
``reference_lr_value`` is the same formula as plain-python host math for
logging (no device dispatch).
"""

from __future__ import annotations

from bisect import bisect_right
from typing import Sequence

import jax.numpy as jnp

# Trainer.py:1017-1022 — the argument block above the (commented) call site
REF_WARMUP_FACTOR = 0.001
REF_GAMMA = 0.5
REF_MILESTONES = (100, 150)


def reference_lr_kwargs(max_epoch: int) -> dict:
    """The exact ``lr_update`` arguments the reference's call site would pass
    (``Trainer.py:1017-1022``): ``warmup_steps = max_epoch * 2``,
    ``warmup_factor = 0.001``, ``gamma = 0.5``, ``Steps = (100, 150)``."""
    return dict(warmup_steps=max_epoch * 2, warmup_factor=REF_WARMUP_FACTOR,
                gamma=REF_GAMMA, milestones=REF_MILESTONES)


def reference_lr_value(base_lr: float, epoch: int, warmup_steps: int,
                       warmup_factor: float = REF_WARMUP_FACTOR,
                       gamma: float = REF_GAMMA,
                       milestones: Sequence[int] = REF_MILESTONES,
                       clamp_warmup: bool = False,
                       applied_after_epoch: bool = True,
                       first_epoch_lr: float | None = None) -> float:
    """lr in effect DURING training epoch ``epoch`` — host-side python math
    (the schedule itself is pure, evaluating it eagerly on a tunneled device
    costs a round-trip per tiny op). With ``applied_after_epoch`` (default),
    epoch 0 returns ``first_epoch_lr`` (the constructor lr; defaults to
    ``base_lr``) and epoch e returns the formula at e-1, matching the
    reference's after-the-epoch call site (``Trainer.py:1040``)."""
    if applied_after_epoch:
        if epoch <= 0:
            return base_lr if first_epoch_lr is None else first_epoch_lr
        epoch = epoch - 1
    alpha = epoch / warmup_steps
    if clamp_warmup:
        alpha = min(alpha, 1.0)
    factor = warmup_factor * (1.0 - alpha) + alpha
    return base_lr * factor * gamma ** bisect_right(sorted(milestones), epoch)


def reference_lr_schedule(base_lr: float, updates_per_epoch: int,
                          warmup_steps: int,
                          warmup_factor: float = REF_WARMUP_FACTOR,
                          gamma: float = REF_GAMMA,
                          milestones: Sequence[int] = REF_MILESTONES,
                          clamp_warmup: bool = False,
                          applied_after_epoch: bool = True,
                          first_epoch_lr: float | None = None):
    """Return an optax schedule ``count -> lr`` matching ``lr_update``.

    ``count`` is the optimizer update count; ``epoch = count //
    updates_per_epoch`` reproduces the reference's per-epoch application
    granularity (for the seg optimizers ``updates_per_epoch =
    iter_per_epoch``; the shape students advance ``multi-turn`` counts per
    iteration — see module docstring). ``milestones`` are epoch indices;
    ``bisect_right`` semantics (a milestone epoch itself already decays) via
    ``searchsorted(..., side='right')``. Timing shift per module docstring:
    by default epoch 0 runs at ``first_epoch_lr`` (default ``base_lr``) and
    epoch e at the formula evaluated at e-1.
    """
    if warmup_steps < 1:
        raise ValueError(f"warmup_steps must be >= 1 (got {warmup_steps})")
    if updates_per_epoch < 1:
        raise ValueError(
            f"updates_per_epoch must be >= 1 (got {updates_per_epoch})")
    ms = jnp.asarray(sorted(milestones), jnp.int32)
    lr0 = base_lr if first_epoch_lr is None else first_epoch_lr

    def schedule(count):
        epoch = jnp.asarray(count, jnp.int32) // updates_per_epoch
        f_epoch = jnp.maximum(epoch - 1, 0) if applied_after_epoch else epoch
        alpha = f_epoch.astype(jnp.float32) / warmup_steps
        if clamp_warmup:
            alpha = jnp.minimum(alpha, 1.0)
        factor = warmup_factor * (1.0 - alpha) + alpha
        n_decays = jnp.searchsorted(ms, f_epoch, side="right") if ms.size else 0
        lr = base_lr * factor * jnp.asarray(gamma, jnp.float32) ** n_decays
        if applied_after_epoch:
            lr = jnp.where(epoch == 0, lr0, lr)
        return lr

    return schedule
