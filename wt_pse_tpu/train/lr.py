"""Learning-rate schedule parity: the reference's (disabled) ``lr_update``.

``Trainer.lr_update`` (``/root/reference/Trainer.py:989-1004``) implements a
linear-warmup + milestone-step-decay schedule applied once per *epoch*:

    alpha  = epoch / warmup_steps
    factor = warmup_factor * (1 - alpha) + alpha
    lr     = base_lr * factor * gamma ** bisect_right(milestones, epoch)

The call site is commented out as shipped (``Trainer.py:1040``) and the
variables it would need (``warmup_steps`` etc.) are defined nowhere, so the
reference always trains at a constant lr. For parity the helper exists here,
exact to the formula, and stays opt-in (``Trainer(lr_schedule=...)`` /
``--lr-schedule``).

Replicated quirk: the formula has no ``alpha <= 1`` clamp, so past
``warmup_steps`` epochs the warmup factor keeps growing linearly above 1
(standard implementations gate the warmup branch on ``epoch < warmup_steps``).
Pass ``clamp_warmup=True`` for the conventional behavior.

TPU note: the schedule is a pure jnp function of the optax update count, so it
traces into the single fused 4-phase step program — no per-epoch host-side
optimizer rebuilds (each of the 4 optax Adam states counts one update per
iteration, hence ``epoch = count // iter_per_epoch``).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def reference_lr_schedule(base_lr: float, iter_per_epoch: int,
                          warmup_steps: int = 10,
                          warmup_factor: float = 1.0 / 3.0,
                          gamma: float = 0.1,
                          milestones: Sequence[int] = (),
                          clamp_warmup: bool = False):
    """Return an optax schedule ``count -> lr`` matching ``lr_update``.

    ``count`` is the optimizer update count (one per training iteration);
    ``epoch = count // iter_per_epoch`` reproduces the reference's per-epoch
    application granularity (``Trainer.py:1040`` calls it once per epoch with
    the epoch index). ``milestones`` are epoch indices; ``bisect_right``
    semantics (a milestone epoch itself already decays) via
    ``searchsorted(..., side='right')``.
    """
    if warmup_steps < 1:
        raise ValueError(f"warmup_steps must be >= 1 (got {warmup_steps})")
    if iter_per_epoch < 1:
        raise ValueError(f"iter_per_epoch must be >= 1 (got {iter_per_epoch})")
    ms = jnp.asarray(sorted(milestones), jnp.int32)

    def schedule(count):
        epoch = jnp.asarray(count, jnp.int32) // iter_per_epoch
        alpha = epoch.astype(jnp.float32) / warmup_steps
        if clamp_warmup:
            alpha = jnp.minimum(alpha, 1.0)
        factor = warmup_factor * (1.0 - alpha) + alpha
        n_decays = jnp.searchsorted(ms, epoch, side="right") if ms.size else 0
        return base_lr * factor * jnp.asarray(gamma, jnp.float32) ** n_decays

    return schedule
