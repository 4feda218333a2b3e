"""Learning-rate schedules.

The reference defines (but ships disabled) a warmup + step-decay schedule
(``/root/reference/Trainer.py:989-1004``, call site commented out at 1040):

    alpha  = epoch / warmup_steps
    factor = warmup_factor * (1 - alpha) + alpha
    lr     = base_lr * factor * gamma ** bisect_right(steps, epoch)

with defaults warmup_factor=0.001, steps=(100, 150), gamma=0.5,
warmup_steps=2*max_epoch (Trainer.py:1017-1022). Provided here as an optax
schedule over *epochs* (wrap with iterations-per-epoch for per-step optimizers);
off by default, matching the reference.
"""

from __future__ import annotations

import bisect


def reference_lr_schedule(base_lr: float, max_epoch: int,
                          warmup_factor: float = 0.001,
                          steps: tuple[int, ...] = (100, 150),
                          gamma: float = 0.5):
    """Returns ``fn(epoch) -> lr`` with the reference's exact formula."""
    warmup_steps = max_epoch * 2

    def fn(epoch: int) -> float:
        alpha = epoch / warmup_steps
        factor = warmup_factor * (1 - alpha) + alpha
        return base_lr * factor * gamma ** bisect.bisect_right(list(steps), epoch)

    return fn


def as_optax_schedule(base_lr: float, max_epoch: int, iters_per_epoch: int,
                      **kw):
    """Per-step optax schedule wrapping the per-epoch reference formula."""
    import jax.numpy as jnp
    import numpy as np

    per_epoch = reference_lr_schedule(base_lr, max_epoch, **kw)
    table = jnp.asarray(
        np.array([per_epoch(e) for e in range(max_epoch + 1)], np.float32))

    def schedule(step):
        epoch = jnp.minimum(step // iters_per_epoch, max_epoch)
        return table[epoch]

    return schedule
