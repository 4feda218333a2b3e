"""Training state containers.

The reference trains 4 disjoint parameter sets with 4 independent Adam optimizers
(``/root/reference/train.py:120-138``: betas (0.9, 0.99)). Here each net's
(params, batch_stats, opt_state) is one pytree node; the whole 4-net ensemble is a
single ``WTPSETrainState`` pytree so the entire 4-phase iteration jits as one XLA
program and shards as one ``shard_map``.
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct


def reference_adam(lr: float) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, betas=(0.9, 0.99)) parity (train.py:120-138);
    eps 1e-8 (torch default)."""
    return optax.adam(lr, b1=0.9, b2=0.99, eps=1e-8)


class NetState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any

    @property
    def variables(self) -> dict:
        return {"params": self.params, "batch_stats": self.batch_stats}

    def apply_updates(self, grads, tx: optax.GradientTransformation,
                      new_batch_stats=None) -> "NetState":
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            params=new_params,
            opt_state=new_opt,
            batch_stats=self.batch_stats if new_batch_stats is None else new_batch_stats,
        )

    @classmethod
    def create(cls, variables: dict, tx: optax.GradientTransformation) -> "NetState":
        params = variables["params"]
        return cls(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
        )


class WTPSETrainState(struct.PyTreeNode):
    """The 4-net ensemble: OD seg + OD shape student, OC seg + OC shape student
    (train.py:91-114)."""

    od: NetState
    od_shape: NetState
    oc: NetState
    oc_shape: NetState
    step: jax.Array


def init_ensemble(main_od, stud_od, main_oc, stud_oc, image_shape, rng,
                  lr_od=5e-4, lr_od_shape=5e-4, lr_oc=5e-4, lr_oc_shape=5e-4):
    """Initialize all 4 nets + optimizers. ``image_shape`` = (B, H, W, 3).
    Default learning rates match train.py:197-200."""
    import jax.numpy as jnp

    txs = {
        "od": reference_adam(lr_od),
        "od_shape": reference_adam(lr_od_shape),
        "oc": reference_adam(lr_oc),
        "oc_shape": reference_adam(lr_oc_shape),
    }

    # ONE jitted program for the whole 4-net init: run eagerly, every small init
    # op dispatches as its own tiny executable — ~0.35 s each over a tunneled
    # device, tens of seconds total (measured round 3). Jitted, it is a single
    # compile amortized by the persistent cache.
    def _init(rng):
        img = jnp.zeros(image_shape, jnp.float32)
        mask = jnp.zeros(image_shape[:3] + (1,), jnp.float32)
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        return WTPSETrainState(
            od=NetState.create(
                main_od.init({"params": k1}, img, mask, method=type(main_od).initialize), txs["od"]),
            od_shape=NetState.create(
                stud_od.init({"params": k2}, img, method=type(stud_od).initialize), txs["od_shape"]),
            oc=NetState.create(
                main_oc.init({"params": k3}, img, mask, method=type(main_oc).initialize), txs["oc"]),
            oc_shape=NetState.create(
                stud_oc.init({"params": k4}, img, method=type(stud_oc).initialize), txs["oc_shape"]),
            step=jax.numpy.zeros((), jax.numpy.int32),
        )

    return jax.jit(_init)(rng), txs
