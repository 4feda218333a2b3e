"""shard_map data parallelism for the 4-phase train step.

Design (new capability — the reference has no distributed path, SURVEY.md §2.3):

- mesh: 1-D ``('data',)`` over the slice; model/optimizer state fully replicated
  (the whole ensemble is ~8M params — replication is free next to activations);
- each device samples its own ``per_domain_batch_local`` items per domain from the
  HBM-resident dataset (key folded with ``axis_index``), keeping every domain
  present on every device so the MMD's domain-contiguous slicing stays correct;
- cross-device traffic per step: gradient ``pmean`` (riding ICI), BatchNorm
  statistic ``pmean`` (sync-BN — set ``ModelConfig.bn_axis_name='data'``), the
  pos-weight ``psum`` (2 scalars), and the MMD vector ``all_gather``
  (B x 120 floats);
- semantics: identical to a single-device run with the same *global* batch
  (equal shards; verified in tests/test_parallel.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from wt_pse_tpu.data.augment import make_device_batch_fn
from wt_pse_tpu.train.step import StepConfig, make_train_step


def make_dp_fused(main_od, stud_od, main_oc, stud_oc, txs, hparams: dict,
                  mesh: Mesh, domain_num: int, per_domain_batch_global: int,
                  replicate_ref_quirks: bool = True, axis: str = "data",
                  distill: bool = True):
    """Build the UNJITTED ``fn(state, data, key) -> (state, metrics)`` running
    under shard_map — same contract as the Trainer's single-device ``fused``
    closure, so the caller can either jit it directly (one step per dispatch)
    or ``lax.scan`` over it (the Trainer's whole-epoch device driver).

    ``per_domain_batch_global`` must divide by the mesh size; each device runs the
    local slice and the result is bitwise-identical state on every device
    (replicated out-specs). ``distill=False`` builds the step for the joint
    variant (``Unet_nips2023_joint_shape_regularization``: no teacher/student
    phases 2/4 — the prior trains end-to-end inside the seg phases), matching
    the knob the single-device Trainer passes to :class:`StepConfig`.
    """
    n_dev = mesh.devices.size
    if per_domain_batch_global % n_dev:
        raise ValueError(
            f"per-domain batch {per_domain_batch_global} not divisible by "
            f"{n_dev} devices")
    for m in (main_od, stud_od, main_oc, stud_oc):
        # without sync-BN each device would update batch_stats from its local
        # shard only; the replicated out-spec (with check_vma=False) would then
        # silently ship whichever device's divergent stats XLA picks — catch
        # the misconfiguration at build time instead
        if getattr(m.cfg, "bn_axis_name", None) != axis:
            raise ValueError(
                f"{type(m).__name__} was built with bn_axis_name="
                f"{getattr(m.cfg, 'bn_axis_name', None)!r}; data-parallel "
                f"training needs ModelConfig(bn_axis_name={axis!r}) so "
                "BatchNorm statistics pmean over the mesh (sync-BN)")
    pdb_local = per_domain_batch_global // n_dev

    cfg = StepConfig(hparams, domain_num, pdb_local,
                     replicate_ref_quirks=replicate_ref_quirks,
                     axis_name=axis, axis_size=n_dev, distill=distill)
    train_step = make_train_step(main_od, stud_od, main_oc, stud_oc, txs, cfg)
    batch_fn = make_device_batch_fn(pdb_local)

    def device_fn(state, data, key):
        # distinct per-device sample stream; same key -> same params everywhere.
        # On a 1-device mesh the fold is skipped so the stream is IDENTICAL to
        # the single-device Trainer's (DP over one device is the identity —
        # tested at the Trainer level in tests/test_parallel.py)
        if n_dev > 1:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        kb, ks = jax.random.split(key)
        batch = batch_fn(data, kb)
        new_state, metrics = train_step(state, batch, ks)
        metrics = jax.lax.pmean(metrics, axis)
        return new_state, metrics

    return shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(), P(), P()),       # state, dataset, key: replicated
        out_specs=(P(), P()),           # state stays replicated (grads pmean'd)
        check_vma=False,
    )


def make_dp_train_step(*args, **kwargs):
    """``make_dp_fused`` jitted with donated state — one step per dispatch."""
    return jax.jit(make_dp_fused(*args, **kwargs), donate_argnums=(0,))
