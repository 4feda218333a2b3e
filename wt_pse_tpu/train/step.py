"""The jitted 4-phase WT-PSE training iteration.

One XLA program reproduces the reference's per-iteration sequence
(``/root/reference/Trainer.py:762-924``):

  phase 1  OD seg:      BCE(sigmoid(out), target_od) + whitening losses -> Adam(od)
  phase 2  OD shape KD: teacher (post-phase-1 weights, GT mask) vs student;
                        MSE(mu_t, mu_s) + student whitening -> Adam(od_shape),
                        repeated hparams['multi-turn'] times (Trainer.py:810-825)
  phase 3  OC seg:      ROI = (image+1)*(sigmoid(out_od)>0.75)-1 (Trainer.py:842-853);
                        pos-weighted BCE-with-logits on out_oc*od_pred
                        (Trainer.py:864-871) + whitening -> Adam(oc)
  phase 4  OC shape KD: same as phase 2 on the ROI -> Adam(oc_shape)

Faithfulness notes:

- phase 2's teacher runs with the *updated* OD weights (the reference calls
  ``optim.step()`` before ``model_shape.update(self.model, ...)``), in train mode —
  so the teacher's BN running stats are updated a second time with the same batch;
  we replicate by threading the mutated ``batch_stats`` back into the OD state.
- teacher gradients are discarded (torch backprops into them but only the student
  optimizer steps; main-net grads are zeroed next iteration): ``stop_gradient``.
- ``od_pred`` for the ROI uses the *pre-update* phase-1 forward output
  (Trainer.py:842 detaches the phase-1 logits).
- NaN pos-weight falls back to 1.0 (Trainer.py:866-867).

TPU notes: the whole iteration is one compiled program — no ``.item()`` host syncs
(the reference does ~10 per iteration); metrics come back as one small dict of
device scalars fetched asynchronously by the logger.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from wt_pse_tpu.models.shape_prior import ShapeStudent
from wt_pse_tpu.models.wt_pse import WTPSE
from wt_pse_tpu.ops.whitening import main_whitening_loss, student_whitening_loss
from wt_pse_tpu.train.state import WTPSETrainState


def bce_probs(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """torch ``BCELoss()(sigmoid(x), t)`` parity (Trainer.py:787) — computed in
    logit space for stability (identical value, torch clamps log at -100 which
    only differs in float-degenerate cases)."""
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, targets))


def bce_logits_pos_weight(logits: jax.Array, targets: jax.Array,
                          pos_weight: jax.Array) -> jax.Array:
    """torch ``F.binary_cross_entropy_with_logits(x, t, pos_weight=w)`` parity
    (Trainer.py:868-871): mean of ``w*t*softplus(-x) + (1-t)*softplus(x)``."""
    pos = pos_weight * targets * jax.nn.softplus(-logits)
    neg = (1.0 - targets) * jax.nn.softplus(logits)
    return jnp.mean(pos + neg)


class StepConfig:
    """Static (python-level) configuration baked into the compiled step."""

    def __init__(self, hparams: dict, domain_num: int, per_domain_batch: int,
                 replicate_ref_quirks: bool = True, axis_name: str | None = None,
                 axis_size: int = 1, distill: bool = True):
        self.whitening = bool(hparams.get("whitening", True))
        self.shape_prior = bool(hparams.get("shape_prior", True))
        # distillation phases (2/4) exist only for the teacher/student algorithm;
        # the joint variant trains its prior end-to-end inside the seg phases
        # (algorithms.py:1445-1540 — its whitening losses still apply there)
        self.distill = distill
        self.instance_wt_gm = float(hparams.get("instance_wt_gm", 1))
        self.domain_wt_gm = float(hparams.get("domain_wt_gm", 1))
        self.margin = float(hparams.get("margin", 0))
        self.multi_turn = int(hparams.get("multi-turn", 1))
        self.domain_num = domain_num
        self.per_domain_batch = per_domain_batch
        self.replicate_ref_quirks = replicate_ref_quirks
        # shard_map data parallelism: per-device batch is
        # domain_num * per_domain_batch; grads/stats are pmean'd over axis_name
        self.axis_name = axis_name
        self.axis_size = axis_size
        # space-to-depth training (hparam `space_to_depth`, ops/packed.py):
        # the step packs the batch once and every tensor that lives at the top
        # network level stays packed end-to-end — losses are phase-invariant
        self.s2d = bool(hparams.get("space_to_depth", False))
        # optional fused Pallas covariance kernel (ops/whitening_pallas.py)
        if bool(hparams.get("use_pallas_whitening", False)):
            if self.s2d:
                # the Pallas kernel reads unpacked (B,H,W,C) maps; the packed
                # step hands whitening_loss_single packed tensors, which route
                # to the phase-aware einsum. Refuse rather than silently run a
                # different kernel than the one the user selected.
                raise ValueError(
                    "use_pallas_whitening=True is incompatible with "
                    "space_to_depth=True (the packed step uses the einsum "
                    "covariance; the Pallas kernel is unpacked-only) — "
                    "disable one of the two")
            from wt_pse_tpu.ops.whitening_pallas import feature_covariance_pallas
            self.cov_fn = feature_covariance_pallas
        else:
            self.cov_fn = None

    def _pmean(self, tree):
        if self.axis_name is None:
            return tree
        return jax.lax.pmean(tree, self.axis_name)


def _seg_phase(model: WTPSE, tx, net, image, target, wt_input, seg_loss_fn,
               cfg: StepConfig, rng):
    """One segmentation phase (1 or 3). Returns (new net state, logits, metrics)."""

    def loss_fn(params):
        (out, _att, wt_feats), mut = model.apply(
            {"params": params, "batch_stats": net.batch_stats},
            image, target, wt_input, True,
            rngs={"sample": rng}, mutable=["batch_stats"],
        )
        loss_seg = seg_loss_fn(out)
        if cfg.whitening and wt_feats is not None:
            inst, dom = main_whitening_loss(
                wt_feats, cfg.domain_num, cfg.per_domain_batch, cfg.margin,
                cfg.replicate_ref_quirks, cfg.axis_name, cfg.axis_size,
                cfg.cov_fn, cfg.s2d)
        else:
            inst = jnp.zeros(())
            dom = jnp.zeros(())
        total = loss_seg + cfg.instance_wt_gm * inst + cfg.domain_wt_gm * dom
        return total, (out, mut["batch_stats"], loss_seg, inst, dom)

    grads, (out, new_bs, loss_seg, inst, dom) = jax.grad(loss_fn, has_aux=True)(net.params)
    grads = cfg._pmean(grads)
    new_net = net.apply_updates(grads, tx, new_bs)
    # on-device train Dice (smoothed, metrics.py:94) at the reference's 0.75
    # threshold — fills the reference's log.csv train-dice columns for free
    pred = (jax.nn.sigmoid(out) > 0.75).astype(jnp.float32)
    inter = jnp.sum(pred * target)
    dice = (2.0 * inter + 1.0) / (1.0 + jnp.sum(pred) + jnp.sum(target))
    metrics = {"loss_seg": loss_seg, "loss_ins_wt": inst, "loss_dom_wt": dom,
               "train_dice": dice}
    return new_net, out, metrics


def _shape_phase(main: WTPSE, student: ShapeStudent, tx, main_net, stud_net,
                 image, mask, cfg: StepConfig, rng):
    """One shape-distillation phase (2 or 4), multi-turn times.
    Returns (new main state [teacher BN stats], new student state, metrics)."""
    metrics = {}
    for turn in range(cfg.multi_turn):
        krng = jax.random.fold_in(rng, turn)
        # teacher forward: train mode, mutates the main net's BN running stats
        # (shape_networks.py:516-524 under torch train()); gradients discarded.
        (_z_t, mu_t), mut = main.apply(
            {"params": main_net.params, "batch_stats": main_net.batch_stats},
            image, mask, True,
            rngs={"sample": jax.random.fold_in(krng, 0)},
            mutable=["batch_stats"], method=WTPSE.teacher_sample,
        )
        main_net = main_net.replace(batch_stats=mut["batch_stats"])
        mu_t = jax.lax.stop_gradient(mu_t)

        def loss_fn(params):
            (z_s, mu_s, wt_feats), smut = student.apply(
                {"params": params, "batch_stats": stud_net.batch_stats},
                image, True,
                rngs={"sample": jax.random.fold_in(krng, 1)},
                mutable=["batch_stats"], method=ShapeStudent.update_forward,
            )
            kd = jnp.mean(jnp.square(mu_t - mu_s))  # wasser_distance, shape_networks.py:596
            inst_total, inst_ij, inst_ii, dom = student_whitening_loss(
                wt_feats, cfg.domain_num, cfg.per_domain_batch, cfg.margin,
                cfg.replicate_ref_quirks, cfg.axis_name, cfg.axis_size,
                cfg.cov_fn, cfg.s2d)
            total = kd + cfg.instance_wt_gm * inst_total + cfg.domain_wt_gm * dom
            return total, (smut["batch_stats"], kd, inst_total, inst_ij, inst_ii, dom)

        grads, (new_bs, kd, inst_total, inst_ij, inst_ii, dom) = jax.grad(
            loss_fn, has_aux=True)(stud_net.params)
        grads = cfg._pmean(grads)
        stud_net = stud_net.apply_updates(grads, tx, new_bs)
        metrics = {"loss_kd": kd, "loss_ins_wt_shape": inst_total,
                   "loss_ins_wt_shape_ij": inst_ij, "loss_ins_wt_shape_ii": inst_ii,
                   "loss_dom_wt_shape": dom}
    return main_net, stud_net, metrics


def make_train_step(main_od: WTPSE, stud_od: ShapeStudent, main_oc: WTPSE,
                    stud_oc: ShapeStudent, txs: dict, cfg: StepConfig):
    """Build the jitted 4-phase iteration.

    Returns ``train_step(state, batch, rng) -> (state, metrics)`` where batch is a
    dict with ``image`` (B,H,W,3) in [-1,1], ``target_od``/``target_oc`` (B,H,W,1),
    batch laid out domain-contiguously (domain d occupies rows
    [d*per_domain_batch, (d+1)*per_domain_batch) — Trainer.py:1013, required by the
    MMD slicing).
    """

    def train_step(state: WTPSETrainState, batch: dict[str, Any], rng: jax.Array):
        image = batch["image"]
        target_od = batch["target_od"]
        target_oc = batch["target_oc"]
        if cfg.s2d:
            # pack ONCE; every loss below is a mean/sum over all elements or an
            # elementwise map, both phase-invariant (ops/packed.py docstring)
            from wt_pse_tpu.ops.packed import pack

            image, target_od, target_oc = (
                pack(image), pack(target_od), pack(target_oc))
        k1, k2, k3, k4 = jax.random.split(rng, 4)

        # ---- phase 1: OD segmentation ---------------------------------------
        od, out_od, m1 = _seg_phase(
            main_od, txs["od"], state.od, image, target_od, image,
            lambda out: bce_probs(out, target_od), cfg, k1)

        # ---- phase 2: OD shape distillation ---------------------------------
        # Gate note: the reference gates these phases on `whitening` alone
        # (Trainer.py:810,894), but with shape_prior=False its student update
        # immediately dereferences the main net's nonexistent `prior_dist`
        # (shape_networks.py:516 — WT_PSE only builds it under shape_prior,
        # algorithms.py:1187) and crashes with AttributeError. We additionally
        # gate on shape_prior: the only combo that differs is one the
        # reference cannot run (documented divergence, not silent drift).
        m2 = {}
        od_shape = state.od_shape
        if cfg.distill and cfg.whitening and cfg.shape_prior:
            od, od_shape, m2 = _shape_phase(
                main_od, stud_od, txs["od_shape"], od, od_shape,
                image, target_od, cfg, k2)

        # ---- phase 3: OC segmentation on the OD ROI -------------------------
        od_pred = (jax.nn.sigmoid(out_od) > 0.75).astype(image.dtype)  # detached
        od_pred = jax.lax.stop_gradient(od_pred)
        if cfg.s2d:
            from wt_pse_tpu.ops.packed import pbroadcast_mul

            image_roi = pbroadcast_mul(image + 1.0, od_pred) - 1.0
        else:
            image_roi = (image + 1.0) * od_pred - 1.0

        num = jnp.sum(od_pred)
        den = jnp.sum(od_pred * target_oc)
        if cfg.axis_name is not None:
            num = jax.lax.psum(num, cfg.axis_name)
            den = jax.lax.psum(den, cfg.axis_name)
        pos_w = num / den
        pos_w = jnp.where(jnp.isfinite(pos_w), pos_w, 1.0)

        oc, out_oc, m3 = _seg_phase(
            main_oc, txs["oc"], state.oc, image_roi, target_oc, image_roi,
            lambda out: bce_logits_pos_weight(out * od_pred, target_oc, pos_w),
            cfg, k3)

        # ---- phase 4: OC shape distillation ---------------------------------
        m4 = {}
        oc_shape = state.oc_shape
        if cfg.distill and cfg.whitening and cfg.shape_prior:
            oc, oc_shape, m4 = _shape_phase(
                main_oc, stud_oc, txs["oc_shape"], oc, oc_shape,
                image_roi, target_oc, cfg, k4)

        metrics = dict(m1)
        metrics.update(m2)  # shape-phase keys are disjoint from seg-phase keys
        metrics.update({k + "_oc": v for k, v in m3.items()})
        metrics.update({k + "_oc": v for k, v in m4.items()})
        metrics["pos_weight_oc"] = pos_w

        new_state = WTPSETrainState(
            od=od, od_shape=od_shape, oc=oc, oc_shape=oc_shape, step=state.step + 1)
        return new_state, metrics

    return train_step


def jit_train_step(main_od, stud_od, main_oc, stud_oc, txs, cfg: StepConfig,
                   donate: bool = True):
    step = make_train_step(main_od, stud_od, main_oc, stud_oc, txs, cfg)
    return jax.jit(step, donate_argnums=(0,) if donate else ())
