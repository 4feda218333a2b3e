"""Smoke + semantics tests for the jitted 4-phase train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wt_pse_tpu.config import default_hparams
from wt_pse_tpu.models.common import ModelConfig
from wt_pse_tpu.models.shape_prior import ShapeStudent
from wt_pse_tpu.models.wt_pse import WTPSE
from wt_pse_tpu.train.state import init_ensemble
from wt_pse_tpu.train.step import StepConfig, jit_train_step


def _make_batch(rng, b=6, hw=32):
    img = rng.rand(b, hw, hw, 3).astype(np.float32) * 2 - 1
    # blob-ish masks so BCE has signal
    yy, xx = np.mgrid[0:hw, 0:hw]
    od = ((yy - hw / 2) ** 2 + (xx - hw / 2) ** 2 < (hw / 3) ** 2).astype(np.float32)
    oc = ((yy - hw / 2) ** 2 + (xx - hw / 2) ** 2 < (hw / 5) ** 2).astype(np.float32)
    return {
        "image": jnp.asarray(img),
        "target_od": jnp.asarray(np.tile(od[None, :, :, None], (b, 1, 1, 1))),
        "target_oc": jnp.asarray(np.tile(oc[None, :, :, None], (b, 1, 1, 1))),
    }


def _build(hparams, b=6, hw=32):
    cfg = ModelConfig.from_hparams(hparams)
    main_od, stud_od = WTPSE(cfg), ShapeStudent(cfg)
    main_oc, stud_oc = WTPSE(cfg, two_step=True), ShapeStudent(cfg)
    state, txs = init_ensemble(main_od, stud_od, main_oc, stud_oc,
                               (b, hw, hw, 3), jax.random.PRNGKey(0))
    step_cfg = StepConfig(hparams, domain_num=3, per_domain_batch=b // 3)
    step = jit_train_step(main_od, stud_od, main_oc, stud_oc, txs, step_cfg,
                          donate=False)
    return state, step


@pytest.mark.slow  # ~95s: compiles the full 4-phase program
def test_full_step_runs_and_losses_decrease(rng):
    hparams = default_hparams("WT_PSE")
    state, step = _build(hparams)
    batch = _make_batch(rng)
    key = jax.random.PRNGKey(42)

    state1, m1 = step(state, batch, key)
    for k, v in m1.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    # all expected loss keys present
    for k in ["loss_seg", "loss_ins_wt", "loss_dom_wt", "loss_kd",
              "loss_ins_wt_shape", "loss_seg_oc", "loss_kd_oc"]:
        assert k in m1, k

    # params of all 4 nets changed
    for name in ["od", "od_shape", "oc", "oc_shape"]:
        before = jax.tree.leaves(getattr(state, name).params)
        after = jax.tree.leaves(getattr(state1, name).params)
        assert any(not np.allclose(b, a) for b, a in zip(before, after)), name
    # teacher BN stats were double-updated through phase 2 (they must differ from
    # a state where only phase 1 ran) — sanity: stats changed at all
    assert not np.allclose(
        np.asarray(state.od.batch_stats["prior_dist"]["inc"]["bn1"]["mean"]),
        np.asarray(state1.od.batch_stats["prior_dist"]["inc"]["bn1"]["mean"]))

    # seg loss decreases over a few steps on a fixed batch
    st, losses = state, []
    for i in range(8):
        st, m = step(st, batch, jax.random.fold_in(key, i))
        losses.append(float(m["loss_seg"]))
    assert losses[-1] < losses[0], losses


@pytest.mark.slow  # ~95s: second full-program compile in bf16
def test_bf16_mode_step_learns(rng):
    """Mixed-precision production mode (`compute_dtype=bfloat16`): bf16 conv
    compute on the MXU, f32 master params / BN stats / losses. Must stay finite
    and learn on a fixed batch like the f32 path."""
    hparams = dict(default_hparams("WT_PSE"))
    hparams["compute_dtype"] = "bfloat16"
    state, step = _build(hparams)
    batch = _make_batch(rng)
    key = jax.random.PRNGKey(7)
    st, losses = state, []
    for i in range(8):
        st, m = step(st, batch, jax.random.fold_in(key, i))
        losses.append(float(m["loss_seg"]))
    assert all(np.isfinite(l) for l in losses), losses
    assert losses[-1] < losses[0], losses
    # master params remain f32 (only compute is bf16)
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(st.od.params))


def test_seg_only_step(rng):
    """BASELINE config 3: shape_prior=False, whitening=False, single domain."""
    hparams = dict(default_hparams("WT_PSE"))
    hparams.update(shape_prior=False, whitening=False)
    cfg = ModelConfig.from_hparams(hparams)
    main_od, stud_od = WTPSE(cfg), ShapeStudent(cfg)
    main_oc, stud_oc = WTPSE(cfg, two_step=True), ShapeStudent(cfg)
    state, txs = init_ensemble(main_od, stud_od, main_oc, stud_oc,
                               (2, 32, 32, 3), jax.random.PRNGKey(0))
    step = jit_train_step(main_od, stud_od, main_oc, stud_oc, txs,
                          StepConfig(hparams, 1, 2), donate=False)
    batch = _make_batch(rng, b=2)
    state1, m = step(state, batch, jax.random.PRNGKey(1))
    assert float(m["loss_ins_wt"]) == 0.0
    assert float(m["loss_dom_wt"]) == 0.0
    assert "loss_kd" not in m
    assert np.isfinite(float(m["loss_seg"]))
    assert np.isfinite(float(m["loss_seg_oc"]))
    # shape students untouched
    b0 = jax.tree.leaves(state.od_shape.params)
    a0 = jax.tree.leaves(state1.od_shape.params)
    assert all(np.allclose(b, a) for b, a in zip(b0, a0))


def test_pos_weight_nan_guard(rng):
    """Empty OD prediction -> pos_weight falls back to 1.0 (Trainer.py:866-867)."""
    hparams = dict(default_hparams("WT_PSE"))
    hparams.update(shape_prior=False, whitening=False)
    cfg = ModelConfig.from_hparams(hparams)
    main_od, stud_od = WTPSE(cfg), ShapeStudent(cfg)
    main_oc, stud_oc = WTPSE(cfg, two_step=True), ShapeStudent(cfg)
    state, txs = init_ensemble(main_od, stud_od, main_oc, stud_oc,
                               (2, 32, 32, 3), jax.random.PRNGKey(0))
    step = jit_train_step(main_od, stud_od, main_oc, stud_oc, txs,
                          StepConfig(hparams, 1, 2), donate=False)
    batch = _make_batch(rng, b=2)
    batch["target_oc"] = jnp.zeros_like(batch["target_oc"])  # sum(od*oc) == 0
    _, m = step(state, batch, jax.random.PRNGKey(1))
    assert float(m["pos_weight_oc"]) == 1.0
    assert np.isfinite(float(m["loss_seg_oc"]))
