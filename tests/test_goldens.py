"""Golden-value freeze against toolchain drift (r4 VERDICT #5).

Fixed-seed scalar fingerprints of every numerically-sensitive kernel family —
whitening/covariance losses, the Gaussian-kernel domain MMD (f32 and the f64
formula truth), the loss zoo, a U-Net forward, and one full fused 4-phase
train step — pinned to values measured on the CPU test backend at freeze time
(``goldens.json`` carries the jax version in ``meta``). When a jax/XLA upgrade
moves a value, this FAST test localizes the drift in seconds (which kernel,
what magnitude) instead of re-deriving noise floors from scratch (the jax
0.9.0 1-ulp incident round 3; the r4 standalone-context conv flake).

Tolerances are stated per entry in the goldens file itself:

- pure-numpy f64 values (``*_f64``): deterministic — rtol 1e-12;
- f32 jnp reductions on fixed inputs (losses, whitening): rtol 2e-5 — above
  f32 re-association noise, far below any semantic change;
- conv-stack outputs (forward/step): rtol 5e-4 + atol 1e-5 — above the
  measured cross-context f32 conv accumulation floor (r4/r5: rel 2.6e-5).

Regenerate deliberately::

    WT_PSE_REGEN_GOLDENS=1 scripts/test.sh -k goldens

which rewrites ``tests/goldens.json`` and FAILS the run (forcing the diff to
be reviewed and committed on purpose, never silently).

Formula sources: ``ops/whitening.py`` vs ``/root/reference/algorithms.py:
59-121,1277-1309``; losses vs ``metrics.py:14-185``; the step vs
``Trainer.py:762-924``.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens.json")
REGEN = bool(os.environ.get("WT_PSE_REGEN_GOLDENS"))

B, HW, DOMAINS, PDB = 9, 16, 3, 3

# (rtol, atol) per tolerance class — mirrored into the goldens file meta
TOL = {"f64": (1e-12, 0.0), "f32_reduce": (2e-5, 1e-9), "conv": (5e-4, 1e-5)}


def _feats(rng):
    """Three DeepWT-shaped NHWC maps (the whitening loss consumes the first 2,
    divides by 3 — algorithms.py:1256-1267)."""
    return [jnp.asarray(rng.randn(B, HW, HW, 16).astype(np.float32) * s)
            for s in (0.5, 0.8, 1.1)]


def _mmd64(feats):
    """f64 numpy truth of the domain-MMD quirk pipeline (the well-posed
    formula from test_reference_parity.dom_mmd64, duplicated deliberately:
    this file must not import from a slow-marked module)."""
    total = 0.0
    for z in feats[: len(feats) - 1]:
        b, h, w, c = z.shape
        f = np.asarray(z, np.float64).reshape(b, h * w, c)
        cov = np.einsum("bpc,bpd->bcd", f, f) / (h * w - 1) + 1e-5 * np.eye(c)
        iu, ju = np.triu_indices(c, k=1)
        vec = cov[:, iu, ju]
        blocks = [vec[i * PDB:(i + 1) * PDB] for i in range(DOMAINS)]

        def kmean(a, b_):
            d = ((a[:, None, :] - b_[None, :, :]) ** 2).sum(-1)
            return np.exp(-np.maximum(d, 1e-30)).mean()

        pen = sum(kmean(blocks[i], blocks[i]) + kmean(blocks[j], blocks[j])
                  - 2 * kmean(blocks[i], blocks[j])
                  for i in range(DOMAINS) for j in range(i + 1, DOMAINS))
        total += pen / (DOMAINS * (DOMAINS - 1) / 2)
    return total / len(feats)


def _compute() -> dict:
    from wt_pse_tpu.ops.losses import (balanced_dice_loss, cross_entropy2d,
                                       dice_loss_flat, watershed_cross_entropy)
    from wt_pse_tpu.ops.whitening import (main_whitening_loss,
                                          student_whitening_loss)
    from wt_pse_tpu.train.step import bce_logits_pos_weight, bce_probs

    out: dict[str, dict] = {}

    def put(name, value, tol):
        out[name] = {"value": float(value), "tol": tol}

    rng = np.random.RandomState(42)
    feats = _feats(rng)

    # -- whitening family (quirks on AND off are both product modes) --------
    for quirks in (True, False):
        tag = "quirks" if quirks else "clean"
        inst, dom = main_whitening_loss(feats, DOMAINS, PDB, margin=0.0,
                                        replicate_ref_quirks=quirks)
        put(f"whitening/main_inst_{tag}", inst, "f32_reduce")
        put(f"whitening/main_dom_{tag}", dom, "f32_reduce")
        tot, off, diag, sdom = student_whitening_loss(
            feats, DOMAINS, PDB, margin=0.0, replicate_ref_quirks=quirks)
        put(f"whitening/stud_total_{tag}", tot, "f32_reduce")
        put(f"whitening/stud_off_{tag}", off, "f32_reduce")
        put(f"whitening/stud_diag_{tag}", diag, "f32_reduce")
        put(f"whitening/stud_dom_{tag}", sdom, "f32_reduce")
    # margin path (hinge active): margin=2 clips some per-sample sums to 0
    inst_m, _ = main_whitening_loss(feats, DOMAINS, PDB, margin=2.0,
                                    replicate_ref_quirks=True)
    put("whitening/main_inst_margin2", inst_m, "f32_reduce")
    # the f64 formula truth of the same features — toolchain-independent
    put("whitening/dom_mmd_f64", _mmd64(feats), "f64")

    # -- loss zoo ----------------------------------------------------------
    lr = np.random.RandomState(7)
    logits1 = jnp.asarray(lr.randn(2, HW, HW, 1).astype(np.float32) * 3)
    tgt1 = jnp.asarray((lr.rand(2, HW, HW, 1) > 0.6).astype(np.float32))
    logits2 = jnp.asarray(lr.randn(2, HW, HW, 2).astype(np.float32) * 3)
    tgt2 = jnp.asarray((lr.rand(2, HW, HW, 2) > 0.6).astype(np.float32))
    itgt = jnp.asarray(lr.randint(0, 2, (2, HW, HW)))
    put("loss/bce_probs", bce_probs(logits1, tgt1), "f32_reduce")
    put("loss/bce_pos_weight",
        bce_logits_pos_weight(logits1, tgt1, jnp.asarray(2.5)), "f32_reduce")
    put("loss/dice_flat",
        dice_loss_flat(jax.nn.sigmoid(logits1), tgt1), "f32_reduce")
    put("loss/balanced_dice", balanced_dice_loss(logits2, tgt2), "f32_reduce")
    put("loss/watershed_ce", watershed_cross_entropy(logits2, tgt2),
        "f32_reduce")
    put("loss/cross_entropy2d", cross_entropy2d(logits2, itgt), "f32_reduce")

    # -- conv stack: deterministic U-Net forward fingerprint ---------------
    from wt_pse_tpu.config import default_hparams
    from wt_pse_tpu.models.common import ModelConfig
    from wt_pse_tpu.models.shape_prior import ShapeStudent
    from wt_pse_tpu.models.wt_pse import WTPSE

    hp = dict(default_hparams("WT_PSE"))
    cfg = ModelConfig.from_hparams(hp, n_classes=1)
    main, stud = WTPSE(cfg), ShapeStudent(cfg)
    ir = np.random.RandomState(3)
    img = jnp.asarray(ir.rand(PDB * DOMAINS, HW, HW, 3).astype(np.float32) * 2 - 1)
    v_main = main.init({"params": jax.random.PRNGKey(0),
                        "sample": jax.random.PRNGKey(1)},
                       img, jnp.zeros((PDB * DOMAINS, HW, HW, 1)),
                       method=WTPSE.initialize)
    v_stud = stud.init({"params": jax.random.PRNGKey(2),
                        "sample": jax.random.PRNGKey(3)},
                       img, method=ShapeStudent.initialize)
    z = stud.apply(v_stud, img, False, method=ShapeStudent.sample_from_image)
    logits = main.apply(v_main, img, z, method=WTPSE.predict_with_shape)
    arr = np.asarray(logits, np.float64)
    put("forward/logits_mean", arr.mean(), "conv")
    put("forward/logits_std", arr.std(), "conv")
    put("forward/logits_px_0_8_8", arr[0, 8, 8, 0], "conv")
    put("forward/logits_px_5_3_12", arr[5, 3, 12, 0], "conv")

    # -- one fused 4-phase train step (jitted, PRNGKey-seeded) -------------
    from wt_pse_tpu.train.state import init_ensemble
    from wt_pse_tpu.train.step import StepConfig, make_train_step

    main_oc, stud_oc = WTPSE(cfg, two_step=True), ShapeStudent(cfg)
    state, txs = init_ensemble(main, stud, main_oc, stud_oc,
                               (PDB * DOMAINS, HW, HW, 3), jax.random.PRNGKey(5))
    step = jax.jit(make_train_step(main, stud, main_oc, stud_oc, txs,
                                   StepConfig(hp, DOMAINS, PDB,
                                              replicate_ref_quirks=True)))
    br = np.random.RandomState(11)
    yy, xx = np.mgrid[0:HW, 0:HW]
    od = ((yy - 8) ** 2 + (xx - 8) ** 2 < 40).astype(np.float32)
    ocm = ((yy - 8) ** 2 + (xx - 8) ** 2 < 14).astype(np.float32)
    batch = {
        "image": jnp.asarray(br.rand(PDB * DOMAINS, HW, HW, 3)
                             .astype(np.float32) * 2 - 1),
        "target_od": jnp.asarray(np.tile(od[None, :, :, None],
                                         (PDB * DOMAINS, 1, 1, 1))),
        "target_oc": jnp.asarray(np.tile(ocm[None, :, :, None],
                                         (PDB * DOMAINS, 1, 1, 1))),
    }
    _, metrics = step(state, batch, jax.random.PRNGKey(9))
    for k in ("loss_seg", "loss_kd", "loss_ins_wt", "loss_dom_wt",
              "loss_seg_oc", "loss_kd_oc", "pos_weight_oc"):
        put(f"step/{k}", metrics[k], "conv")
    return out


def test_goldens():
    got = _compute()
    if REGEN or not os.path.exists(GOLDENS):
        with open(GOLDENS, "w") as f:
            json.dump({"meta": {"jax": jax.__version__,
                                "backend": jax.default_backend(),
                                "tolerances": TOL},
                       "values": got}, f, indent=1, sort_keys=True)
        pytest.fail(f"goldens (re)generated at {GOLDENS} with "
                    f"jax {jax.__version__} — review the diff and commit; "
                    "reruns without WT_PSE_REGEN_GOLDENS now compare")
    frozen = json.load(open(GOLDENS))
    vals = frozen["values"]
    assert set(vals) == set(got), (
        f"golden surface changed: +{sorted(set(got) - set(vals))} "
        f"-{sorted(set(vals) - set(got))} — regenerate deliberately")
    errs = []
    for name, rec in sorted(vals.items()):
        rtol, atol = TOL[rec["tol"]]
        want, have = rec["value"], got[name]["value"]
        if not np.isclose(have, want, rtol=rtol, atol=atol):
            rel = abs(have - want) / max(abs(want), 1e-30)
            errs.append(f"{name}: frozen {want!r} -> now {have!r} "
                        f"(rel {rel:.2e}, class {rec['tol']})")
    assert not errs, (
        "golden drift (toolchain change? jax "
        f"{frozen['meta']['jax']} -> {jax.__version__}):\n" + "\n".join(errs))
