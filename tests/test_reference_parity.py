"""Parity against the ACTUAL reference code in ``/root/reference``.

Every other golden test compares the Flax stack to ``tests/torch_ref.py`` — a
compact torch oracle written from the behavioral specs. If that oracle misread
the reference the same way the Flax code did, those tests would pass while the
released-checkpoint target failed. This file removes that self-referential risk
by importing the real ``algorithms.py`` / ``shape_networks.py`` (CPU-shimmed:
``.cuda()`` no-oped, missing ``torchfile``/``torchvision`` stubbed — the
imports at ``algorithms.py:11`` / ``shape_networks.py:6`` are only used by dead
VGG style-transfer code, SURVEY.md §2.1 #19) and asserting, on fixed inputs
with injected N(0,1) draws:

- ``WT_PSE.update``  (``algorithms.py:1216-1275``) — logits, attention mask,
  instance/domain whitening losses;
- ``ShapeVariationalDist_x.update`` (``shape_networks.py:512-558``) — KD loss
  and all four whitening-loss outputs (incl. the clobber-then-double diag quirk);
- ``WT_PSE.predict`` (``algorithms.py:1311-1353``) — both coarse and two-step
  stages of the deterministic eval path,

each against the Flax networks loaded with the reference's own weights through
the production importer (``io/torch_import.py``), i.e. the exact code path a
released ``.pth.tar`` takes.
"""

from __future__ import annotations

import importlib
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from wt_pse_tpu.config import default_hparams
from wt_pse_tpu.io.torch_import import convert_state_dict, load_into_variables
from wt_pse_tpu.models.common import ModelConfig
from wt_pse_tpu.models.shape_prior import ShapeStudent
from wt_pse_tpu.models.wt_pse import WTPSE
from wt_pse_tpu.ops.whitening import main_whitening_loss, student_whitening_loss

pytestmark = pytest.mark.slow  # compile-heavy; scripts/test.sh default skips

REF = "/root/reference"
B, HW = 9, 64  # 3 domains x 3 (per-domain-contiguous), small spatial for CPU speed
DOMAINS, PDB = 3, 3


@pytest.fixture(scope="module")
def ref():
    """Import the reference modules with CPU shims. The shims only no-op device
    placement; no reference math is altered."""
    sys.modules.setdefault("torchfile", types.ModuleType("torchfile"))
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    orig_t, orig_m = torch.Tensor.cuda, torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    sys.path.insert(0, REF)
    try:
        algorithms = importlib.import_module("algorithms")
        shape_networks = importlib.import_module("shape_networks")
        yield algorithms, shape_networks
    finally:
        sys.path.remove(REF)
        torch.Tensor.cuda, torch.nn.Module.cuda = orig_t, orig_m


def nchw(x):
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))


def dom_mmd64(feats_nhwc):
    """f64 numpy replay of the domain-MMD term (``algorithms.py:59-121`` +
    the sum-first-2-maps-divide-by-3 quirk at ``algorithms.py:1256-1267``).

    Why this exists: the MMD is ``kxx + kyy - 2*kxy`` — three kernel means of
    O(0.1-1) cancelling to an O(1e-6) residual, so ~5 of the 7 f32 digits are
    gone before any cross-framework comparison can happen. Comparing the f32
    losses directly is ill-posed (round 3 shipped with that comparison flaky
    at the noise floor). The well-posed test: both frameworks' f32 *feature
    maps* (which agree to conv-noise, no cancellation) feed this single f64
    pipeline, and the f64 residuals are compared tightly; each framework's f32
    loss is then only required to sit within the f32 rounding floor of its own
    f64 truth.
    """
    total = 0.0
    for z in feats_nhwc[: len(feats_nhwc) - 1]:
        b, h, w, c = z.shape
        f = z.reshape(b, h * w, c).astype(np.float64)
        cov = np.einsum("bpc,bpd->bcd", f, f) / (h * w - 1)
        cov = cov + 1e-5 * np.eye(c)
        iu, ju = np.triu_indices(c, k=1)
        vec = cov[:, iu, ju]
        blocks = [vec[i * PDB : (i + 1) * PDB] for i in range(DOMAINS)]

        def kmean(a, b_):
            d = ((a[:, None, :] - b_[None, :, :]) ** 2).sum(-1)
            return np.exp(-np.maximum(d, 1e-30)).mean()

        pen = 0.0
        for i in range(DOMAINS):
            for j in range(i + 1, DOMAINS):
                x, y = blocks[i], blocks[j]
                pen += kmean(x, x) + kmean(y, y) - 2 * kmean(x, y)
        total += pen / (DOMAINS * (DOMAINS - 1) / 2)
    return total / len(feats_nhwc)


def torch_wt_feats(net, inputs):
    """The WT feature maps a reference ``update`` consumed: ``DeepWT`` is
    conv-relu-conv with NO norm layers (``algorithms.py:416-428,1080-1117``),
    so a fresh forward on un-stepped params reproduces them exactly."""
    with torch.no_grad():
        return [t.numpy().transpose(0, 2, 3, 1) for t in net.wt_model.forward(inputs)]


def assert_domain_mmd_matches(torch_feats, jax_feats, dom_torch_f32, dom_jax_f32,
                              rtol64=0.02, atol32=2e-6):
    """Three-way well-posed MMD check (see ``dom_mmd64``): tight f64
    cross-framework agreement + each f32 value within the rounding floor of
    its own f64 truth. ``rtol64`` covers linear (non-cancelling) propagation
    of f32 conv noise through the f64 pipeline; ``atol32`` is the measured
    f32 accumulation floor of three O(1) kernel means (~2-5e-7, bounded 4x)."""
    d64_t = dom_mmd64(torch_feats)
    d64_j = dom_mmd64(jax_feats)
    np.testing.assert_allclose(d64_j, d64_t, rtol=rtol64)
    np.testing.assert_allclose(float(dom_jax_f32), d64_j, atol=atol32)
    np.testing.assert_allclose(float(dom_torch_f32.detach()), d64_t, atol=atol32)


def bce64(logits_nhwc, target):
    """f64 BCE truth from a side's OWN f32 logits (``Trainer.py:787`` is
    ``BCELoss()(sigmoid(out), t)``; torch clamps the log terms at -100).
    Returns ``(loss, probs)`` so callers can build the MVT envelope."""
    z = np.asarray(logits_nhwc, np.float64)
    p = 1.0 / (1.0 + np.exp(-z))
    t = np.asarray(target, np.float64)
    logp = np.maximum(np.log(np.maximum(p, 1e-300)), -100.0)
    log1mp = np.maximum(np.log1p(-np.minimum(p, 1.0 - 1e-300)), -100.0)
    return float(-(t * logp + (1 - t) * log1mp).mean()), p


def assert_seg_bce_matches(t_logits_nhwc, j_logits_nhwc, target, t_f32, j_f32):
    """Well-posed seg-BCE check, same structure as ``assert_domain_mmd_matches``.

    Why: the direct f32-vs-f32 comparison at rtol=1e-5 sat BELOW the measured
    cross-framework conv-noise floor and was context-sensitive — rel diff
    2.6e-5 when this file runs standalone (0.82619148 vs 0.82617021, twice
    reproducibly, r4 VERDICT + re-measured r5) yet <1e-5 inside the full
    suite: oneDNN/XLA-CPU f32 conv accumulation order depends on process
    state (thread partitioning / buffer placement), so the LOGITS move by
    O(1e-5..2e-4) elementwise between contexts while each side stays
    deterministic within a context. Decomposition that is context-independent
    by construction:

    1. each framework's f32 loss vs the f64 truth of its OWN logits — pure
       reduction rounding (measured 7.0e-9 torch / 3.7e-7 JAX; bound 5e-6);
    2. the two f64 truths under an EXACT mean-value envelope: dBCE/dz = (p-t)/N
       and sigmoid is monotone, so |L_t - L_j| <= mean(max(|p_t-t|,|p_j-t|)
       * |z_t-z_j|) — data-dependent, no guessed rtol;
    3. the envelope itself must sit at the conv-noise scale (measured 2.2e-6
       single-test vs >=2.1e-5 in the divergent whole-file context; cap 2e-4),
       rejecting any semantic logit divergence."""
    z_t = np.asarray(t_logits_nhwc, np.float64)
    z_j = np.asarray(j_logits_nhwc, np.float64)
    tgt = np.asarray(target, np.float64)
    L_t, p_t = bce64(z_t, tgt)
    L_j, p_j = bce64(z_j, tgt)
    np.testing.assert_allclose(float(t_f32), L_t, rtol=0, atol=5e-6)
    np.testing.assert_allclose(float(j_f32), L_j, rtol=0, atol=5e-6)
    env = (np.maximum(np.abs(p_t - tgt), np.abs(p_j - tgt))
           * np.abs(z_t - z_j)).mean()
    assert abs(L_t - L_j) <= env + 1e-9, (L_t, L_j, env)
    assert env <= 2e-4, f"logit divergence beyond conv-noise scale: env={env}"


def _inputs(rng):
    img = rng.rand(B, HW, HW, 3).astype(np.float32) * 2 - 1
    yy, xx = np.mgrid[0:HW, 0:HW]
    od = ((yy - 32) ** 2 + (xx - 32) ** 2 < 300).astype(np.float32)
    mask = np.tile(od[None, :, :, None], (B, 1, 1, 1))
    eps = rng.randn(B, HW, HW, 1).astype(np.float32)
    return img, mask, eps


def _load_flax(module, torch_net, example_args):
    variables = module.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
                            *example_args, method=type(module).initialize)
    loaded, matched = load_into_variables(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        convert_state_dict(torch_net.state_dict()))
    assert len(matched) > 50
    return jax.tree.map(jnp.asarray, loaded)


@pytest.fixture(scope="module")
def nets(ref):
    """Reference WT_PSE + student pair and the Flax twins carrying the
    reference's exact initial weights (through the production importer)."""
    algorithms, shape_networks = ref
    hp = dict(default_hparams("WT_PSE"))
    torch.manual_seed(7)
    r_main = algorithms.WT_PSE(3, 1, hp, "cpu", two_step=False,
                               per_domain_batch=PDB, source_domain_num=DOMAINS)
    r_stud = shape_networks.ShapeVariationalDist_x(hp, "cpu", 1,
                                                   number_source_domain=DOMAINS,
                                                   batch_size=PDB)
    cfg = ModelConfig.from_hparams(hp, n_classes=1)
    f_main, f_stud = WTPSE(cfg), ShapeStudent(cfg)
    x = jnp.zeros((B, HW, HW, 3), jnp.float32)
    m = jnp.zeros((B, HW, HW, 1), jnp.float32)
    v_main = _load_flax(f_main, r_main, (x, m))
    v_stud = _load_flax(f_stud, r_stud, (x,))
    return r_main, r_stud, f_main, f_stud, v_main, v_stud


def test_wtpse_update_matches_reference(ref, nets, monkeypatch):
    """algorithms.py:1216-1275 on fixed inputs + injected teacher eps."""
    r_main, _, f_main, _, v_main, _ = nets
    rng = np.random.RandomState(3)
    img, mask, eps = _inputs(rng)
    t_eps = nchw(eps)
    monkeypatch.setattr(torch, "randn_like", lambda t, **k: t_eps.to(t.dtype))

    r_main.train()
    out, att_mask, _, inst, dom = r_main.update(nchw(img), nchw(mask), two_step=False)

    (f_out, f_att_mask, wt_feats), _ = f_main.apply(
        v_main, jnp.asarray(img), jnp.asarray(mask), jnp.asarray(img), True,
        eps=jnp.asarray(eps), mutable=["batch_stats"])
    f_inst, f_dom = main_whitening_loss(wt_feats, DOMAINS, PDB, margin=0.0,
                                        replicate_ref_quirks=True)

    ref_out = out.detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(f_out), ref_out, atol=2e-4)
    np.testing.assert_allclose(float(f_inst), float(inst.detach()), rtol=1e-4)
    # well-posed MMD comparison in f64 from both sides' features (dom_mmd64)
    assert_domain_mmd_matches(torch_wt_feats(r_main, nchw(img)),
                              [np.asarray(z) for z in wt_feats],
                              dom.detach(), f_dom)
    # the attention mask is a hard threshold — borderline pixels may flip at
    # f32 noise; demand near-total agreement rather than bitwise equality
    ref_att = att_mask.detach().numpy().transpose(0, 2, 3, 1)
    assert np.mean(np.asarray(f_att_mask) != ref_att) < 1e-3


def test_student_update_matches_reference(ref, nets, monkeypatch):
    """shape_networks.py:512-558: KD + (inst_total, inst_off, inst_diag, domain),
    with both random draws injected (teacher randn_like, student torch.normal)."""
    _, r_stud, f_main, f_stud, v_main, v_stud = nets
    r_main = nets[0]
    rng = np.random.RandomState(4)
    img, mask, eps_t = _inputs(rng)
    eps_s = rng.randn(B, HW, HW, 1).astype(np.float32)
    t_eps_t, t_eps_s = nchw(eps_t), nchw(eps_s)
    monkeypatch.setattr(torch, "randn_like", lambda t, **k: t_eps_t.to(t.dtype))
    monkeypatch.setattr(torch, "normal",
                        lambda mu, std: mu + std * t_eps_s.to(mu.dtype))

    r_main.train(), r_stud.train()
    kd, inst_total, inst_off, inst_diag, dom = r_stud.update(
        r_main, nchw(img), nchw(mask), two_step=False)

    # Flax mirror of train/step._shape_phase's forward math
    (_z_t, mu_t), _ = f_main.apply(
        v_main, jnp.asarray(img), jnp.asarray(mask), True,
        eps=jnp.asarray(eps_t), mutable=["batch_stats"],
        method=WTPSE.teacher_sample)
    (z_s, mu_s, wt_feats), _ = f_stud.apply(
        v_stud, jnp.asarray(img), True, mutable=["batch_stats"],
        method=ShapeStudent.update_forward,
        eps=jnp.asarray(eps_s))
    f_kd = jnp.mean(jnp.square(mu_t - mu_s))
    f_total, f_off, f_diag, f_dom = student_whitening_loss(
        wt_feats, DOMAINS, PDB, margin=0.0, replicate_ref_quirks=True)

    # rtol 5e-4: the KD MSE sits behind two deep U-Net forwards whose f32
    # conv accumulation order differs between frameworks
    np.testing.assert_allclose(float(f_kd), float(kd.detach()), rtol=5e-4, atol=1e-7)
    np.testing.assert_allclose(float(f_off), float(inst_off.detach()), rtol=1e-4)
    np.testing.assert_allclose(float(f_diag), float(inst_diag.detach()), rtol=1e-4)
    np.testing.assert_allclose(float(f_total), float(inst_total.detach()), rtol=1e-4)
    # well-posed MMD comparison in f64 (student's own wt_model features:
    # shape_networks.py:517 whiting_outputs2)
    assert_domain_mmd_matches(torch_wt_feats(r_stud, nchw(img)),
                              [np.asarray(z) for z in wt_feats],
                              dom.detach(), f_dom)


def test_joint_update_whitening_matches_reference(ref, monkeypatch):
    """``Unet_nips2023_joint_shape_regularization.update`` with whitening=True
    (``algorithms.py:1445-1540``) vs JointShapeReg + main_whitening_loss.

    The reference class cannot run as shipped (``ShapeVariationalDist_x`` is an
    undefined name inside algorithms.py, and its constructor/sample_forward are
    called with the wrong arity — breakage documented in models/joint.py). The
    repair here is mechanical: bind the class from shape_networks and adapt the
    two call signatures; no math is altered."""
    algorithms, shape_networks = ref

    class RepairedPrior(shape_networks.ShapeVariationalDist_x):
        def __init__(self, hparams, device, n_channels, bilinear, n_classes,
                     wt=True, prior=True, number_source_domain=3):
            super().__init__(hparams, device, n_classes,
                             number_source_domain=number_source_domain,
                             batch_size=PDB)

        def sample_forward(self, inputs, mask=None, training=True):
            return super().sample_forward(inputs, training)

    monkeypatch.setattr(algorithms, "ShapeVariationalDist_x", RepairedPrior,
                        raising=False)

    hp = dict(default_hparams("Unet_nips2023_joint_shape_regularization"))
    hp["whitening"] = True  # the combination under test (VERDICT missing #1)
    torch.manual_seed(21)
    r_joint = algorithms.Unet_nips2023_joint_shape_regularization(
        3, 1, hp, "cpu", two_step=False, per_domain_batch=PDB,
        source_domain_num=DOMAINS)

    from wt_pse_tpu.models.joint import JointShapeReg

    cfg = ModelConfig.from_hparams(hp, n_classes=1)
    f_joint = JointShapeReg(cfg)
    x0 = jnp.zeros((B, HW, HW, 3), jnp.float32)
    m0 = jnp.zeros((B, HW, HW, 1), jnp.float32)
    v_joint = _load_flax(f_joint, r_joint, (x0, m0))

    rng = np.random.RandomState(6)
    img, mask, eps = _inputs(rng)
    t_eps = nchw(eps)
    monkeypatch.setattr(torch, "normal",
                        lambda mu, std: mu + std * t_eps.to(mu.dtype))

    r_joint.train()
    out, att_mask, _, inst, dom = r_joint.update(nchw(img), nchw(mask),
                                                 two_step=False)

    (f_out, f_att_mask, wt_feats), _ = f_joint.apply(
        v_joint, jnp.asarray(img), jnp.asarray(mask), jnp.asarray(img), True,
        eps=jnp.asarray(eps), mutable=["batch_stats"])
    f_inst, f_dom = main_whitening_loss(wt_feats, DOMAINS, PDB, margin=0.0,
                                        replicate_ref_quirks=True)

    np.testing.assert_allclose(
        np.asarray(f_out), out.detach().numpy().transpose(0, 2, 3, 1), atol=2e-4)
    np.testing.assert_allclose(float(f_inst), float(inst.detach()), rtol=1e-4)
    # well-posed MMD comparison in f64 from both sides' features (dom_mmd64)
    assert_domain_mmd_matches(torch_wt_feats(r_joint, nchw(img)),
                              [np.asarray(z) for z in wt_feats],
                              dom.detach(), f_dom)
    ref_att = att_mask.detach().numpy().transpose(0, 2, 3, 1)
    assert np.mean(np.asarray(f_att_mask) != ref_att) < 1e-3


def test_predict_matches_reference(ref, nets):
    """algorithms.py:1311-1353, training=False (deterministic): stage-1 predict
    and the two-step (stage-2) variant with stacked inputs.

    Uses freshly-constructed reference nets: the update tests above mutate the
    fixture's torch nets' BN running stats in-place (train mode), which the
    fixture's Flax variables deliberately do not track."""
    algorithms, shape_networks = ref
    _, _, f_main, f_stud, _, _ = nets
    hp = dict(default_hparams("WT_PSE"))
    torch.manual_seed(13)
    r_main = algorithms.WT_PSE(3, 1, hp, "cpu", two_step=False,
                               per_domain_batch=PDB, source_domain_num=DOMAINS)
    r_stud = shape_networks.ShapeVariationalDist_x(hp, "cpu", 1,
                                                   number_source_domain=DOMAINS,
                                                   batch_size=PDB)
    x0 = jnp.zeros((B, HW, HW, 3), jnp.float32)
    m0 = jnp.zeros((B, HW, HW, 1), jnp.float32)
    v_main = _load_flax(f_main, r_main, (x0, m0))
    v_stud = _load_flax(f_stud, r_stud, (x0,))
    rng = np.random.RandomState(5)
    img, _, _ = _inputs(rng)
    ti = nchw(img)

    r_main.eval(), r_stud.eval()
    with torch.no_grad():
        out1, _ = r_main.predict(r_stud, ti)

    z = f_stud.apply(v_stud, jnp.asarray(img), False,
                     method=ShapeStudent.sample_from_image)
    f_out1 = f_main.apply(v_main, jnp.asarray(img), z,
                          method=WTPSE.predict_with_shape)
    np.testing.assert_allclose(
        np.asarray(f_out1), out1.numpy().transpose(0, 2, 3, 1), atol=2e-4)

    # two-step stage: reference takes inputs_all = [inputs, two_stage_inputs]
    # (Trainer.py:181-184 stacks the ROI twice)
    torch.manual_seed(11)
    r_main2 = algorithms.WT_PSE(3, 1, hp, "cpu", two_step=True,
                                per_domain_batch=PDB, source_domain_num=DOMAINS)
    cfg = ModelConfig.from_hparams(hp, n_classes=1)
    f_main2 = WTPSE(cfg, two_step=True)
    v_main2 = _load_flax(
        f_main2, r_main2,
        (jnp.zeros((B, HW, HW, 3), jnp.float32), jnp.zeros((B, HW, HW, 1), jnp.float32)))
    roi = (img + 1.0) * (rng.rand(B, HW, HW, 1) > 0.5).astype(np.float32) - 1.0
    r_main2.eval()
    with torch.no_grad():
        out2, _ = r_main2.predict(r_stud, torch.stack([nchw(roi), nchw(roi)]))
    z2 = f_stud.apply(v_stud, jnp.asarray(roi), False,
                      method=ShapeStudent.sample_from_image)
    f_out2 = f_main2.apply(v_main2, jnp.asarray(roi), z2,
                           method=WTPSE.predict_with_shape)
    np.testing.assert_allclose(
        np.asarray(f_out2), out2.numpy().transpose(0, 2, 3, 1), atol=2e-4)


def test_full_iteration_matches_reference(ref, monkeypatch):
    """One FULL 4-phase training iteration vs the ACTUAL reference sequence.

    Replays ``Trainer.py:762-924`` verbatim on the real ``algorithms.WT_PSE`` /
    ``shape_networks.ShapeVariationalDist_x`` modules with 4 real
    ``torch.optim.Adam`` optimizers (``train.py:118-138`` construction), all six
    N(0,1) draws injected on both sides (teacher ``torch.randn_like`` ×4,
    student ``torch.normal`` ×2 / ``jax.random.normal`` ×6 in trace order), and
    asserts the fused TPU step produces the same losses AND the same post-step
    parameters + BN statistics on all four networks. This closes the last
    oracle gap: the per-update parity tests above pin the phase math; this pins
    the *sequencing* — teacher-uses-post-step-#1-weights, teacher BN
    double-update, detached ROI, pos-weight — against the reference itself
    rather than the hand-written ``tests/torch_ref`` mirror."""
    algorithms, shape_networks = ref
    hp = dict(default_hparams("WT_PSE"))
    cfg = ModelConfig.from_hparams(hp, n_classes=1)

    # fresh nets (the update tests mutate the module fixture's BN stats)
    torch.manual_seed(21)
    t_main = algorithms.WT_PSE(3, 1, hp, "cpu", two_step=False,
                               per_domain_batch=PDB, source_domain_num=DOMAINS)
    t_stud = shape_networks.ShapeVariationalDist_x(
        hp, "cpu", 1, number_source_domain=DOMAINS, batch_size=PDB)
    t_main_oc = algorithms.WT_PSE(3, 1, hp, "cpu", two_step=True,
                                  per_domain_batch=PDB, source_domain_num=DOMAINS)
    t_stud_oc = shape_networks.ShapeVariationalDist_x(
        hp, "cpu", 1, number_source_domain=DOMAINS, batch_size=PDB)

    f_main, f_stud = WTPSE(cfg), ShapeStudent(cfg)
    f_main_oc, f_stud_oc = WTPSE(cfg, two_step=True), ShapeStudent(cfg)
    x0 = jnp.zeros((B, HW, HW, 3), jnp.float32)
    m0 = jnp.zeros((B, HW, HW, 1), jnp.float32)
    v_main = _load_flax(f_main, t_main, (x0, m0))
    v_stud = _load_flax(f_stud, t_stud, (x0,))
    v_main_oc = _load_flax(f_main_oc, t_main_oc, (x0, m0))
    v_stud_oc = _load_flax(f_stud_oc, t_stud_oc, (x0,))

    rng = np.random.RandomState(6)
    img, tgt_od, _ = _inputs(rng)
    yy, xx = np.mgrid[0:HW, 0:HW]
    oc = ((yy - 32) ** 2 + (xx - 32) ** 2 < 120).astype(np.float32)
    tgt_oc = np.tile(oc[None, :, :, None], (B, 1, 1, 1))
    eps = [rng.randn(B, HW, HW, 1).astype(np.float32) for _ in range(6)]
    e1, e2t, e2s, e3, e4t, e4s = eps

    # ---- torch side: Trainer.py:762-924 verbatim -------------------------
    randn_q = [nchw(e) for e in (e1, e2t, e3, e4t)]
    normal_q = [nchw(e) for e in (e2s, e4s)]
    monkeypatch.setattr(torch, "randn_like",
                        lambda t, **k: randn_q.pop(0).to(t.dtype))
    monkeypatch.setattr(torch, "normal",
                        lambda mu, std: mu + std * normal_q.pop(0).to(mu.dtype))
    lr = 5e-4
    opt = torch.optim.Adam(t_main.parameters(), lr=lr, betas=(0.9, 0.99))
    opt_shape = torch.optim.Adam(t_stud.parameters(), lr=lr, betas=(0.9, 0.99))
    opt_oc = torch.optim.Adam(t_main_oc.parameters(), lr=lr, betas=(0.9, 0.99))
    opt_shape_oc = torch.optim.Adam(t_stud_oc.parameters(), lr=lr,
                                    betas=(0.9, 0.99))
    for n in (t_main, t_stud, t_main_oc, t_stud_oc):
        n.train()
    ti, tod, toc = nchw(img), nchw(tgt_od), nchw(tgt_oc)

    opt.zero_grad()  # Trainer.py:767
    out, _, _, inst, dom = t_main.update(ti, tod, two_stage_inputs=ti,
                                         two_step=True)  # Trainer.py:779
    t_loss_seg = torch.nn.BCELoss()(torch.sigmoid(out), tod)
    # feature capture for the f64 MMD cross-check must precede the Adam step
    t_feats_1 = torch_wt_feats(t_main, ti)
    (t_loss_seg + inst + dom).backward()  # instance/domain_wt_gm = 1
    opt.step()

    opt_shape.zero_grad()  # Trainer.py:813 (multi-turn = 1)
    kd, inst_tot, _ij, _ii, dom_s = t_stud.update(
        t_main, ti, tod, two_stage_inputs=ti, two_step=True)
    (kd + inst_tot + dom_s).backward()
    opt_shape.step()

    od_pred = (torch.sigmoid(out) > 0.75).float().detach()  # Trainer.py:842
    roi = (ti + 1) * od_pred - 1
    opt_oc.zero_grad()
    out_oc, _, _, inst_oc, dom_oc = t_main_oc.update(
        roi, toc, two_stage_inputs=roi, two_step=True)
    w = torch.sum(od_pred) / torch.sum(od_pred * toc)
    if torch.isinf(w) or torch.isnan(w):
        w = torch.tensor(1.0)
    t_loss_oc = torch.nn.functional.binary_cross_entropy_with_logits(
        out_oc * od_pred, toc, pos_weight=w)
    t_feats_3 = torch_wt_feats(t_main_oc, roi)
    (t_loss_oc + inst_oc + dom_oc).backward()
    opt_oc.step()

    opt_shape_oc.zero_grad()
    kd_oc, inst_tot_oc, _, _, dom_s_oc = t_stud_oc.update(
        t_main_oc, roi, toc, two_stage_inputs=roi, two_step=True)
    (kd_oc + inst_tot_oc + dom_s_oc).backward()
    opt_shape_oc.step()
    assert not randn_q and not normal_q  # all draws consumed

    # ---- JAX side: the fused step, eps injected in trace order ----------
    from wt_pse_tpu.train.state import init_ensemble
    from wt_pse_tpu.train.step import StepConfig, make_train_step

    state, txs = init_ensemble(f_main, f_stud, f_main_oc, f_stud_oc,
                               (B, HW, HW, 3), jax.random.PRNGKey(0))
    rep = lambda net, v: net.replace(
        params=v["params"], batch_stats=v["batch_stats"])
    state = state.replace(od=rep(state.od, v_main),
                          od_shape=rep(state.od_shape, v_stud),
                          oc=rep(state.oc, v_main_oc),
                          oc_shape=rep(state.oc_shape, v_stud_oc))
    # fresh Adam state on the loaded params (same zero-init as torch Adam)
    state = state.replace(
        od=state.od.replace(opt_state=txs["od"].init(state.od.params)),
        od_shape=state.od_shape.replace(
            opt_state=txs["od_shape"].init(state.od_shape.params)),
        oc=state.oc.replace(opt_state=txs["oc"].init(state.oc.params)),
        oc_shape=state.oc_shape.replace(
            opt_state=txs["oc_shape"].init(state.oc_shape.params)))

    jax_q = [jnp.asarray(e) for e in (e1, e2t, e2s, e3, e4t, e4s)]

    def fake_normal(key, shape=(), dtype=jnp.float32):
        e = jax_q.pop(0)
        assert tuple(shape) == e.shape, (shape, e.shape)
        return e.astype(dtype)

    monkeypatch.setattr(jax.random, "normal", fake_normal)
    step = make_train_step(f_main, f_stud, f_main_oc, f_stud_oc, txs,
                           StepConfig(hp, DOMAINS, PDB,
                                      replicate_ref_quirks=True))
    batch = {"image": jnp.asarray(img), "target_od": jnp.asarray(tgt_od),
             "target_oc": jnp.asarray(tgt_oc)}
    # eager (unjitted) so the queue pops in python execution order
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert not jax_q  # all six draws consumed
    monkeypatch.undo()

    # ---- losses --------------------------------------------------------
    # The phase-1 JAX forward is replayed eagerly on the pre-step variables —
    # bit-identical to what the (unjitted) step consumed (same variables, same
    # injected eps; the BN forward uses batch stats, not running stats).
    (f_out1, _, wt1), _ = f_main.apply(
        v_main, jnp.asarray(img), jnp.asarray(tgt_od), jnp.asarray(img), True,
        eps=jnp.asarray(e1), mutable=["batch_stats"])
    # loss_seg: well-posed three-way check (docstring of assert_seg_bce_matches;
    # the former direct f32 rtol=1e-5 comparison was context-sensitive, r4
    # VERDICT weak #1)
    assert_seg_bce_matches(out.detach().numpy().transpose(0, 2, 3, 1),
                           np.asarray(f_out1), tgt_od,
                           t_loss_seg.detach(), metrics["loss_seg"])
    close = lambda a, b, **kw: np.testing.assert_allclose(
        float(a), float(b.detach()), **kw)
    # remaining f32-vs-f32 loss comparisons: rtol=1e-4 sits ~4x above the
    # measured cross-framework conv-noise floor (rel 2.6e-5, the loss_seg
    # standalone measurement above — same U-Net forwards feed all of them)
    close(metrics["loss_ins_wt"], inst, rtol=1e-4)
    # KD losses run the TEACHER on post-phase-1/3 weights: those weights carry
    # one Adam step whose f32-noise-gradient elements legitimately differ by
    # up to ~lr between frameworks, so the KD drift floor is lr-scale, not the
    # update-level 5e-4 (measured ~1.1e-3 relative on a 0.017 value)
    close(metrics["loss_kd"], kd, rtol=5e-3, atol=3e-5)
    close(metrics["loss_ins_wt_shape"], inst_tot, rtol=1e-4)
    close(metrics["pos_weight_oc"], w, rtol=1e-4)
    close(metrics["loss_seg_oc"], t_loss_oc, rtol=1e-4)
    close(metrics["loss_kd_oc"], kd_oc, rtol=5e-3, atol=3e-5)
    close(metrics["loss_ins_wt_oc"], inst_oc, rtol=1e-4)
    # MMD residuals are cancellation-dominated: compare well-posed, in f64
    # from each side's own f32 features (dom_mmd64; wt1 replayed above).
    assert_domain_mmd_matches(t_feats_1, [np.asarray(z) for z in wt1],
                              dom, metrics["loss_dom_wt"])
    roi_j = (jnp.asarray(img) + 1.0) * (
        jax.nn.sigmoid(f_out1) > 0.75).astype(jnp.float32) - 1.0
    # ROI threshold flips at f32 noise (<1e-3 of pixels) perturb the OC-side
    # features a little more than conv noise alone; 5% still rejects any
    # semantic divergence (wrong kernel, wrong slicing, wrong denominators)
    (_, _, wt3), _ = f_main_oc.apply(
        v_main_oc, roi_j, jnp.asarray(tgt_oc), roi_j, True,
        eps=jnp.asarray(e3), mutable=["batch_stats"])
    assert_domain_mmd_matches(t_feats_3, [np.asarray(z) for z in wt3],
                              dom_oc, metrics["loss_dom_wt_oc"], rtol64=0.05)

    # ---- post-iteration state, all four nets -----------------------------
    # Tolerances as in test_step_torch_parity: Adam's first step is
    # ~ +-lr*sign(grad), so f32-noise-level grads can disagree by up to 2*lr
    # elementwise; the bulk must agree tightly. BN stats are plain statistics,
    # but the OC side sits behind a hard sigmoid>0.75 threshold whose
    # borderline pixels legitimately flip at f32 noise.
    pairs = ((t_main, new_state.od), (t_stud, new_state.od_shape),
             (t_main_oc, new_state.oc), (t_stud_oc, new_state.oc_shape))
    for tnet, jnet in pairs:
        conv = convert_state_dict(tnet.state_dict())
        want, matched = load_into_variables(
            {"params": jnet.params, "batch_stats": jnet.batch_stats}, conv)
        assert len(matched) > 100
        pdiffs = [np.abs(np.asarray(g) - np.asarray(v)).ravel()
                  for g, v in zip(jax.tree.leaves(jnet.params),
                                  jax.tree.leaves(want["params"]))]
        assert max(d.max() for d in pdiffs) <= 2.2 * lr
        # Adam's FIRST step is exactly +-lr*sign(grad) for every element, so
        # the mean diff measures gradient-sign agreement: elements whose true
        # gradient sits at f32-conv-noise level flip sign between frameworks
        # and land at 2*lr. The student nets' KD gradients (loss ~0.017 behind
        # two U-Nets) have a larger tiny-|grad| population than the seg nets,
        # so the bulk bound is looser than test_step_torch_parity's seg-only
        # 6e-5 (measured 1.1e-4 here; bound 2e-4 = ~20% flip headroom)
        assert np.concatenate(pdiffs).mean() <= 2e-4
        sdiffs = [np.abs(np.asarray(g) - np.asarray(v)).ravel()
                  for g, v in zip(jax.tree.leaves(jnet.batch_stats),
                                  jax.tree.leaves(want["batch_stats"]))]
        # worst-case 5e-3: beyond the ROI threshold flips, the OC-side teacher
        # BN double-update runs on post-Adam-step weights (lr-noise different
        # between frameworks), so isolated running-var entries drift a bit
        # further than in the pre-step update tests (measured 3.0e-3)
        assert max(d.max() for d in sdiffs) <= 5e-3
        assert np.concatenate(sdiffs).mean() <= 2e-4


def test_export_rename_loads_into_reference(ref):
    """``export_torch_state_dict`` + ``rename_for_reference`` produce a dict the
    ACTUAL reference modules load: every exported key exists in the reference
    state_dict with the identical array, and the only reference keys not
    covered are BatchNorm ``num_batches_tracked`` counters (torch bookkeeping
    with no flax counterpart). Since the flax variables were themselves loaded
    FROM these reference nets, this is a full round-trip value check.

    Fresh nets (not the ``nets`` fixture): the update tests mutate the
    fixture's torch BN running stats in-place, which the fixture's Flax
    variables are deliberate snapshots of the *initial* state."""
    from wt_pse_tpu.io.checkpoint import export_torch_state_dict, rename_for_reference

    algorithms, shape_networks = ref
    hp = dict(default_hparams("WT_PSE"))
    cfg = ModelConfig.from_hparams(hp, n_classes=1)
    torch.manual_seed(17)
    r_main = algorithms.WT_PSE(3, 1, hp, "cpu", two_step=False,
                               per_domain_batch=PDB, source_domain_num=DOMAINS)
    r_stud = shape_networks.ShapeVariationalDist_x(
        hp, "cpu", 1, number_source_domain=DOMAINS, batch_size=PDB)
    x0 = jnp.zeros((B, HW, HW, 3), jnp.float32)
    m0 = jnp.zeros((B, HW, HW, 1), jnp.float32)
    v_main = _load_flax(WTPSE(cfg), r_main, (x0, m0))
    v_stud = _load_flax(ShapeStudent(cfg), r_stud, (x0,))
    for r_net, v in ((r_main, v_main), (r_stud, v_stud)):
        exported = rename_for_reference(export_torch_state_dict(v))
        ref_sd = r_net.state_dict()
        unexpected = set(exported) - set(ref_sd)
        assert not unexpected, f"keys the reference does not know: {sorted(unexpected)[:8]}"
        missing = set(ref_sd) - set(exported)
        assert all(k.endswith("num_batches_tracked") for k in missing), (
            f"reference keys left uncovered: "
            f"{sorted(k for k in missing if not k.endswith('num_batches_tracked'))[:8]}")
        for k, arr in exported.items():
            np.testing.assert_array_equal(
                arr, ref_sd[k].numpy(), err_msg=k)
        # and torch accepts it (strict=False only because of the counters)
        out = r_net.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(a)) for k, a in exported.items()},
            strict=False)
        assert not out.unexpected_keys
