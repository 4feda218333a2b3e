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
    # the MMD is kxx+kyy-2kxy — near-equal O(0.1-1) kernel means cancelling to
    # an O(1e-6) residual, so ~5 of its 7 f32 digits are gone before comparison;
    # a few % relative slack on the residual is f32 noise, not semantics
    np.testing.assert_allclose(float(f_dom), float(dom.detach()), rtol=0.05, atol=1e-7)
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
    # cancellation-dominated residual, see test_wtpse_update_matches_reference
    np.testing.assert_allclose(float(f_dom), float(dom.detach()), rtol=0.05, atol=1e-7)


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
    # cancellation-dominated residual, see test_wtpse_update_matches_reference
    np.testing.assert_allclose(float(f_dom), float(dom.detach()), rtol=0.05, atol=1e-7)
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


def test_export_rename_loads_into_reference(ref, nets):
    """``export_torch_state_dict`` + ``rename_for_reference`` produce a dict the
    ACTUAL reference modules load: every exported key exists in the reference
    state_dict with the identical array, and the only reference keys not
    covered are BatchNorm ``num_batches_tracked`` counters (torch bookkeeping
    with no flax counterpart). Since the flax variables were themselves loaded
    FROM these reference nets, this is a full round-trip value check."""
    from wt_pse_tpu.io.checkpoint import export_torch_state_dict, rename_for_reference

    r_main, r_stud, _, _, v_main, v_stud = nets
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
