"""Full-iteration torch parity for the deterministic configuration.

With ``shape_prior=False, whitening=False`` the 4-phase step reduces to the two
segmentation phases with no random draws, so one reference-semantics iteration
can be reproduced bit-for-bit in torch: phase-1 BCE + Adam on the OD net, ROI
construction, phase-3 pos-weighted BCE-with-logits + Adam on the OC net
(``/root/reference/Trainer.py:779-892`` minus the whitening/shape terms).
The random phases' pieces are covered by eps-injected unit tests elsewhere.
"""


import pytest
import numpy as np
import torch

import jax
import jax.numpy as jnp

from wt_pse_tpu.config import default_hparams
from wt_pse_tpu.io.torch_import import convert_state_dict, load_into_variables
from wt_pse_tpu.models.common import ModelConfig
from wt_pse_tpu.models.shape_prior import ShapeStudent
from wt_pse_tpu.models.wt_pse import WTPSE
from wt_pse_tpu.train.state import init_ensemble
from wt_pse_tpu.train.step import StepConfig, make_train_step

import torch_ref

pytestmark = pytest.mark.slow  # compile-heavy; scripts/test.sh default skips


def nchw(x):
    return np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2)))


class SegOnly(torch.nn.Module):
    """torch mirror of WTPSE with shape_prior disabled: trunk + mu + outc."""

    def __init__(self, n=16):
        super().__init__()
        full = torch_ref.WTPSE(n)
        for name in ("inc", "down1", "down2", "down3", "down4",
                     "up1", "up2", "up3", "up4", "mu", "outc"):
            setattr(self, name, getattr(full, name))

    def forward(self, x):
        x1 = self.inc(x)
        x2 = self.down1(x1)
        x3 = self.down2(x2)
        x4 = self.down3(x3)
        x5 = self.down4(x4)
        y = self.up1(x5, x4)
        y = self.up2(y, x3)
        y = self.up3(y, x2)
        y = self.up4(y, x1)
        return self.outc(self.mu(y))


def test_two_phase_iteration_matches_torch_exact(rng):
    """Same as above but orchestrated so the torch initial weights are captured
    before stepping."""
    b, hw = 4, 32
    hparams = dict(default_hparams("WT_PSE"))
    hparams.update(shape_prior=False, whitening=False)
    cfg = ModelConfig.from_hparams(hparams)

    torch.manual_seed(0)  # order-independent init (suite runs advance the RNG)
    t_od, t_oc = SegOnly(), SegOnly()
    init_od = {k: v.clone() for k, v in t_od.state_dict().items()}
    init_oc = {k: v.clone() for k, v in t_oc.state_dict().items()}

    img = rng.rand(b, hw, hw, 3).astype(np.float32) * 2 - 1
    yy, xx = np.mgrid[0:hw, 0:hw]
    od = ((yy - 16) ** 2 + (xx - 16) ** 2 < 100).astype(np.float32)
    oc = ((yy - 16) ** 2 + (xx - 16) ** 2 < 36).astype(np.float32)
    tgt_od = np.tile(od[None, :, :, None], (b, 1, 1, 1))
    tgt_oc = np.tile(oc[None, :, :, None], (b, 1, 1, 1))

    ti = torch.from_numpy(nchw(img))
    tod = torch.from_numpy(nchw(tgt_od))
    toc = torch.from_numpy(nchw(tgt_oc))
    opt_od = torch.optim.Adam(t_od.parameters(), lr=5e-4, betas=(0.9, 0.99))
    opt_oc = torch.optim.Adam(t_oc.parameters(), lr=5e-4, betas=(0.9, 0.99))
    t_od.train(), t_oc.train()
    opt_od.zero_grad()
    out = t_od(ti)
    torch.nn.BCELoss()(torch.sigmoid(out), tod).backward()
    opt_od.step()
    od_pred = (torch.sigmoid(out) > 0.75).float().detach()
    roi = (ti + 1) * od_pred - 1
    opt_oc.zero_grad()
    out_oc = t_oc(roi)
    w = torch.sum(od_pred) / torch.sum(od_pred * toc)
    if torch.isinf(w) or torch.isnan(w):
        w = torch.tensor(1.0)
    torch.nn.functional.binary_cross_entropy_with_logits(
        out_oc * od_pred, toc, pos_weight=w).backward()
    opt_oc.step()

    main_od, stud_od = WTPSE(cfg), ShapeStudent(cfg)
    main_oc, stud_oc = WTPSE(cfg, two_step=True), ShapeStudent(cfg)
    state, txs = init_ensemble(main_od, stud_od, main_oc, stud_oc,
                               (b, hw, hw, 3), jax.random.PRNGKey(0))
    v_od, m1 = load_into_variables(
        {"params": state.od.params, "batch_stats": state.od.batch_stats},
        convert_state_dict(init_od))
    v_oc, m2 = load_into_variables(
        {"params": state.oc.params, "batch_stats": state.oc.batch_stats},
        convert_state_dict(init_oc))
    assert m1 and m2
    to_j = lambda t: jax.tree.map(jnp.asarray, t)
    state = state.replace(
        od=state.od.replace(params=to_j(v_od["params"]),
                            batch_stats=to_j(v_od["batch_stats"])),
        oc=state.oc.replace(params=to_j(v_oc["params"]),
                            batch_stats=to_j(v_oc["batch_stats"])))

    step = make_train_step(main_od, stud_od, main_oc, stud_oc, txs,
                           StepConfig(hparams, 1, b))
    batch = {"image": jnp.asarray(img), "target_od": jnp.asarray(tgt_od),
             "target_oc": jnp.asarray(tgt_oc)}
    new_state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(0))

    # losses match
    np.testing.assert_allclose(
        float(metrics["loss_seg"]),
        float(torch.nn.BCELoss()(torch.sigmoid(out), tod)), rtol=1e-5)
    np.testing.assert_allclose(float(metrics["pos_weight_oc"]), float(w), rtol=1e-4)

    # post-step state matches across BOTH nets (Adam + BN semantics end-to-end).
    # Tolerances: Adam's first step is ~= +-lr * sign(grad), so wherever |grad|
    # is at f32-conv-noise level the two frameworks can disagree by up to 2*lr
    # on isolated elements — bound elementwise error by ~2*lr and the bulk by a
    # tight mean. BN running stats are plain statistics and must match tightly.
    lr = 5e-4
    for tnet, jnet in ((t_od, new_state.od), (t_oc, new_state.oc)):
        conv = convert_state_dict(tnet.state_dict())
        want, matched = load_into_variables(
            {"params": jnet.params, "batch_stats": jnet.batch_stats}, conv)
        assert len(matched) > 100
        all_diffs = []
        for g, wv in zip(jax.tree.leaves(jnet.params),
                         jax.tree.leaves(want["params"])):
            diff = np.abs(np.asarray(g) - np.asarray(wv))
            assert diff.max() <= 2.2 * lr, diff.max()
            all_diffs.append(diff.ravel())
        # bulk agreement over the whole net (tiny bias leaves are individually
        # noisy at first-Adam-step scale)
        assert np.concatenate(all_diffs).mean() <= 6e-5
        # BN stats: the OC net's input ROI is a hard threshold of phase-1 logits
        # (sigmoid>0.75, Trainer.py:842) — borderline pixels legitimately flip
        # between frameworks at f32 noise, perturbing downstream statistics.
        # Bound bulk + worst-case rather than demanding bitwise stats.
        sdiffs = []
        for g, wv in zip(jax.tree.leaves(jnet.batch_stats),
                         jax.tree.leaves(want["batch_stats"])):
            diff = np.abs(np.asarray(g) - np.asarray(wv))
            assert diff.max() <= 2e-3, diff.max()
            sdiffs.append(diff.ravel())
        assert np.concatenate(sdiffs).mean() <= 2e-4  # OC-side flips dominate
