"""Joint (non-distilled) shape-regularization variant.

Reference: ``Unet_nips2023_joint_shape_regularization``
(``/root/reference/algorithms.py:1357-1657``; selected via
``--algorithm Unet_nips2023_joint_shape_regularization``, dispatched at
``Trainer.py:1032-1035``): the same U-Net + embedding head, but the shape prior is
a single x-conditioned net (no mask-conditioned teacher, no distilled student) used
both at train and test time, with the whitening losses disabled by its hparams
block (``hparams_registry.py:126-131``).

**Reference breakage, repaired here (documented, not replicated):** as shipped, the
reference class cannot run — ``ShapeVariationalDist_x`` is an undefined name inside
``algorithms.py`` (it lives only in ``shape_networks.py`` and is never imported;
construction raises ``NameError``, ``algorithms.py:1416``), and even with the
import fixed the call ``sample_forward(feats, None, training=True)`` passes three
arguments to a two-parameter method (``algorithms.py:1473``). The *intent* is
unambiguous from the surrounding code: an x-only prior sampled with the quirk
reparameterization (``algorithms.py:1435-1440``) gating the embedding through the
shared attention layer. That is what this module implements.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from wt_pse_tpu.models.common import ModelConfig, attention_fuse, unet_run
from wt_pse_tpu.models.deepwt import DeepWT
from wt_pse_tpu.models.layers import AttentionLayer, ConvD, ConvU, ConvStack1x1
from wt_pse_tpu.models.shape_prior import ShapeStudent


class JointShapeReg(nn.Module):
    """U-Net segmenter with a jointly-trained x-conditioned shape prior."""

    cfg: ModelConfig
    two_step: bool = False

    def setup(self):
        cfg = self.cfg
        n = cfg.base_width
        ax = cfg.bn_axis_name
        dt = cfg.compute_dtype
        self.wt_model = DeepWT(n, whitening=cfg.whitening, dtype=dt)
        self.inc = ConvD(n, first=True, bn_axis_name=ax, dtype=dt)
        self.down1 = ConvD(2 * n, bn_axis_name=ax, dtype=dt)
        self.down2 = ConvD(4 * n, bn_axis_name=ax, dtype=dt)
        self.down3 = ConvD(8 * n, bn_axis_name=ax, dtype=dt)
        self.down4 = ConvD(16 * n, bn_axis_name=ax, dtype=dt)
        self.up1 = ConvU(16 * n, first=True, bn_axis_name=ax, dtype=dt)
        self.up2 = ConvU(8 * n, bn_axis_name=ax, dtype=dt)
        self.up3 = ConvU(4 * n, bn_axis_name=ax, dtype=dt)
        self.up4 = ConvU(2 * n, bn_axis_name=ax, dtype=dt)
        if cfg.shape_prior:
            # x-conditioned prior: same topology as the student shape net
            self.prior_dist = ShapeStudent(cfg)
        self.mu = ConvStack1x1([2 * n, cfg.feature_dim], dtype=dt)
        self.outc = ConvStack1x1([cfg.n_classes], dtype=dt)
        self.attention_layer = AttentionLayer(1, dtype=dt)

    def embed(self, inputs: jax.Array, train: bool, packed: bool = False) -> jax.Array:
        x1 = self.inc(inputs, train, packed=packed)
        return self.mu(unet_run(self, x1, train, packed), packed)

    def _fuse(self, embedding, z, packed: bool = False):
        return attention_fuse(self.cfg, self.attention_layer, embedding, z,
                              packed)

    def __call__(self, inputs, mask, wt_inputs, train: bool = True,
                 eps: jax.Array | None = None):
        """Training forward (reference .update() semantics minus the dead paths).
        ``mask`` is accepted for signature parity with WTPSE and ignored — the
        joint prior is x-conditioned only (algorithms.py:1473 passes mask=None).
        ``eps`` injects the prior's N(0,1) draw (parity tests).
        Returns (logits, attention>0.75 mask or None, wt feature list or None).
        With ``whitening=True`` the caller computes the instance/domain whitening
        losses over the returned wt features (algorithms.py:1522-1535 — the
        joint variant uses the same summed-over-n-1, divided-by-n semantics as
        the main WT_PSE net)."""
        del mask
        packed = self.cfg.s2d
        embedding = self.embed(inputs, train, packed)
        att_mask = None
        wt_feats = None
        if self.cfg.shape_prior:
            wt_feats = self.wt_model(wt_inputs, packed)
            # prior over its own features; quirk reparameterization lives in
            # ShapeStudent.__call__ (identical formula, algorithms.py:1435-1440)
            x = wt_feats[-1] if self.cfg.whitening else wt_inputs
            z, _mu = self.prior_dist(x, train=train, sample=True, eps=eps,
                                     packed=packed)
            embedding, att = self._fuse(embedding, z, packed)
            if att is not None:
                att_mask = (att > 0.75).astype(jnp.float32)
        return self.outc(embedding, packed), att_mask, wt_feats

    def predict(self, inputs, wt_inputs=None, packed: bool = False):
        """Eval forward: prior mean (no sampling), same fusion. ``packed``
        mirrors make_predict_fn's fast-validation layout option."""
        wt_inputs = inputs if wt_inputs is None else wt_inputs
        embedding = self.embed(inputs, train=False, packed=packed)
        if self.cfg.shape_prior:
            wt_feats = self.wt_model(wt_inputs, packed)
            x = wt_feats[-1] if self.cfg.whitening else wt_inputs
            z = self.prior_dist(x, train=False, sample=False, packed=packed)
            embedding, _ = self._fuse(embedding, z, packed)
        return self.outc(embedding, packed)

    def initialize(self, inputs, mask):
        if self.cfg.s2d:
            from wt_pse_tpu.ops.packed import pack

            inputs, mask = pack(inputs), pack(mask)
        # eps=zeros like every sibling initialize: without it the prior's
        # make_rng('sample') fires during .init and only works through flax's
        # fallback-to-params-rng (version-dependent behavior)
        return self(inputs, mask, inputs, train=False,
                    eps=jnp.zeros(inputs.shape[:3] + (1,), inputs.dtype))
