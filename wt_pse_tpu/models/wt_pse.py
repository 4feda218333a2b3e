"""The WT-PSE segmentation network (main model).

Behavioral spec: reference ``WT_PSE`` (``/root/reference/algorithms.py:1134-1353``):
5-level ConvD/ConvU U-Net (n=16) + 8-dim 1x1-conv embedding head ``mu`` + 1x1 ``outc``;
a DeepWT front-end feeding a mask-conditioned teacher shape prior whose sample gates
the embedding through a sigmoid attention layer:

    fuse = coef * embedding + attention(z) * embedding      (algorithms.py:1248-1249)

The whitening/covariance losses over the DeepWT feature maps live in
``wt_pse_tpu.ops.whitening`` — the module returns the raw feature maps so the loss
can be computed (and fused) outside the network definition.

Parameter tree matches the reference state_dict names (inc/down1..4/up1..4/mu/outc/
wt_model/prior_dist/attention_layer) so the released ``.pth.tar`` imports mechanically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from wt_pse_tpu.models.common import ModelConfig, attention_fuse, unet_run
from wt_pse_tpu.models.deepwt import DeepWT
from wt_pse_tpu.models.layers import AttentionLayer, ConvD, ConvU, ConvStack1x1
from wt_pse_tpu.models.shape_prior import TeacherShapePrior


class WTPSE(nn.Module):
    cfg: ModelConfig
    two_step: bool = False  # second (OC-on-ROI) phase of the coarse-to-fine strategy

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
            self.prior_dist = TeacherShapePrior(cfg)
        # (the reference's feature_dim_fuse bookkeeping — feature_dim+1 under
        # cat_shape, algorithms.py:1160-1164 — is unnecessary here: outc infers
        # its input width from the fused embedding)
        self.mu = ConvStack1x1([2 * n, cfg.feature_dim], dtype=dt)
        self.outc = ConvStack1x1([cfg.n_classes], dtype=dt)
        self.attention_layer = AttentionLayer(1, dtype=dt)

    # -- shared pieces -----------------------------------------------------

    def embed(self, inputs: jax.Array, train: bool, packed: bool = False) -> jax.Array:
        """U-Net trunk -> 8-dim embedding (algorithms.py:1218-1227)."""
        x1 = self.inc(inputs, train, packed=packed)
        x = unet_run(self, x1, train, packed)
        return self.mu(x, packed)

    def _fuse(self, embedding: jax.Array, z_posterior: jax.Array,
              packed: bool = False):
        """Attention-gated fusion (algorithms.py:1241-1253). Returns
        (fused embedding, attention map)."""
        return attention_fuse(self.cfg, self.attention_layer, embedding,
                              z_posterior, packed)

    # -- training forward (reference .update(), algorithms.py:1216-1275) ----

    def __call__(self, inputs, mask, wt_inputs, train: bool = True,
                 eps: jax.Array | None = None):
        """Training forward. ``wt_inputs`` is the image fed to the DeepWT front-end
        (the reference always calls update(two_step=True) with
        ``two_stage_inputs`` = the stage input, Trainer.py:779-784, 856-862).

        With ``cfg.s2d`` every argument must already be packed (ops/packed.py);
        logits/att_mask/wt features come back packed (phase-invariant losses
        consume them directly).

        Returns (logits, attention>0.75 mask or None, wt feature list or None).
        """
        packed = self.cfg.s2d
        embedding = self.embed(inputs, train, packed)
        att_mask = None
        wt_feats = None
        if self.cfg.shape_prior:
            wt_feats = self.wt_model(wt_inputs, packed)
            z_posterior, _z_mu = self.prior_dist(
                wt_feats[-1], mask, train=train, sample=True, eps=eps)
            embedding, att = self._fuse(embedding, z_posterior, packed)
            if att is not None:
                att_mask = (att > 0.75).astype(jnp.float32)
        output = self.outc(embedding, packed)
        return output, att_mask, wt_feats

    # -- inference forward (reference .predict(), algorithms.py:1311-1353) --

    def predict_with_shape(self, inputs, z_posterior, packed: bool = False):
        """Eval forward given the *student's* shape sample (the student net is a
        separate parameter tree; the trainer wires them together). ``packed``
        runs the space-to-depth layout (exact same math — fast-validation
        path); the default unpacked path is the checkpoint-parity one."""
        embedding = self.embed(inputs, train=False, packed=packed)
        if self.cfg.shape_prior:
            embedding, _ = self._fuse(embedding, z_posterior, packed)
        return self.outc(embedding, packed)

    def predict_no_shape(self, inputs, packed: bool = False):
        """Eval forward with shape_prior disabled (seg-only baseline config)."""
        return self.outc(self.embed(inputs, train=False, packed=packed), packed)

    # -- teacher access for the student's distillation step -----------------

    def initialize(self, inputs, mask):
        """Trace every parameterized branch (for ``.init``). Under ``cfg.s2d``
        the train path is packed-only; pack the example inputs (the param tree
        is identical either way — kernel folding is apply-time)."""
        if self.cfg.s2d:
            from wt_pse_tpu.ops.packed import pack

            inputs, mask = pack(inputs), pack(mask)
        return self(inputs, mask, inputs, train=False,
                    eps=jnp.zeros(inputs.shape[:3] + (1,), inputs.dtype))

    def teacher_sample(self, wt_inputs, mask, train: bool = True,
                       eps: jax.Array | None = None):
        """DeepWT + teacher sample, used inside the student update
        (shape_networks.py:516-524 calls main_network.wt_model / .prior_dist).
        Packed inputs under ``cfg.s2d`` (train path)."""
        wt_feats = self.wt_model(wt_inputs, self.cfg.s2d)
        z, mu = self.prior_dist(wt_feats[-1], mask, train=train, sample=True, eps=eps)
        return z, mu
