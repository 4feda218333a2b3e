"""Teacher and student variational shape priors.

Teacher (:class:`TeacherShapePrior`) = reference ``ShapeVariationalDist_y_x``
(``/root/reference/algorithms.py:979-1075``): conditioned on the ground-truth mask,
available only at train time. Student (:class:`ShapeStudent`) = reference
``ShapeVariationalDist_x`` (``shape_networks.py:415-598``): sees only its own DeepWT
features, distilled from the teacher via an MSE on the ``mu`` maps, used at test time.

Sampling semantics (parity-critical, both nets trained into the released ckpt):

- teacher: textbook reparameterization ``z = mu + exp(logvar/2) * eps``
  (``algorithms.py:1068-1075``), no NaN scrubbing in ``sample_forward``;
- student: ``std`` is NaN/Inf-scrubbed, then the *quirk* reparameterization
  ``z = (mu + std*eps) * std + mu`` — i.e. ``torch.normal(mu, std) * std + mu``
  (``shape_networks.py:502-510``); ``mu`` is scrubbed before use
  (``shape_networks.py:489-500``). We reproduce both faithfully.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from wt_pse_tpu.models.common import ModelConfig, unet_run
from wt_pse_tpu.models.deepwt import DeepWT
from wt_pse_tpu.models.layers import ConvD, ConvU, ConvStack1x1, DoubleConv


def _scrub(x: jax.Array) -> jax.Array:
    """torch.nan_to_num parity: NaN -> 0, +/-Inf -> +/-max_finite."""
    return jnp.nan_to_num(x)


class TeacherShapePrior(nn.Module):
    """Mask-conditioned prior. ``sample(features, mask, rng)`` -> (z, mu).

    With ``whitening=True`` the mask goes through ``inc`` (DoubleConv 1->n) and is
    fused with the n-channel DeepWT features by a 1x1 conv + ReLU
    (``algorithms.py:1014-1019``); otherwise mask and image are concatenated before
    ``inc`` (``algorithms.py:1020-1023``).
    """

    cfg: ModelConfig
    n_channels: int = 1  # mask channels

    def setup(self):
        n = self.cfg.base_width
        ax = self.cfg.bn_axis_name
        dt = self.cfg.compute_dtype
        if self.cfg.whitening:
            self.inc = DoubleConv(n, bn_axis_name=ax, dtype=dt)
            self.fusion = ConvStack1x1([n], dtype=dt)
        else:
            self.inc = DoubleConv(n, bn_axis_name=ax, dtype=dt)
        self.down1 = ConvD(2 * n, bn_axis_name=ax, dtype=dt)
        self.down2 = ConvD(4 * n, bn_axis_name=ax, dtype=dt)
        self.down3 = ConvD(8 * n, bn_axis_name=ax, dtype=dt)
        self.down4 = ConvD(16 * n, bn_axis_name=ax, dtype=dt)
        self.up1 = ConvU(16 * n, first=True, bn_axis_name=ax, dtype=dt)
        self.up2 = ConvU(8 * n, bn_axis_name=ax, dtype=dt)
        self.up3 = ConvU(4 * n, bn_axis_name=ax, dtype=dt)
        self.up4 = ConvU(2 * n, bn_axis_name=ax, dtype=dt)
        self.mu_prior = ConvStack1x1([2 * n, 8, 1], dtype=dt)
        self.logvar_prior = ConvStack1x1([2 * n, 8, 1], dtype=dt)

    def extract(self, inputs: jax.Array, mask: jax.Array, train: bool) -> jax.Array:
        packed = self.cfg.s2d  # teacher runs only in the train path
        if self.cfg.whitening:
            mask_x1 = self.inc(mask, train, packed)
            x1 = jnp.concatenate([mask_x1, inputs], axis=-1)
            x1 = nn.relu(self.fusion(x1, packed))
        else:
            x1 = self.inc(jnp.concatenate([mask, inputs], axis=-1), train, packed)
        return unet_run(self, x1, train, packed)

    def __call__(self, inputs, mask, train: bool = True, sample: bool = True,
                 eps: jax.Array | None = None):
        """(z, mu) when sampling (training path) else mu (algorithms.py:1055-1066).

        ``eps`` injects the N(0,1) draw (parity tests); default draws from the
        'sample' RNG stream. Under ``cfg.s2d`` all tensors are packed.
        """
        packed = self.cfg.s2d
        fm = self.extract(inputs, mask, train)
        mu = self.mu_prior(fm, packed)
        if not sample:
            return mu
        logvar = self.logvar_prior(fm, packed)
        std = jnp.exp(logvar / 2)
        if eps is None:
            eps = jax.random.normal(self.make_rng("sample"), std.shape, std.dtype)
        return mu + std * eps, mu

    def initialize(self, inputs, mask):
        """Trace every parameterized branch (for ``.init``). Under ``cfg.s2d``
        the teacher's train path is packed-only, so pack the example inputs
        (the param tree is identical either way — folding is apply-time)."""
        if self.cfg.s2d:
            from wt_pse_tpu.ops.packed import pack

            inputs, mask = pack(inputs), pack(mask)
        return self(inputs, mask, train=False, sample=True,
                    eps=jnp.zeros(inputs.shape[:3] + (1,), inputs.dtype))


class ShapeStudent(nn.Module):
    """Test-time shape net over its own DeepWT features (no mask input).

    With ``whitening=True`` the DeepWT output feeds the trunk directly
    (``shape_networks.py:468-472``: ``x1 = inputs``); the 16-channel feature map is
    both the trunk input and the up4 skip connection.
    """

    cfg: ModelConfig

    def setup(self):
        n = self.cfg.base_width
        ax = self.cfg.bn_axis_name
        dt = self.cfg.compute_dtype
        self.wt_model = DeepWT(n, whitening=self.cfg.whitening, dtype=dt)
        if not self.cfg.whitening:
            self.inc = DoubleConv(n, bn_axis_name=ax, dtype=dt)
        self.down1 = ConvD(2 * n, bn_axis_name=ax, dtype=dt)
        self.down2 = ConvD(4 * n, bn_axis_name=ax, dtype=dt)
        self.down3 = ConvD(8 * n, bn_axis_name=ax, dtype=dt)
        self.down4 = ConvD(16 * n, bn_axis_name=ax, dtype=dt)
        self.up1 = ConvU(16 * n, first=True, bn_axis_name=ax, dtype=dt)
        self.up2 = ConvU(8 * n, bn_axis_name=ax, dtype=dt)
        self.up3 = ConvU(4 * n, bn_axis_name=ax, dtype=dt)
        self.up4 = ConvU(2 * n, bn_axis_name=ax, dtype=dt)
        self.mu_prior = ConvStack1x1([2 * n, 8, 1], dtype=dt)
        self.logvar_prior = ConvStack1x1([2 * n, 8, 1], dtype=dt)

    def wt_forward(self, x: jax.Array) -> list[jax.Array]:
        """Run only the DeepWT front-end (used by WT_PSE.predict at eval,
        ``algorithms.py:1333-1338``)."""
        return self.wt_model(x)

    def extract(self, inputs: jax.Array, train: bool, packed: bool = False) -> jax.Array:
        x1 = inputs if self.cfg.whitening else self.inc(inputs, train, packed)
        return unet_run(self, x1, train, packed)

    def __call__(self, inputs, train: bool = True, sample: bool = True,
                 eps: jax.Array | None = None, packed: bool = False):
        """(z, mu) when sampling else scrubbed mu (shape_networks.py:483-500).

        ``packed`` is an explicit argument (not ``cfg.s2d``) because the student
        runs in BOTH the packed train path (update_forward) and the unpacked
        eval path (sample_from_image) from the same parameters."""
        fm = self.extract(inputs, train, packed)
        mu = _scrub(self.mu_prior(fm, packed))
        if not sample:
            return mu
        logvar = self.logvar_prior(fm, packed)
        std = _scrub(jnp.exp(logvar / 2))
        if eps is None:
            eps = jax.random.normal(self.make_rng("sample"), std.shape, std.dtype)
        sampled_z = mu + std * eps
        z = sampled_z * std + mu  # deliberate reference quirk, see module docstring
        return z, mu

    def sample_from_image(self, image: jax.Array, train: bool = False,
                          packed: bool = False):
        """wt_model -> trunk -> mu, the full student inference path. Unpacked
        by default (checkpoint parity path); ``packed`` runs space-to-depth
        (exact same math — fast-validation path)."""
        feats = self.wt_model(image, packed)
        return self(feats[-1], train=train, sample=False, packed=packed)

    def update_forward(self, image: jax.Array, train: bool = True,
                       eps: jax.Array | None = None):
        """The student half of the distillation step (shape_networks.py:517-526):
        own DeepWT -> trunk -> sampled (z, mu); returns (z, mu, wt_feats) so the
        caller can compute the student whitening losses on wt_feats[0:2].
        ``eps`` injects the N(0,1) draw (parity tests). Packed under ``cfg.s2d``."""
        packed = self.cfg.s2d
        feats = self.wt_model(image, packed)
        x = feats[-1] if self.cfg.whitening else image
        z, mu = self(x, train=train, sample=True, eps=eps, packed=packed)
        return z, mu, feats

    def initialize(self, image):
        """Trace every parameterized branch (for ``.init``)."""
        feats = self.wt_model(image)
        x = feats[-1] if self.cfg.whitening else image
        return self(x, train=False, sample=True,
                    eps=jnp.zeros(image.shape[:3] + (1,), image.dtype))
