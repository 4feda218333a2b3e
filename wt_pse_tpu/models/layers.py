"""Core layer library (Flax, NHWC).

Every block here is a TPU-first re-design of a reference building block; docstrings
cite the reference definition it is behaviorally equivalent to. Layout is NHWC
(TPU-preferred); the PyTorch checkpoint importer handles the NCHW/OIHW transposes.

Parity-critical details:

- ``BatchNorm`` reproduces torch ``nn.BatchNorm2d`` semantics exactly: eps 1e-5,
  momentum 0.1, *biased* variance for normalization, *unbiased* variance folded into
  the running estimate, running stats used verbatim in eval. An optional ``axis_name``
  turns it into a cross-replica (sync) BN under ``shard_map`` — new capability the
  reference (single-GPU) never had.
- ``upsample2x_bilinear`` / ``resize_bilinear`` match torch
  ``nn.Upsample(scale_factor=2, mode='bilinear', align_corners=False)`` /
  ``F.interpolate(mode='bilinear')`` (half-pixel centers, edge clamping), which the
  reference uses in ``ConvU`` (``/root/reference/algorithms.py:929``) and in eval-time
  native-resolution upsampling (``Trainer.py:206-209``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


class BatchNorm(nn.Module):
    """torch.nn.BatchNorm2d-parity batch normalization over NHWC inputs.

    Reference usage: ``normalization(planes, 'bn')`` inside ConvD/ConvU
    (``/root/reference/algorithms.py:862-873``).

    Args:
      features: channel count.
      momentum: torch momentum (fraction of the *new* statistic), default 0.1.
      epsilon: 1e-5 (torch default).
      axis_name: optional mesh axis for cross-replica statistics (sync BN).
    """

    features: int
    momentum: float = 0.1
    epsilon: float = 1e-5
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool, packed: bool = False) -> jax.Array:
        """``packed=True``: ``x`` is a space-to-depth tensor (..., 4*features)
        in channel-major phase layout (ops/packed.py); statistics reduce over
        (N, H, W, phases) per original channel — the same element set as the
        unpacked layout, so running stats stay layout-independent."""
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )

        if train:
            # statistics in at-least-f32 (bf16 inputs promote; f64 runs — the
            # long-horizon co-training parity harness — keep full precision
            # instead of injecting f32 cancellation noise into every layer)
            xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
            if packed:
                xf = xf.reshape(x.shape[:-1] + (self.features, 4))
                reduce_axes = tuple(range(x.ndim - 1)) + (x.ndim,)  # N,H,W,phase
            else:
                reduce_axes = tuple(range(x.ndim - 1))  # N, H, W
            n = 1
            for a in reduce_axes:
                n *= xf.shape[a]
            mean = jnp.mean(xf, axis=reduce_axes)
            mean2 = jnp.mean(jnp.square(xf), axis=reduce_axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
                n *= jax.lax.psum(1, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)  # biased, for normalization
            if not self.is_initializing():
                # torch: running = (1 - m) * running + m * batch (unbiased var)
                # — written back at the stats' OWN dtype: under x64 the f64
                # batch statistics would otherwise promote f32-initialized
                # running stats to f64 after one step, breaking the epoch
                # lax.scan carry-dtype invariant (the f64 parity harness
                # opts into f64 stats by casting batch_stats up front)
                sdt = ra_mean.value.dtype
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean).astype(sdt)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased).astype(sdt)
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        shift = bias
        if packed:
            mean, inv, shift = (jnp.repeat(t, 4) for t in (mean, inv, shift))
        return ((x - mean) * inv + shift).astype(x.dtype)


# ---------------------------------------------------------------------------
# Convolution helpers
# ---------------------------------------------------------------------------


class RefConv(nn.Module):
    """Square SAME conv with bias — drop-in for ``nn.Conv`` (identical param
    tree: ``kernel`` (k,k,in,out) lecun-normal + ``bias`` zeros, so checkpoints
    and initializers are unchanged) with one addition: ``packed=True`` applies
    the conv to a space-to-depth tensor by folding the kernel at apply time
    (ops/packed.py) — exact same math, 4x the lane utilization.

    Precision policy (parity-critical): f32 mode pins HIGHEST precision (the
    ambient default can be bf16-ish — the axon runtime lowers the global
    default — and checkpoint-parity eval needs true f32). bf16 mode computes
    natively in bf16 on the MXU (params stay f32; cast per-call)."""

    features: int
    ksize: int = 3
    dtype: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, packed: bool = False) -> jax.Array:
        k = self.ksize
        cin = x.shape[-1] // (4 if packed else 1)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.dtype is None or self.dtype == "float32":
            x = x.astype(jnp.float32)
            kernel = kernel.astype(jnp.float32)
            bias = bias.astype(jnp.float32)
            prec = jax.lax.Precision.HIGHEST
        else:
            dt = jnp.dtype(self.dtype)
            x, kernel, bias = x.astype(dt), kernel.astype(dt), bias.astype(dt)
            prec = None
        if packed:
            from wt_pse_tpu.ops.packed import fold1x1, fold3x3

            kernel, bias = (fold3x3 if k == 3 else fold1x1)(kernel, bias)
        pad = k // 2
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec)
        return y + bias


def conv3x3(features: int, name: str | None = None, dtype=None) -> RefConv:
    """3x3 same-padding conv with bias (reference convs are all bias=True)."""
    return RefConv(features, ksize=3, name=name, dtype=dtype)


def conv1x1(features: int, name: str | None = None, dtype=None) -> RefConv:
    return RefConv(features, ksize=1, name=name, dtype=dtype)


def max_pool_2x2(x: jax.Array) -> jax.Array:
    """torch nn.MaxPool2d(kernel_size=2) parity (stride 2, floor mode)."""
    return nn.max_pool(x, (2, 2), strides=(2, 2))


# ---------------------------------------------------------------------------
# Bilinear resize with torch parity
# ---------------------------------------------------------------------------


def _linear_resize_matrix(in_size: int, out_size: int) -> jnp.ndarray:
    """Row-stochastic (out_size, in_size) matrix for torch align_corners=False
    bilinear interpolation along one axis (half-pixel centers, edge clamp)."""
    out_idx = jnp.arange(out_size, dtype=jnp.float32)
    src = (out_idx + 0.5) * (in_size / out_size) - 0.5
    src = jnp.clip(src, 0.0, in_size - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    w_hi = src - lo.astype(jnp.float32)
    w_lo = 1.0 - w_hi
    m = jnp.zeros((out_size, in_size), jnp.float32)
    m = m.at[jnp.arange(out_size), lo].add(w_lo)
    m = m.at[jnp.arange(out_size), hi].add(w_hi)
    return m


def resize_bilinear(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize of NHWC ``x`` to ``out_hw`` matching torch
    ``F.interpolate(mode='bilinear', align_corners=False)`` exactly.

    Implemented as two dense matmuls (H then W) so XLA schedules them on the MXU —
    faster and more reproducible than gather-based resizing on TPU.
    """
    n, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    mh = _linear_resize_matrix(h, oh)  # (oh, h)
    mw = _linear_resize_matrix(w, ow)  # (ow, w)
    def _pow2_factor(out_n, in_n):
        f = out_n // in_n
        return out_n % in_n == 0 and f & (f - 1) == 0

    if x.dtype == jnp.bfloat16 and _pow2_factor(oh, h) and _pow2_factor(ow, w):
        # Power-of-two upscales have dyadic interpolation weights (0.25/0.75 for 2x)
        # that are exact in bf16, and bf16 products accumulate exactly in the
        # f32 MXU accumulator; the only deviation from the f32-HIGHEST path is
        # one extra bf16 round between the two axis passes (<=1 ulp on
        # interpolated pixels — below the bf16 training mode's own noise
        # floor, since the consuming conv casts to bf16 anyway). Cuts the
        # 6-pass HIGHEST contraction to one MXU pass (wall-clock effect is
        # within this device's measurement noise; kept because it is strictly
        # less work for the same result).
        y = jnp.einsum("oh,nhwc->nowc", mh.astype(jnp.bfloat16), x,
                       preferred_element_type=jnp.float32)
        y = jnp.einsum("pw,nowc->nopc", mw.astype(jnp.bfloat16),
                       y.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return y.astype(x.dtype)
    xf = x.astype(jnp.float32)
    # contract H: (oh,h) x (n,h,w,c) -> (n,oh,w,c)
    y = jnp.einsum("oh,nhwc->nowc", mh, xf, precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("pw,nowc->nopc", mw, y, precision=jax.lax.Precision.HIGHEST)
    return y.astype(x.dtype)


def upsample2x_bilinear(x: jax.Array) -> jax.Array:
    """torch nn.Upsample(scale_factor=2, mode='bilinear', align_corners=False)."""
    n, h, w, c = x.shape
    return resize_bilinear(x, (2 * h, 2 * w))


def resize_nearest(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Nearest-neighbor resize (PIL Image.NEAREST-style) for masks."""
    return jax.image.resize(x, (x.shape[0], *out_hw, x.shape[-1]), method="nearest")


# ---------------------------------------------------------------------------
# Reference building blocks
# ---------------------------------------------------------------------------


class ConvD(nn.Module):
    """Encoder block: [maxpool if not first] -> conv/bn -> conv/bn/act -> conv/bn/act.

    Behavioral spec: ``/root/reference/algorithms.py:877-917`` (note: *no* activation
    after bn1 — conv1's output feeds conv2 un-activated).
    """

    planes: int
    first: bool = False
    bn_axis_name: str | None = None
    dtype: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool, packed: bool = False,
                 packed_input: bool = False, repack_input: bool = False) -> jax.Array:
        """``packed``: run the whole block in space-to-depth layout (first
        blocks at the top level). ``packed_input``: input is packed but the
        block starts with the 2x2 maxpool, which unpacks it for free (phase-max
        == pool, ops/packed.py) — the rest runs at half resolution unpacked.
        ``repack_input`` (with ``packed_input``): after the phase-max the
        pooled map is re-packed and the block's convs/BNs run folded one level
        down (``s2d_levels >= 2``); the output stays packed."""
        if not self.first:
            if packed_input:
                from wt_pse_tpu.ops.packed import pack, phase_max_unpool

                x = phase_max_unpool(x)
                if repack_input:
                    x = pack(x)
                    packed = True
            else:
                x = max_pool_2x2(x)
        x = conv3x3(self.planes, name="conv1", dtype=self.dtype)(x, packed)
        x = BatchNorm(self.planes, axis_name=self.bn_axis_name, name="bn1")(x, train, packed)
        y = conv3x3(self.planes, name="conv2", dtype=self.dtype)(x, packed)
        y = BatchNorm(self.planes, axis_name=self.bn_axis_name, name="bn2")(y, train, packed)
        y = nn.relu(y)
        z = conv3x3(self.planes, name="conv3", dtype=self.dtype)(y, packed)
        z = BatchNorm(self.planes, axis_name=self.bn_axis_name, name="bn3")(z, train, packed)
        return nn.relu(z)


class ConvU(nn.Module):
    """Decoder block: [conv/bn/act if not first] -> up2x -> 1x1 conv/bn/act ->
    concat skip -> conv/bn/act.

    Behavioral spec: ``/root/reference/algorithms.py:920-962``. The channel ledger:
    input 2p (p if first), conv2 maps p -> p//2 after upsampling, concat with the
    p//2-channel skip gives p... (reference: concat prev (p/2? no: prev has p//2*2)
    — concretely ``up1 = ConvU(16n, first=True)``: x5(16n) -> up -> conv2 -> 8n,
    cat x4(8n) -> 16n -> conv3 16n.
    """

    planes: int
    first: bool = False
    bn_axis_name: str | None = None
    dtype: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, prev: jax.Array, train: bool,
                 packed_out: bool = False, packed_input: bool = False) -> jax.Array:
        """``packed_out``: ``x`` arrives unpacked at half resolution, the 2x
        upsample emits a packed tensor directly (ops/packed.py), ``prev`` is
        the packed skip, and everything above the upsample runs in
        space-to-depth layout. ``packed_input`` (``s2d_levels >= 2``): ``x``
        arrives packed one level further down — conv1/bn1 run folded, then the
        map unpacks into the upsample (which re-packs at the output level when
        ``packed_out``)."""
        p = self.planes
        if not self.first:
            x = conv3x3(p, name="conv1", dtype=self.dtype)(x, packed_input)
            x = BatchNorm(p, axis_name=self.bn_axis_name, name="bn1")(x, train, packed_input)
            x = nn.relu(x)
        if packed_input:
            from wt_pse_tpu.ops.packed import unpack

            x = unpack(x)
        if packed_out:
            from wt_pse_tpu.ops.packed import upsample2x_packed

            y = upsample2x_packed(x)
        else:
            y = upsample2x_bilinear(x)
        y = conv1x1(p // 2, name="conv2", dtype=self.dtype)(y, packed_out)
        y = BatchNorm(p // 2, axis_name=self.bn_axis_name, name="bn2")(y, train, packed_out)
        y = nn.relu(y)
        y = jnp.concatenate([prev.astype(y.dtype), y], axis=-1)
        y = conv3x3(p, name="conv3", dtype=self.dtype)(y, packed_out)
        y = BatchNorm(p, axis_name=self.bn_axis_name, name="bn3")(y, train, packed_out)
        return nn.relu(y)


class DoubleConv(nn.Module):
    """(conv3x3 -> BN -> ReLU) x 2 — ``/root/reference/algorithms.py:398-413``."""

    features: int
    bn_axis_name: str | None = None
    dtype: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool, packed: bool = False) -> jax.Array:
        x = conv3x3(self.features, name="conv1", dtype=self.dtype)(x, packed)
        x = BatchNorm(self.features, axis_name=self.bn_axis_name, name="bn1")(x, train, packed)
        x = nn.relu(x)
        x = conv3x3(self.features, name="conv2", dtype=self.dtype)(x, packed)
        x = BatchNorm(self.features, axis_name=self.bn_axis_name, name="bn2")(x, train, packed)
        return nn.relu(x)


class DoubleConvWT(nn.Module):
    """conv3x3 -> ReLU -> conv3x3, *no* normalization — the whitening front-end block
    (``/root/reference/algorithms.py:416-428``). Output is pre-activation so the
    covariance loss sees the raw feature response.
    """

    features: int
    dtype: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, packed: bool = False) -> jax.Array:
        x = conv3x3(self.features, name="conv1", dtype=self.dtype)(x, packed)
        x = nn.relu(x)
        return conv3x3(self.features, name="conv2", dtype=self.dtype)(x, packed)


class ConvStack1x1(nn.Module):
    """A stack of 1x1 convs with ReLU between (not after) — the ``mu`` /
    ``mu_prior`` / ``logvar_prior`` heads (``/root/reference/algorithms.py:1199-1201,
    1006-1012``). Sub-convs are named c0, c1, ... for checkpoint mapping.
    """

    features: Sequence[int]
    dtype: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, packed: bool = False) -> jax.Array:
        for i, f in enumerate(self.features):
            if i > 0:
                x = nn.relu(x)
            x = conv1x1(f, name=f"c{i}", dtype=self.dtype)(x, packed)
        return x


class AttentionLayer(nn.Module):
    """1x1 conv + sigmoid gate — ``/root/reference/algorithms.py:1120-1129``.
    Returns (sigmoid(logits), logits). ``dtype`` follows the owning module's
    compute_dtype so bf16 mode applies to the gate like every other head."""

    features: int = 1
    dtype: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, packed: bool = False) -> tuple[jax.Array, jax.Array]:
        logits = conv1x1(self.features, name="layer1", dtype=self.dtype)(x, packed)
        return jax.nn.sigmoid(logits), logits


class InstanceWhitening(nn.Module):
    """Parameter-free instance standardization (torch ``nn.InstanceNorm2d(dim,
    affine=False)`` parity) — the reference defines this module inside DeepWT but
    comments it out of the datapath (``/root/reference/algorithms.py:965-975,
    1101-1108``). Provided for pipelines that re-enable it.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon)
