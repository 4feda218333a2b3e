"""Auxiliary segmentation losses.

Reference surface: ``/root/reference/metrics.py`` — ``DiceLoss`` (161-174),
``Balanced_DiceLoss`` (176-185), ``WatershedCrossEntropy`` + its hand-rolled
``distance_transform`` (6-45), ``cross_entropy2d`` (47-65). These are part of the
reference's component inventory (SURVEY.md §2.1 #15) though the active WT-PSE
pipeline only uses BCE variants; they are provided here as jittable jnp ops so
user code built on the reference keeps working.

TPU notes: the reference's Euclidean distance transform is an O(N·w) python scan
per row/column; here it is a vectorized two-pass (rows then columns) separable
squared-distance scan expressed with ``lax.scan`` over lines, batched — exact same
output, compiles to one fused program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def dice_loss_flat(probs: jax.Array, target: jax.Array, smooth: float = 1.0):
    """DiceLoss parity (metrics.py:161-174): inputs already in [0,1]."""
    i = probs.reshape(-1)
    t = target.reshape(-1)
    inter = jnp.sum(i * t)
    return 1.0 - (2.0 * inter + smooth) / (jnp.sum(i) + jnp.sum(t) + smooth)


def balanced_dice_loss(logits: jax.Array, target: jax.Array):
    """Balanced_DiceLoss parity (metrics.py:176-185): NHWC with 2 channels
    (cup, disc); sigmoid applied internally."""
    p = jax.nn.sigmoid(logits)
    return 0.5 * (dice_loss_flat(p[..., 0], target[..., 0])
                  + dice_loss_flat(p[..., 1], target[..., 1]))


def _minplus_parabola(f_sq: jax.Array) -> jax.Array:
    """Exact 1-D squared-distance transform along the last axis:
    ``out[i] = min_j (f[j] + (i-j)^2)`` — the separable min-plus convolution with
    a parabola. Squared EDT separates exactly across axes (Felzenszwalb-Huttenlocher),
    so two applications give the true 2-D EDT^2. Expressed as a broadcasted min
    reduction; rows are mapped in chunks to bound memory."""
    n = f_sq.shape[-1]
    idx = jnp.arange(n, dtype=jnp.float32)
    parab = jnp.square(idx[:, None] - idx[None, :])  # (i, j)

    flat = f_sq.reshape(-1, n)

    def one_chunk(chunk):  # (rows, n) -> (rows, n)
        return jnp.min(chunk[:, None, :] + parab[None, :, :], axis=-1)

    chunk = 512
    pad = (-flat.shape[0]) % chunk
    padded = jnp.pad(flat, ((0, pad), (0, 0)), constant_values=jnp.inf)
    out = jax.lax.map(one_chunk, padded.reshape(-1, chunk, n))
    return out.reshape(-1, n)[: flat.shape[0]].reshape(f_sq.shape)


def distance_transform(bitmap: jax.Array) -> jax.Array:
    """Euclidean distance to the nearest True pixel, per batch item (B, H, W).

    Semantics of the reference's hand-rolled scan (metrics.py:14-24: 0 inside the
    mask, growing outside) — computed here as the *exact* EDT (the reference's
    directional ``_upscan`` relaxation is an approximation of it; exactness is
    cross-checked against scipy in tests)."""
    big = jnp.asarray(1e12, jnp.float32)  # finite stand-in for inf (min-plus safe)
    f = jnp.where(bitmap > 0, 0.0, big)
    f = _minplus_parabola(f)                       # along W
    f = _minplus_parabola(jnp.swapaxes(f, -1, -2))  # along H
    f = jnp.swapaxes(f, -1, -2)
    return jnp.sqrt(jnp.where(f >= big, jnp.inf, f))


def watershed_cross_entropy(logits: jax.Array, target: jax.Array) -> jax.Array:
    """WatershedCrossEntropy parity (metrics.py:26-45), NHWC with channels
    [disc, cup]: distance-transform-weighted BCE-with-logits.

    The reference's weight ``map * (1 - DT/max(DT)) + 1`` (metrics.py:36-37)
    reduces algebraically to ``map + 1``: DT is exactly 0 on every ``map==1``
    pixel (distance to the nearest True pixel), and the ``1 - DT/max`` factor
    is multiplied by ``map`` — so it is only ever evaluated where it equals 1.
    We compute ``target + 1`` directly: bit-identical wherever the reference
    formula is finite (gated by tests/test_losses.py against the explicit
    torch+scipy formula), skips two full EDTs, and stays finite on the
    degenerate masks where the reference NaNs out (empty map -> max(DT)=inf;
    all-true map -> 0/0)."""
    weights = target + 1.0
    ce = optax.sigmoid_binary_cross_entropy(logits, target)
    return jnp.mean(weights[..., 0] * ce[..., 0] + weights[..., 1] * ce[..., 1])


def cross_entropy2d(logits: jax.Array, target: jax.Array, weight=None,
                    size_average: bool = False) -> jax.Array:
    """cross_entropy2d parity (metrics.py:47-65): softmax CE over the channel dim,
    ignoring target < 0; NHWC logits, (N,H,W) integer target."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    valid = target >= 0
    tgt = jnp.maximum(target, 0)
    picked = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    if weight is not None:
        w = jnp.asarray(weight)[tgt]
        picked = picked * w
        denom = jnp.sum(w * valid)
    else:
        denom = jnp.sum(valid)
    loss = -jnp.sum(picked * valid) / jnp.maximum(denom, 1)
    if size_average:
        loss = loss / jnp.maximum(jnp.sum(valid), 1)
    return loss
