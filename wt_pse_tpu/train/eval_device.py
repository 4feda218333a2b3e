"""Fully device-resident fast validation.

Training-time model selection doesn't need native-resolution metrics — it needs a
consistent, cheap objective every few epochs. This module keeps the entire
validation on device at the network resolution (256²): two-stage predict ->
jittable LCC + hole fill (``ops/postprocess_device``) -> Dice / ASD / HD95
computed with the exact separable EDT (``ops/losses.distance_transform``) and
medpy surface semantics (4-connectivity border = mask ^ erosion).

The host path (``train/eval.py``: native-resolution upsample + C++/scipy
post-processing) remains the reference-parity evaluator for reported numbers;
this one is the sync-free option (``Trainer(fast_validation=True)``).

Empty predictions score HD=ASD=100 (Trainer.py:221-233 parity).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from wt_pse_tpu.ops.losses import distance_transform
from wt_pse_tpu.ops.postprocess_device import postprocess_logits_device


def _erode4(m: jax.Array) -> jax.Array:
    """4-connectivity erosion with zero border (scipy border_value=0); (B,H,W)."""
    pad = jnp.pad(m, ((0, 0), (1, 1), (1, 1)))
    return (m & pad[:, :-2, 1:-1] & pad[:, 2:, 1:-1]
            & pad[:, 1:-1, :-2] & pad[:, 1:-1, 2:])


def _surface(m: jax.Array) -> jax.Array:
    return m & ~_erode4(m)


def _surface_stats(pred: jax.Array, gt: jax.Array):
    """(asd, hd95) per batch item, medpy semantics, empty-pred -> 100.

    HD95 is the 95th percentile of the *concatenated* bidirectional distance
    set (medpy: ``np.percentile(np.hstack((d(p→g), d(g→p))), 95)``) with
    numpy's default linear interpolation between order statistics — NOT the
    max of per-direction percentiles (those diverge when the two surfaces
    differ in size/distribution), and not a ceil-index approximation."""
    sp = _surface(pred)
    sg = _surface(gt)
    dt_g = distance_transform(sg)  # distance to gt surface
    dt_p = distance_transform(sp)

    def masked_flat(dt, surf):
        # distances at surface voxels, non-surface pinned to +inf so a sort
        # packs the n valid entries first
        return jnp.where(surf, dt, jnp.inf).reshape(dt.shape[0], -1)

    n_p = jnp.sum(sp, axis=(1, 2))
    n_g = jnp.sum(sg, axis=(1, 2))
    asd_pg = (jnp.sum(jnp.where(sp, dt_g, 0.0), axis=(1, 2))
              / jnp.maximum(n_p, 1))

    both = jnp.concatenate([masked_flat(dt_g, sp), masked_flat(dt_p, sg)],
                           axis=1)
    srt = jnp.sort(both, axis=1)
    n = n_p + n_g
    # numpy-linear percentile: rank r = 0.95*(n-1), value = lerp(srt[⌊r⌋], srt[⌈r⌉])
    rank = 0.95 * jnp.maximum(n - 1, 0).astype(jnp.float32)
    lo = jnp.floor(rank).astype(jnp.int32)
    hi = jnp.ceil(rank).astype(jnp.int32)
    v_lo = jnp.take_along_axis(srt, lo[:, None], axis=1)[:, 0]
    v_hi = jnp.take_along_axis(srt, hi[:, None], axis=1)[:, 0]
    frac = rank - lo.astype(jnp.float32)
    # guard the hi gather against all-inf rows (n == 0): value is replaced by
    # the empty-mask constant below anyway
    hd95 = jnp.where(jnp.isfinite(v_hi), v_lo + frac * (v_hi - v_lo), v_lo)

    # empty PRED -> 100 is reference parity (Trainer.py:221-233). An empty GT
    # would make every dt_g entry +inf (distance_transform of an empty mask)
    # and silently poison the domain means with inf — the host path raises and
    # medpy crashes there; this sync-free path applies the same 100.0 sentinel
    # instead so one degenerate resized label can't wipe out model selection.
    empty = ((jnp.sum(pred, axis=(1, 2)) < 1)
             | (jnp.sum(gt, axis=(1, 2)) < 1))
    return (jnp.where(empty, 100.0, asd_pg), jnp.where(empty, 100.0, hd95))


@jax.jit
def device_metrics(od_logits: jax.Array, oc_logits: jax.Array,
                   od_gt: jax.Array, oc_gt: jax.Array) -> dict:
    """(B,H,W) logits + binary gts -> per-item metric arrays, all on device."""
    pred_od = postprocess_logits_device(od_logits).astype(bool)
    pred_oc = postprocess_logits_device(oc_logits).astype(bool)
    gt_od = od_gt > 0.5
    gt_oc = oc_gt > 0.5

    def dice(p, g):
        inter = jnp.sum(p & g, axis=(1, 2)).astype(jnp.float32)
        return (2 * inter + 1) / (1 + jnp.sum(p, (1, 2)) + jnp.sum(g, (1, 2)))

    asd_od, hd_od = _surface_stats(pred_od, gt_od)
    asd_oc, hd_oc = _surface_stats(pred_oc, gt_oc)
    return {
        "disc_dice": dice(pred_od, gt_od),
        "cup_dice": dice(pred_oc, gt_oc),
        "disc_asd": asd_od,
        "cup_asd": asd_oc,
        "disc_hd": hd_od,
        "cup_hd": hd_oc,
    }


def evaluate_domain_device(predict_fn, variables, images_u8: np.ndarray,
                           od_gt_256: np.ndarray, oc_gt_256: np.ndarray,
                           label: str | None = "OD",
                           batch_size: int = 8) -> dict:
    """Sync-free validation at network resolution. ``od_gt_256``/``oc_gt_256``:
    (N,256,256) binary masks (encode the 256-resized labels once at load)."""
    n = len(images_u8)
    acc = {}
    weight = 0
    for start in range(0, n, batch_size):
        chunk = slice(start, min(start + batch_size, n))
        img = np.asarray(images_u8[chunk], np.float32)
        k = img.shape[0]
        if k < batch_size:  # fixed compiled shape
            img = np.concatenate(
                [img, np.zeros((batch_size - k,) + img.shape[1:], img.dtype)])
        # host numpy in, NOT jnp.asarray: under multi-host DP the predict/
        # metrics programs run on globally-replicated arrays, and a
        # locally-placed device array mixed into that jit is rejected —
        # the host path documents the same constraint (eval.py); jit
        # transfers numpy per the program's sharding on every process
        imgs = img / 127.5 - 1.0
        out_od, out_oc = predict_fn(*variables, imgs)
        hw = od_gt_256.shape[-2:]
        god = np.zeros((batch_size, *hw), np.float32)
        goc = np.zeros((batch_size, *hw), np.float32)
        god[:k] = od_gt_256[chunk]
        goc[:k] = oc_gt_256[chunk]
        m = device_metrics(out_od[..., 0], out_oc[..., 0], god, goc)
        for key, v in m.items():  # drop padded rows before aggregating
            acc[key] = acc.get(key, 0.0) + float(np.asarray(v)[:k].sum())
        weight += k
    out = {key: v / weight for key, v in acc.items()}
    from wt_pse_tpu.train.eval import objective_from_means

    out["objective"] = objective_from_means(out, label)
    return out
