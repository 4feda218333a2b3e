"""Two-stage evaluation: coarse OD -> ROI -> fine OC, batched on device; metrics on
host (LCC/fill-holes/surface distances are not tensor ops).

Reproduces ``Trainer.validate()`` (``/root/reference/Trainer.py:137-311``) and the
inference in ``test_visulization.py:201-230``:

  predictions   = main_od.predict(student_od, image)            # 256x256 logits
  od_pred       = sigmoid(predictions) > 0.75
  image_roi     = (image + 1) * od_pred - 1
  predictions_oc = main_oc.predict(student_oc, image_roi) * od_pred
  both -> bilinear upsample to the native label resolution -> postprocessing
  (sigmoid > 0.75 -> largest-CC -> fill holes) -> Dice / HD95 / ASD
  empty prediction -> HD = ASD = 100                            (Trainer.py:221-233)

TPU notes: images are grouped by native label resolution so each group jits once
with static shapes; the 256->native upsample runs on device via the same
matmul-based resize used in the nets.
"""

from __future__ import annotations

from collections import defaultdict
import functools

import numpy as np

import jax
import jax.numpy as jnp

from wt_pse_tpu.models.layers import resize_bilinear
from wt_pse_tpu.models.shape_prior import ShapeStudent
from wt_pse_tpu.models.wt_pse import WTPSE
from wt_pse_tpu.ops import metrics as M
from wt_pse_tpu.ops.postprocess import postprocess_logits


def make_predict_fn(main_od: WTPSE, stud_od: ShapeStudent, main_oc: WTPSE,
                    stud_oc: ShapeStudent, packed: bool = False):
    """Jitted (variables..., image) -> (od_logits, oc_logits) at 256x256.

    ``packed=True`` runs both stages in space-to-depth layout (ops/packed.py —
    exact same math, ~2x the rate; the packing depth follows the nets'
    ``cfg.s2d_levels``). Off by default: the unpacked path is the
    checkpoint-parity path."""
    shape_prior = main_od.cfg.shape_prior

    @jax.jit
    def predict(v_od, v_od_shape, v_oc, v_oc_shape, image):
        # checkpoint-parity path: this backend's default matmul/conv precision
        # is bf16-level even in f32; the 0.5% Dice/ASD budget needs true f32.
        # (context is active during tracing -> baked into the compiled program)
        with jax.default_matmul_precision("highest"):
            return _predict(v_od, v_od_shape, v_oc, v_oc_shape, image)

    def _predict(v_od, v_od_shape, v_oc, v_oc_shape, image):
        if packed:
            from wt_pse_tpu.ops.packed import pack, pbroadcast_mul, unpack

            image = pack(image)
        if shape_prior:
            z = stud_od.apply(v_od_shape, image, False, packed,
                              method=ShapeStudent.sample_from_image)
            out_od = main_od.apply(v_od, image, z, packed,
                                   method=WTPSE.predict_with_shape)
        else:
            out_od = main_od.apply(v_od, image, packed,
                                   method=WTPSE.predict_no_shape)
        od_pred = (jax.nn.sigmoid(out_od) > 0.75).astype(image.dtype)
        if packed:
            roi = pbroadcast_mul(image + 1.0, od_pred) - 1.0
        else:
            roi = (image + 1.0) * od_pred - 1.0
        if shape_prior:
            z2 = stud_oc.apply(v_oc_shape, roi, False, packed,
                               method=ShapeStudent.sample_from_image)
            out_oc = main_oc.apply(v_oc, roi, z2, packed,
                                   method=WTPSE.predict_with_shape)
        else:
            out_oc = main_oc.apply(v_oc, roi, packed,
                                   method=WTPSE.predict_no_shape)
        out_oc = out_oc * od_pred
        if packed:
            out_od, out_oc = unpack(out_od), unpack(out_oc)
        return out_od, out_oc

    return predict


def make_predict_fn_joint(main_od, main_oc, packed: bool = False):
    """Two-stage predict for the joint variant: each net uses its own prior
    (no student network; validate_joint_shape_reg path, Trainer.py:314-490).
    ``packed`` mirrors :func:`make_predict_fn`'s fast-validation option."""

    @jax.jit
    def predict(v_od, v_od_shape, v_oc, v_oc_shape, image):
        del v_od_shape, v_oc_shape  # joint nets carry their prior internally
        with jax.default_matmul_precision("highest"):  # parity path, see above
            if packed:
                from wt_pse_tpu.ops.packed import pack, pbroadcast_mul, unpack

                image = pack(image)
            out_od = main_od.apply(v_od, image, None, packed,
                                   method=type(main_od).predict)
            od_pred = (jax.nn.sigmoid(out_od) > 0.75).astype(image.dtype)
            if packed:
                roi = pbroadcast_mul(image + 1.0, od_pred) - 1.0
            else:
                roi = (image + 1.0) * od_pred - 1.0
            out_oc = main_oc.apply(v_oc, roi, None, packed,
                                   method=type(main_oc).predict)
            out_oc = out_oc * od_pred
            if packed:
                out_od, out_oc = unpack(out_od), unpack(out_oc)
            return out_od, out_oc

    return predict


def _resize_highest(x, hw):
    with jax.default_matmul_precision("highest"):  # matmul-based resize, parity path
        return resize_bilinear(x, hw)


_resize_logits = jax.jit(_resize_highest, static_argnums=(1,))


@functools.lru_cache(maxsize=32)
def _resize_matrix_f64(in_size: int, out_size: int) -> np.ndarray:
    """f64 resize matrix, cached: a validation domain re-resizes every chunk
    at the same native resolution — without the cache the O(native*256)
    scatter build runs 2x per chunk per epoch. Callers must not mutate."""
    return _linear_resize_matrix_np(in_size, out_size).astype(np.float64)


def _linear_resize_matrix_np(in_size: int, out_size: int) -> np.ndarray:
    """numpy mirror of models.layers._linear_resize_matrix (identical math)."""
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * (in_size / out_size) - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = (src - lo).astype(np.float32)
    w_lo = 1.0 - w_hi
    m = np.zeros((out_size, in_size), np.float32)
    np.add.at(m, (np.arange(out_size), lo), w_lo)
    np.add.at(m, (np.arange(out_size), hi), w_hi)
    return m


def _resize_host(x: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Host-side bilinear resize, same matmul formulation as resize_bilinear.

    Used for the 256->native upsample at eval: same weights, but accumulated in
    float64 (strictly *more* accurate than the device's f32-HIGHEST path — not
    bit-identical; differences sit far below the 0.75 decision threshold), with
    no per-resolution XLA compile (minutes each over a tunneled device) and a
    smaller device->host transfer (256-sq logits instead of native-size).
    """
    n, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    mh = _resize_matrix_f64(h, oh)
    mw = _resize_matrix_f64(w, ow)
    y = np.einsum("oh,nhwc->nowc", mh, x.astype(np.float64))
    return np.einsum("pw,nowc->nopc", mw, y).astype(np.float32)


def evaluate_domain(predict_fn, variables: tuple, images_u8: np.ndarray,
                    od_masks: list[np.ndarray], oc_masks: list[np.ndarray],
                    label: str | None = "OD", batch_size: int = 8,
                    resize: str = "host") -> dict[str, float]:
    """Evaluate one test domain.

    Args:
      predict_fn: from :func:`make_predict_fn`.
      variables: (v_od, v_od_shape, v_oc, v_oc_shape) variable dicts.
      images_u8: (N, 256, 256, 3) uint8 test images (already LANCZOS-resized).
      od_masks / oc_masks: per-image native-resolution binary masks (float 0/1).
      label: validation objective ('OD'/'OC'/None), Trainer.py:269-274.
      resize: 'host' (default — numpy matmul upsample, no per-resolution
        compile, smaller transfer) or 'device' (jitted MXU upsample; wins only
        when eval throughput matters more than compile latency).

    Returns means: cup_dice, disc_dice, cup_hd, disc_hd, cup_asd, disc_asd,
    and ``objective`` keyed by ``label``.
    """
    n = len(images_u8)
    sums = defaultdict(float)

    # group indices by native resolution -> static-shape device work per group
    groups: dict[tuple[int, int], list[int]] = defaultdict(list)
    for i in range(n):
        groups[od_masks[i].shape[-2:]].append(i)

    for native_hw, idxs in groups.items():
        for start in range(0, len(idxs), batch_size):
            chunk = idxs[start : start + batch_size]
            stacked = np.stack([images_u8[i] for i in chunk]).astype(np.float32)
            # pad to a fixed batch so every eval run hits one compiled shape
            # (remote-tunnel compiles are minutes; padding rows are discarded)
            pad = batch_size - len(chunk)
            if pad:
                stacked = np.concatenate(
                    [stacked, np.zeros((pad,) + stacked.shape[1:], stacked.dtype)])
            # host numpy in: jit device_puts it itself (and under multi-host
            # training a locally-placed jnp array would be rejected by the
            # global replicated program)
            img = stacked / 127.5 - 1.0
            out_od, out_oc = predict_fn(*variables, img)
            if resize == "host":
                # slice the zero-padded rows off BEFORE the host resize — the
                # padding exists only for the compiled predict shape
                od_native = _resize_host(np.asarray(out_od)[: len(chunk)], native_hw)
                oc_native = _resize_host(np.asarray(out_oc)[: len(chunk)], native_hw)
            else:
                od_native = np.asarray(_resize_logits(out_od, native_hw))[: len(chunk)]
                oc_native = np.asarray(_resize_logits(out_oc, native_hw))[: len(chunk)]
            for j, i in enumerate(chunk):
                # (H, W, C) -> (C, H, W): label set -> C=1; label=None -> the
                # 2-class models' both channels reach the scorer
                res = _score_one(np.moveaxis(od_native[j], -1, 0),
                                 np.moveaxis(oc_native[j], -1, 0),
                                 np.asarray(od_masks[i]).squeeze(),
                                 np.asarray(oc_masks[i]).squeeze(), label)
                for k, v in res.items():
                    sums[k] += v

    out = {k: v / n for k, v in sums.items()}
    out["objective"] = objective_from_means(out, label)
    return out


def objective_from_means(out: dict, label: str | None) -> float:
    """Model-selection objective from domain-mean metrics (Trainer.py:269-288):
    the trained label's dice, or the cup/disc mean for the 2-class mode.
    Shared by the host path and ``eval_device`` so the two validators can
    never silently diverge on WHICH metric selects the best model (their
    agreement is pinned by tests/test_eval_consistency.py)."""
    if label == "OD":
        return out["disc_dice"]
    if label == "OC":
        return out["cup_dice"]
    return (out["cup_dice"] + out["disc_dice"]) / 2


def _score_one(od_logits: np.ndarray, oc_logits: np.ndarray, od_gt: np.ndarray,
               oc_gt: np.ndarray, label: str | None) -> dict[str, float]:
    """Score one image. ``od_logits``/``oc_logits`` are (C, H, W).

    ``label`` set (the paper's per-label two-stage pipeline): C == 1, channel 0
    carries the stage's class (Trainer.py:215-218 with dice_coeff_2label's
    label-set branch). ``label=None`` (the vestigial 2-class mode — only the
    reference's *validation* machinery supports it; see Trainer docstring):
    C == 2 with reference channel order [cup, disc]; dice reads disc from the
    OD model's channel 1 and cup from the OC model's channel 0, while HD/ASD
    compare channel 0 of each model against the GT — the reference's own
    channel choice at Trainer.py:221-239, replicated including its quirk of
    measuring 'disc' HD/ASD on channel 0."""
    if label is None:
        pred_od = postprocess_logits(od_logits, label=None)
        pred_oc = postprocess_logits(oc_logits, label=None)
        # 2-channel GT in reference multilabel order [cup, disc]
        gt2 = np.stack([oc_gt, od_gt])
        _, disc_dice = M.dice_coeff_2label(pred_od, gt2, None)
        cup_dice, _ = M.dice_coeff_2label(pred_oc, gt2, None)
        pred_od, od_gt = pred_od[0], gt2[0]  # HD/ASD channel 0 (ref parity)
        pred_oc, oc_gt = pred_oc[0], gt2[0]
    else:
        pred_od = postprocess_logits(od_logits, label=label)[0]
        pred_oc = postprocess_logits(oc_logits, label=label)[0]
        _, disc_dice = M.dice_coeff_2label(pred_od[None], od_gt[None], label)
        cup_dice, _ = M.dice_coeff_2label(pred_oc[None], oc_gt[None], label)

    as_bool = lambda x: np.asarray(x, dtype=bool)

    def require_nonempty_gt(name, gt):
        # reference parity: the empty-PREDICTION sentinel is checked FIRST
        # (Trainer.py:219-233) — medpy only ever sees (and crashes on) an
        # empty ground-truth mask when the prediction is non-empty, so the
        # guard lives inside the else branches below. Raise with a clear
        # message instead of medpy's shape error; the fast_validation
        # (device) path applies the 100.0 sentinel instead — a documented
        # host/device divergence (train/eval_device.py:77-84). The mask
        # checked is the one the metric actually compares against (for
        # label=None both surfaces compare channel 0, the reference's own
        # channel quirk — see the docstring above).
        if np.asarray(gt).sum() < 1:
            raise ValueError(
                f"empty ground-truth mask in the {name} surface-distance "
                "comparison: the metric is undefined (the reference's medpy "
                "path crashes here too); fast_validation=True would report "
                "the 100.0 sentinel instead")

    if pred_oc.sum() < 1e-4:
        cup_hd = cup_asd = 100.0
    else:
        require_nonempty_gt("OC", oc_gt)
        cup_hd = M.hd95(as_bool(pred_oc), as_bool(oc_gt))
        cup_asd = M.asd(as_bool(pred_oc), as_bool(oc_gt))
    if pred_od.sum() < 1e-4:
        disc_hd = disc_asd = 100.0
    else:
        require_nonempty_gt("OD", od_gt)
        disc_hd = M.hd95(as_bool(pred_od), as_bool(od_gt))
        disc_asd = M.asd(as_bool(pred_od), as_bool(od_gt))
    return {"cup_dice": cup_dice, "disc_dice": disc_dice, "cup_hd": cup_hd,
            "disc_hd": disc_hd, "cup_asd": cup_asd, "disc_asd": disc_asd}
