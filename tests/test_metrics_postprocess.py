"""Metrics (Dice/ASD/HD95) and post-processing vs independent oracles."""

import numpy as np
import pytest
import scipy.ndimage as ndi

from wt_pse_tpu.ops import metrics as M
from wt_pse_tpu.ops.postprocess import largest_component_fill_holes, postprocess_logits


def _blob(hw, cy, cx, r):
    yy, xx = np.mgrid[0:hw, 0:hw]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r)


def brute_surface_distances(a, b):
    """O(n^2) oracle with the same surface definition (erosion with the
    4-connectivity cross, medpy-style)."""
    struct = ndi.generate_binary_structure(2, 1)
    sa = a ^ ndi.binary_erosion(a, struct, iterations=1)
    sb = b ^ ndi.binary_erosion(b, struct, iterations=1)
    pa = np.argwhere(sa).astype(float)
    pb = np.argwhere(sb).astype(float)
    d = np.sqrt(((pa[:, None, :] - pb[None, :, :]) ** 2).sum(-1))
    return d.min(axis=1)


def test_dice_formula():
    a = _blob(64, 32, 32, 10)
    b = _blob(64, 32, 34, 10)
    inter = np.logical_and(a, b).sum()
    expected = (2 * inter + 1) / (1 + a.sum() + b.sum())
    np.testing.assert_allclose(M.dice_binary(a, b), expected)
    assert M.dice_binary(a, a) == pytest.approx(1.0, abs=1e-2)


def test_surface_distances_match_bruteforce():
    a = _blob(48, 24, 24, 9)
    b = _blob(48, 22, 26, 11)
    got = np.sort(M.surface_distances(a, b))
    want = np.sort(brute_surface_distances(a, b))
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_asd_hd95_properties():
    a = _blob(64, 32, 32, 10)
    assert M.asd(a, a) == 0.0
    assert M.hd95(a, a) == 0.0
    b = np.roll(a, 3, axis=1)  # pure translation by 3 px
    assert 0 < M.asd(a, b) <= 3.0 + 1e-9
    assert M.hd95(a, b) <= 3.0 * np.sqrt(2) + 1e-9
    with pytest.raises(ValueError):
        M.asd(np.zeros((8, 8), bool), a[:8, :8])


def test_hd95_is_percentile_of_concatenated_distances():
    """medpy aggregates hd95 as percentile(hstack(d(a->b), d(b->a)), 95), NOT
    max of per-direction percentiles. Construct masks where the two differ: a
    large mostly-exact surface one way plus a few distant voxels the other —
    max-of-p95 reports the outlier distance, medpy's pooled percentile doesn't
    (regression: the pre-fix implementation returned the max)."""
    a = np.zeros((64, 64), bool)
    a[10:36, 10:36] = True  # 26x26 box: surface 100, all on b's surface
    b = a.copy()
    b[45:48, 45:48] = True  # + distant 3x3 speck: 8 px at ~14.9 from a —
    # >5% of d(b->a)'s 108 values but <5% of the 208-value pool
    d_ab = M.surface_distances(a, b)
    d_ba = M.surface_distances(b, a)
    pooled = np.percentile(np.hstack((d_ab, d_ba)), 95)
    per_dir_max = max(np.percentile(d_ab, 95), np.percentile(d_ba, 95))
    assert pooled == 0.0 and per_dir_max > 10.0  # the case discriminates hard
    np.testing.assert_allclose(M.hd95(a, b), pooled)


def test_dice_coeff_2label_single_label_duplicates_channel0():
    a = np.stack([_blob(32, 16, 16, 6), _blob(32, 16, 16, 10)])
    b = np.stack([_blob(32, 16, 18, 6), _blob(32, 16, 18, 10)])
    cup, disc = M.dice_coeff_2label(a, b, "OD")
    assert cup == disc == M.dice_binary(a[0], b[0])
    cup2, disc2 = M.dice_coeff_2label(a, b, None)
    assert cup2 == M.dice_binary(a[0], b[0])
    assert disc2 == M.dice_binary(a[1], b[1])


def test_largest_component_fill_holes():
    img = np.zeros((32, 32), np.uint8)
    img[4:14, 4:14] = 1          # big blob (100 px)
    img[8:10, 8:10] = 0          # with a hole
    img[20:24, 20:24] = 1        # small blob (16 px)
    img[15, 15] = 1              # 8-connectivity bridge candidate (isolated here)
    out = largest_component_fill_holes(img.copy())
    assert out[8, 8] == 1        # hole filled
    assert out[21, 21] == 0      # small component removed
    assert out[5, 5] == 1


def test_largest_component_8_connectivity():
    # two diagonal pixels touch corner-to-corner: 8-connectivity joins them
    img = np.zeros((8, 8), np.uint8)
    img[2, 2] = img[3, 3] = 1
    img[6, 6] = 1
    out = largest_component_fill_holes(img.copy())
    assert out[2, 2] == 1 and out[3, 3] == 1 and out[6, 6] == 0


def test_postprocess_logits_threshold_and_channels():
    logits = np.full((2, 16, 16), -10.0)
    blob = _blob(16, 8, 8, 4)
    logits[0][blob] = 10.0
    logits[0][0, 0] = 10.0  # spurious positive pixel far from the blob
    logits[1][blob] = 10.0
    out = postprocess_logits(logits, label="OD")
    assert out[0][8, 8] == 1 and out[0][0, 0] == 0  # LCC removed the speck
    # with label set, channel 1 is left as raw threshold
    assert out[1][8, 8] == 1
    out2 = postprocess_logits(logits, label=None)
    assert out2[1][8, 8] == 1


def test_evaluate_domain_label_none_two_class_mode():
    """The vestigial 2-class (label=None) eval path, reference-validate
    semantics (Trainer.py:215-239): 2-channel predictions in [cup, disc]
    order; disc Dice from the OD model's channel 1, cup Dice from the OC
    model's channel 0, HD/ASD from channel 0 of each (the reference's own
    channel quirk). A perfect 2-channel prediction must score 1.0 Dice."""
    import jax.numpy as jnp

    from wt_pse_tpu.train.eval import evaluate_domain

    hw = 64
    yy, xx = np.mgrid[0:hw, 0:hw]
    disc = (((yy - 32) ** 2 + (xx - 32) ** 2) < 20 ** 2).astype(np.float32)
    cup = (((yy - 32) ** 2 + (xx - 32) ** 2) < 10 ** 2).astype(np.float32)

    logits2 = np.stack([cup, disc], axis=-1) * 20.0 - 10.0  # (H, W, 2)

    def predict_fn(v0, v1, v2, v3, img):
        out = np.broadcast_to(logits2, img.shape[:3] + (2,))
        return jnp.asarray(out), jnp.asarray(out)

    images = np.zeros((2, hw, hw, 3), np.uint8)
    res = evaluate_domain(predict_fn, ((),) * 4, images,
                          od_masks=[disc, disc], oc_masks=[cup, cup],
                          label=None, batch_size=2)
    assert res["disc_dice"] > 0.999 and res["cup_dice"] > 0.999
    assert res["objective"] == (res["cup_dice"] + res["disc_dice"]) / 2
    # HD/ASD compare channel 0 (cup) of each model per the reference quirk:
    # perfect prediction -> 0 distance
    assert res["cup_hd"] < 1e-6 and res["disc_hd"] < 1e-6


def test_score_one_empty_gt_ordering():
    """Reference parity for empty masks (Trainer.py:219-238): the empty-
    PREDICTION sentinel is checked first, so an empty GT only matters (and
    raises, like the reference's medpy crash) when the prediction is
    non-empty."""
    from wt_pse_tpu.train.eval import _score_one

    hw = 24
    empty = np.zeros((hw, hw), np.float32)
    blob = np.zeros((hw, hw), np.float32)
    blob[8:16, 8:16] = 1.0
    neg_logits = np.full((1, hw, hw), -10.0, np.float32)   # empty prediction
    pos_logits = np.full((1, hw, hw), -10.0, np.float32)
    pos_logits[0, 8:16, 8:16] = 10.0                       # blob prediction

    # empty GT + empty pred: the 100.0 sentinel wins, no raise
    res = _score_one(neg_logits, neg_logits, empty, empty, "OD")
    assert res["disc_hd"] == 100.0 and res["cup_asd"] == 100.0

    # empty GT + non-empty pred: the metric is undefined -> clear raise
    with pytest.raises(ValueError, match="empty ground-truth"):
        _score_one(pos_logits, neg_logits, empty, blob, "OD")
    with pytest.raises(ValueError, match="OC"):
        _score_one(neg_logits, pos_logits, blob, empty, "OD")

    # non-empty GT + non-empty pred: normal scoring
    res = _score_one(pos_logits, pos_logits, blob, blob, "OD")
    assert res["disc_dice"] > 0.9 and res["disc_hd"] == 0.0
