"""Tests for the lr formula golden values and utils/visualization.py + RunLogger
images.

Schedule golden values come from evaluating the reference formula
(/root/reference/Trainer.py:989-1004) by hand, at the reference call site's
own constants (Trainer.py:1017-1022).
"""

import numpy as np

from wt_pse_tpu.train.lr import reference_lr_kwargs, reference_lr_value
from wt_pse_tpu.utils.logging import RunLogger
from wt_pse_tpu.utils.visualization import (
    joint_val_image, mask_boundary, overlay_contours, save_per_img,
    save_val_img, untransform)


def test_reference_lr_formula_golden():
    base, max_epoch = 1e-3, 200
    kw = reference_lr_kwargs(max_epoch)
    # applied_after_epoch=False isolates the bare lr_update formula f(e)
    fn = lambda e: reference_lr_value(base, e, applied_after_epoch=False, **kw)
    # epoch 0: pure warmup factor
    assert np.isclose(fn(0), base * 0.001)
    # mid-warmup: alpha = e / (2*max_epoch)
    e = 50
    alpha = e / 400
    assert np.isclose(fn(e), base * (0.001 * (1 - alpha) + alpha))
    # step decay boundaries: gamma^bisect_right((100,150), e)
    a100 = 100 / 400
    assert np.isclose(fn(100), base * (0.001 * (1 - a100) + a100) * 0.5)
    a160 = 160 / 400
    assert np.isclose(fn(160), base * (0.001 * (1 - a160) + a160) * 0.25)
    # the after-the-epoch call site shifts everything one epoch late
    assert np.isclose(reference_lr_value(base, 101, **kw), fn(100))
    assert np.isclose(reference_lr_value(base, 0, **kw), base)


def test_untransform_roundtrip():
    u8 = np.random.RandomState(0).randint(0, 256, (8, 8, 3), np.uint8)
    back = untransform(u8 / 127.5 - 1.0)
    # uint8 truncation: float roundtrip may land one gray level below
    assert np.max(np.abs(back.astype(int) - u8.astype(int))) <= 1


def test_mask_boundary_ring():
    m = np.zeros((16, 16), bool)
    m[4:12, 4:12] = True
    b = mask_boundary(m, width=2)
    assert b[4, 4] and b[5, 5] and not b[7, 7]  # 2-px ring, hollow interior
    assert not b[3, 3]


def test_overlay_contours_colors():
    img = np.full((16, 16, 3), 128, np.uint8)
    pred = np.zeros((2, 16, 16))
    gt = np.zeros((2, 16, 16))
    pred[1, 4:12, 4:12] = 1  # disc -> green
    pred[0, 6:10, 6:10] = 1  # cup -> blue
    gt[1, 3:13, 3:13] = 1    # gt -> red, painted last (wins overlaps)
    out = overlay_contours(img, pred, gt)
    # boundaries are 2px thick; gt ring (rows/cols 3-4, 11-12) is painted last
    # and wins overlaps, so probe pred rings where gt doesn't cover
    assert tuple(out[5, 5]) == (0, 255, 0)    # disc ring row 5
    assert tuple(out[6, 6]) == (0, 0, 255)    # cup ring (4x4 -> all boundary)
    assert tuple(out[3, 3]) == (255, 0, 0)    # gt ring
    assert tuple(out[0, 0]) == (128, 128, 128)  # outside everything


def test_joint_val_image_panels():
    h = w = 8
    img = np.zeros((h, w, 3), np.float32)
    pred = np.zeros((2, h, w), np.float32)
    mask = np.zeros((2, h, w), np.float32)
    pred[0, 0, 0] = 1.0  # cup
    pred[1, 1, 1] = 1.0  # disc
    mask[0, 2, 2] = 1.0
    mask[1, 3, 3] = 1.0
    out = joint_val_image(img, pred, mask, ratio=0.5)
    assert out.shape == (h, 4 * w, 3)
    # panel 1: mask overlay paints cup in R, disc in G at 0.5 blend
    assert np.isclose(out[2, w + 2, 0], 0.5) and np.isclose(out[3, w + 3, 1], 0.5)
    # panel 2: cup pred grayscale blend; panel 3: disc pred
    assert np.allclose(out[0, 2 * w + 0], 0.5)
    assert np.allclose(out[1, 3 * w + 1], 0.5)
    # image panel passthrough
    assert np.allclose(out[:, :w], 0.0)


def test_save_val_img_and_per_img(tmp_path):
    h = w = 8
    m1 = np.random.RandomState(0).rand(h, 4 * w, 3).astype(np.float32)
    m2 = np.random.RandomState(1).rand(h, 4 * w, 3).astype(np.float32)
    p = save_val_img(str(tmp_path), 7, [m1, m2])
    from PIL import Image

    arr = np.asarray(Image.open(p))
    assert arr.shape == (2 * h, 4 * w, 3)

    img = np.zeros((16, 16, 3), np.uint8)
    pred = np.zeros((2, 16, 16))
    save_per_img(img, str(tmp_path), "case0", pred, pred)
    assert (tmp_path / "overlay" / "case0.bmp").exists()
    assert (tmp_path / "original_image" / "case0.bmp").exists()


def test_runlogger_image(tmp_path):
    lg = RunLogger(str(tmp_path))
    img = np.zeros((4, 4, 3), np.uint8)
    lg.image("val/montage", img, 3)
    assert (tmp_path / "images" / "val_montage_3.png").exists()
