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


def test_find_contour_points_single_pixel():
    """One lit pixel -> exactly its 4 half-pixel edge midpoints (the classic
    marching-squares diamond skimage.find_contours returns)."""
    from wt_pse_tpu.utils.visualization import find_contour_points

    m = np.zeros((9, 9))
    m[4, 4] = 1.0
    pts = find_contour_points(m)
    got = {tuple(p) for p in pts}
    assert got == {(4.0, 3.5), (4.0, 4.5), (3.5, 4.0), (4.5, 4.0)}


def test_find_contour_points_rectangle_count_and_geometry():
    """h x w rectangle of ones: every vertex sits on a half-pixel edge
    crossing of the rectangle boundary — 2*(h+w) of them, each exactly 0.5
    outside the lit region along one axis."""
    from wt_pse_tpu.utils.visualization import find_contour_points

    m = np.zeros((20, 20))
    m[5:12, 3:14] = 1.0  # 7 rows x 11 cols
    pts = find_contour_points(m)
    assert len(pts) == 2 * (7 + 11)
    for r, c in pts:
        on_row_edge = r in (4.5, 11.5) and 3 <= c <= 13 and c == int(c)
        on_col_edge = c in (2.5, 13.5) and 5 <= r <= 11 and r == int(r)
        assert on_row_edge or on_col_edge, (r, c)


def test_find_contour_points_subpixel_interpolation():
    """Non-binary field: the crossing interpolates linearly along the edge
    (skimage vertex placement), not at the midpoint."""
    from wt_pse_tpu.utils.visualization import find_contour_points

    m = np.zeros((3, 3))
    m[1, 1] = 0.8  # edge 0 -> 0.8 crosses 0.5 at 0.5/0.8 = 0.625 from the 0 side
    pts = {tuple(p) for p in find_contour_points(m)}
    # crossing sits 0.625 of the way from the zero sample toward (1,1), i.e.
    # 0.375 away from the peak on each of its four edges
    assert (1.0, 0.625) in pts and (1.0, 1.375) in pts
    assert (0.625, 1.0) in pts and (1.375, 1.0) in pts


def test_find_contour_points_circle_subpixel_accuracy():
    """Contour vertices of a rasterized disc lie within ~one pixel of the true
    circle — the sub-pixel property the boundary-pixel method lacked."""
    from wt_pse_tpu.utils.visualization import find_contour_points

    yy, xx = np.mgrid[0:64, 0:64]
    r = 20.3
    m = (((yy - 32) ** 2 + (xx - 32) ** 2) < r ** 2).astype(float)
    pts = find_contour_points(m)
    assert len(pts) > 100
    d = np.sqrt((pts[:, 0] - 32) ** 2 + (pts[:, 1] - 32) ** 2)
    assert np.max(np.abs(d - r)) < 0.75  # half-pixel quantization + 0.5 offset


def test_overlay_contours_colors():
    """Reference drawing semantics (utils.py:385-450): sub-pixel contour
    vertices painted with the 7-tap truncation stencil; disc green, cup blue,
    GT red last (wins overlaps)."""
    img = np.full((16, 16, 3), 128, np.uint8)
    pred = np.zeros((2, 16, 16))
    gt = np.zeros((2, 16, 16))
    pred[1, 4:12, 4:12] = 1  # disc -> green
    pred[0, 6:10, 6:10] = 1  # cup -> blue
    gt[1, 3:13, 3:13] = 1    # gt -> red, painted last (wins overlaps)
    out = overlay_contours(img, pred, gt)
    # disc top-left vertex (3.5, 4) paints rows {2,3,4} x cols {3,4,5};
    # (4,4) is outside both the cup stencil (rows 4-6 only at cols >= 4 come
    # from vertex (5.5, c>=5.5)) and the gt stencil (rows {1,2,3}/{11,12,13},
    # cols {1,2,3}/{11,12,13})
    assert tuple(out[4, 4]) == (0, 255, 0)
    # cup vertex (5.5, 6) paints (6, 6); disc/gt stencils don't reach it
    assert tuple(out[6, 6]) == (0, 0, 255)
    # gt vertex (2.5, 3) paints (3, 3); disc painted it first, red wins
    assert tuple(out[3, 3]) == (255, 0, 0)
    assert tuple(out[0, 0]) == (128, 128, 128)  # outside everything


def test_overlay_contours_matches_reference_painter():
    """Full-frame golden vs the ACTUAL reference painting loop
    (utils.py:385-450) run on the same contours: replicate its 7-tap indexing
    verbatim on the reference side using OUR find_contour_points output (the
    skimage vertex set equivalence is pinned by the geometry tests above), and
    require the whole overlay to be byte-identical."""
    from wt_pse_tpu.ops.postprocess import largest_component_fill_holes
    from wt_pse_tpu.utils.visualization import find_contour_points

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (32, 32, 3), np.uint8)
    pred = np.zeros((2, 32, 32))
    gt = np.zeros((2, 32, 32))
    yy, xx = np.mgrid[0:32, 0:32]
    pred[1] = ((yy - 16) ** 2 + (xx - 15) ** 2 < 100).astype(float)
    pred[0] = ((yy - 16) ** 2 + (xx - 15) ** 2 < 30).astype(float)
    gt[1] = ((yy - 15) ** 2 + (xx - 16) ** 2 < 110).astype(float)
    gt[0] = ((yy - 15) ** 2 + (xx - 16) ** 2 < 25).astype(float)

    ours = overlay_contours(img, pred, gt)

    # reference loop, transcribed from utils.py:404-450 (7 taps, int trunc)
    def ref_paint(patch, contours, color):
        for contour in [contours]:
            if not len(contour):
                continue
            patch[(contour[:, 0]).astype(int), (contour[:, 1]).astype(int), :] = color
            patch[(contour[:, 0] + 1.0).astype(int), (contour[:, 1]).astype(int), :] = color
            patch[(contour[:, 0] + 1.0).astype(int), (contour[:, 1] + 1.0).astype(int), :] = color
            patch[(contour[:, 0]).astype(int), (contour[:, 1] + 1.0).astype(int), :] = color
            patch[(contour[:, 0] - 1.0).astype(int), (contour[:, 1]).astype(int), :] = color
            patch[(contour[:, 0] - 1.0).astype(int), (contour[:, 1] - 1.0).astype(int), :] = color
            patch[(contour[:, 0]).astype(int), (contour[:, 1] - 1.0).astype(int), :] = color

    want = img.copy()

    def bordered(m):
        m = np.asarray(m, np.float64).copy()
        m[:, 0] = m[:, -1] = 0.0
        m[0, :] = m[-1, :] = 0.0
        return m

    ref_paint(want, find_contour_points(bordered(pred[1])), [0, 255, 0])
    ref_paint(want, find_contour_points(bordered(pred[0])), [0, 0, 255])
    for ch in (0, 1):
        g = largest_component_fill_holes(gt[ch] > 0.5)
        ref_paint(want, find_contour_points(g.astype(np.float64)), [255, 0, 0])
    np.testing.assert_array_equal(ours, want)


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
