"""Eval-time visualization: contour overlays and image grids.

Reproduces ``save_per_img`` (``/root/reference/utils.py:371-454``): extract
marching-squares iso-0.5 contours of the prediction/GT masks (the reference
uses skimage ``measure.find_contours``; :func:`find_contour_points` is a
from-scratch equivalent — identical sub-pixel vertex set), paint them over the
original image with the reference's exact 7-tap thickening stencil, and save
original + overlay image pairs.
"""

from __future__ import annotations

import os

import numpy as np
import scipy.ndimage as ndi


def mask_boundary(mask: np.ndarray, width: int = 2) -> np.ndarray:
    """Boundary pixels of a binary mask (mask minus its erosion), thickened.
    (Pixel-level helper kept for montages; the overlay path uses the sub-pixel
    :func:`find_contour_points`.)"""
    mask = np.asarray(mask) > 0.5
    er = ndi.binary_erosion(mask, iterations=width)
    return mask & ~er


def find_contour_points(arr: np.ndarray, level: float = 0.5) -> np.ndarray:
    """Sub-pixel iso-``level`` contour vertices of a 2-D array — the same
    point set ``skimage.measure.find_contours(arr, level)`` returns
    (``utils.py:404-405,433-434``), computed vectorized.

    Marching-squares polyline vertices all lie on grid-edge crossings: a pair
    of 4-adjacent samples with one side below and one side at-or-above the
    level contributes one vertex, linearly interpolated along the edge
    (skimage's vertex placement). The reference's drawing only *indexes* the
    vertices (no segment rasterization), so the unordered point set is the
    whole contract — polyline ordering/connectivity never reaches the output.

    Returns (N, 2) float64 ``(row, col)`` points; binary masks at level 0.5
    yield the classic half-pixel midpoints.
    """
    a = np.asarray(arr, np.float64)
    below = a < level
    pts = []
    # horizontal edges (between column-adjacent samples): row integral
    cross = below[:, :-1] != below[:, 1:]
    if cross.any():
        rr, cc = np.nonzero(cross)
        frac = (level - a[rr, cc]) / (a[rr, cc + 1] - a[rr, cc])
        pts.append(np.stack([rr.astype(np.float64), cc + frac], axis=1))
    # vertical edges (between row-adjacent samples): col integral
    cross = below[:-1, :] != below[1:, :]
    if cross.any():
        rr, cc = np.nonzero(cross)
        frac = (level - a[rr, cc]) / (a[rr + 1, cc] - a[rr, cc])
        pts.append(np.stack([rr + frac, cc.astype(np.float64)], axis=1))
    if not pts:
        return np.zeros((0, 2), np.float64)
    return np.concatenate(pts, axis=0)


# the reference's thickening stencil (utils.py:408-421): each contour vertex
# paints int-truncated (r,c) plus 6 neighbors — note the asymmetric 7-tap set
# (no (+1,-1) / (-1,+1) taps) and the int() truncation of e.g. r-1.0
_STENCIL = ((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0),
            (-1.0, 0.0), (-1.0, -1.0), (0.0, -1.0))


def _paint_points(out: np.ndarray, pts: np.ndarray, color) -> None:
    """Paint contour vertices with the reference stencil. Negative truncated
    indices wrap to the far edge — numpy fancy-indexing semantics the
    reference inherits (its prediction maps have zeroed borders so the wrap
    is unreachable there; GT masks touching the frame wrap identically here).
    Taps past the high edge are dropped instead of replicating the
    reference's IndexError (only reachable for GT touching the frame)."""
    if not len(pts):
        return
    h, w = out.shape[:2]
    for dr, dc in _STENCIL:
        rr = (pts[:, 0] + dr).astype(int)
        cc = (pts[:, 1] + dc).astype(int)
        keep = (rr < h) & (cc < w) & (rr >= -h) & (cc >= -w)
        out[rr[keep], cc[keep]] = color


def untransform(img: np.ndarray) -> np.ndarray:
    """Invert Normalize_tf on an image (utils.py:30-34): (x+1)*127.5."""
    return np.clip((np.asarray(img, np.float32) + 1.0) * 127.5, 0, 255).astype(np.uint8)


def overlay_contours(image_u8: np.ndarray, pred_2ch: np.ndarray,
                     gt_2ch: np.ndarray) -> np.ndarray:
    """image (H,W,3) u8; pred/gt (2,H,W) binary with [0]=cup, [1]=disc.

    Reference drawing (utils.py:385-450): prediction maps get their border
    ring zeroed (contours close at the frame), then the disc contour paints
    green and the cup contour blue (the reference's ``disc_map``/``cup_map``
    locals are name-swapped relative to their content — prob_map[1] is the
    disc-union channel drawn [0,255,0] — so green-disc/blue-cup is its actual
    output); GT cup+disc contours paint red last, through
    largest-CC + fill-holes (``get_largest_fillhole``, utils.py:423-425)."""
    from wt_pse_tpu.ops.postprocess import largest_component_fill_holes

    out = image_u8.copy()

    def bordered(m):
        m = np.asarray(m, np.float64).copy()
        m[:, 0] = 0.0
        m[:, -1] = 0.0
        m[0, :] = 0.0
        m[-1, :] = 0.0
        return m

    _paint_points(out, find_contour_points(bordered(pred_2ch[1])), [0, 255, 0])
    _paint_points(out, find_contour_points(bordered(pred_2ch[0])), [0, 0, 255])
    for ch in (0, 1):
        gt = largest_component_fill_holes(np.asarray(gt_2ch[ch]) > 0.5)
        _paint_points(out, find_contour_points(gt.astype(np.float64)),
                      [255, 0, 0])
    return out


def joint_val_image(image: np.ndarray, pred_2ch: np.ndarray,
                    mask_2ch: np.ndarray, ratio: float = 0.5) -> np.ndarray:
    """4-panel validation montage (``/root/reference/utils.py:330-351``):
    ``[image | mask overlay | cup-pred overlay | disc-pred overlay]``.

    NHWC-native: ``image`` is (H,W,3) float in [-1,1] (Normalize_tf space, like
    the reference's input), ``pred_2ch``/``mask_2ch`` are (2,H,W) binary with
    [0]=cup, [1]=disc. Mask panel paints cup in red and disc in green channels
    (reference lines 343-344); pred panels are grayscale blends. Returns
    (H, 4W, 3) float in the blended range.
    """
    image = np.asarray(image, np.float32)
    h, w = image.shape[:2]
    pred = np.asarray(pred_2ch, np.float32)
    mask = np.asarray(mask_2ch, np.float32)
    pred_cup = np.repeat(pred[0][..., None], 3, axis=-1)
    pred_disc = np.repeat(pred[1][..., None], 3, axis=-1)
    mask_rgb = np.zeros((h, w, 3), np.float32)
    mask_rgb[..., 0] = mask[0]
    mask_rgb[..., 1] = mask[1]
    panels = [image,
              ratio * image + (1 - ratio) * mask_rgb,
              ratio * image + (1 - ratio) * pred_cup,
              ratio * image + (1 - ratio) * pred_disc]
    return np.concatenate(panels, axis=1)


def save_val_img(path: str, epoch: int, imgs: list[np.ndarray]):
    """Stack per-sample montages vertically into
    ``<path>/visualization/epoch_<N>.png`` (``utils.py:354-363``)."""
    from PIL import Image

    out = os.path.join(path, "visualization")
    os.makedirs(out, exist_ok=True)
    stack = np.concatenate([np.asarray(im, np.float32) for im in imgs], axis=0)
    lo, hi = stack.min(), stack.max()
    u8 = np.zeros_like(stack, np.uint8) if hi <= lo else \
        np.clip((stack - lo) / (hi - lo) * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(u8).save(os.path.join(out, f"epoch_{epoch}.png"))
    return os.path.join(out, f"epoch_{epoch}.png")


def save_per_img(image_u8: np.ndarray, out_dir: str, name: str,
                 pred_2ch: np.ndarray, gt_2ch: np.ndarray, ext: str = "bmp"):
    """Save original + overlay images (utils.py:371-454 directory layout:
    ``original_image/`` and ``overlay/``)."""
    from PIL import Image

    os.makedirs(os.path.join(out_dir, "original_image"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "overlay"), exist_ok=True)
    Image.fromarray(image_u8).save(
        os.path.join(out_dir, "original_image", f"{name}.{ext}"))
    Image.fromarray(overlay_contours(image_u8, pred_2ch, gt_2ch)).save(
        os.path.join(out_dir, "overlay", f"{name}.{ext}"))
