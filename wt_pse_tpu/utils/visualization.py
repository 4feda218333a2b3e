"""Eval-time visualization: contour overlays and image grids.

Reproduces ``save_per_img`` (``/root/reference/utils.py:371-454``): draw prediction
contours (green = disc, blue = cup) and ground-truth contours (red) over the
original image, save original + overlay PNG/BMP pairs. Contour extraction uses
marching-squares boundary pixels computed with numpy/scipy (the reference uses
skimage ``find_contours``; we draw the boundary pixel set, visually equivalent).
"""

from __future__ import annotations

import os

import numpy as np
import scipy.ndimage as ndi


def mask_boundary(mask: np.ndarray, width: int = 2) -> np.ndarray:
    """Boundary pixels of a binary mask (mask minus its erosion), thickened."""
    mask = np.asarray(mask) > 0.5
    er = ndi.binary_erosion(mask, iterations=width)
    return mask & ~er


def untransform(img: np.ndarray) -> np.ndarray:
    """Invert Normalize_tf on an image (utils.py:30-34): (x+1)*127.5."""
    return np.clip((np.asarray(img, np.float32) + 1.0) * 127.5, 0, 255).astype(np.uint8)


def overlay_contours(image_u8: np.ndarray, pred_2ch: np.ndarray,
                     gt_2ch: np.ndarray) -> np.ndarray:
    """image (H,W,3) u8; pred/gt (2,H,W) binary with [0]=cup, [1]=disc.
    Colors per the reference: prediction disc green / cup blue, GT red."""
    out = image_u8.copy()
    disc_b = mask_boundary(pred_2ch[1])
    cup_b = mask_boundary(pred_2ch[0])
    gt_d = mask_boundary(gt_2ch[1])
    gt_c = mask_boundary(gt_2ch[0])
    out[disc_b] = [0, 255, 0]
    out[cup_b] = [0, 0, 255]
    out[gt_d | gt_c] = [255, 0, 0]
    return out


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
