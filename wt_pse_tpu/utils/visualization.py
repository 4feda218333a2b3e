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
