"""Segmentation metrics: Dice, ASD, HD95.

- Dice: smoothed ``(2|A∩B| + 1) / (1 + |A| + |B|)``
  (``/root/reference/metrics.py:68-97``).
- ASD / HD95: medpy-semantics surface distances (``medpy.metric.binary.asd`` /
  ``hd95`` as used at ``Trainer.py:226-239``), reimplemented on scipy primitives
  (medpy itself computes them with ``scipy.ndimage``): the surface of a mask is
  ``mask ^ erosion(mask, cross-structure)``; distances are the Euclidean distance
  transform of the complement of the other mask's surface sampled at surface
  voxels. ``asd(a, b)`` is one-directional (mean over a's surface);
  ``hd95(a, b) = p95(d(a→b) ++ d(b→a))`` — the 95th percentile of the
*concatenated* bidirectional distance set, exactly as medpy aggregates it.

The empty-prediction guard (reference scores 100 for empty masks,
``Trainer.py:221-233``) lives in the eval loop, not here; these functions raise on
empty inputs exactly like medpy.
"""

from __future__ import annotations

import numpy as np
import scipy.ndimage as ndi


def dice_binary(seg: np.ndarray, gt: np.ndarray) -> float:
    seg = np.asarray(seg, bool)
    gt = np.asarray(gt, bool)
    inter = float(np.logical_and(seg, gt).sum())
    return (2.0 * inter + 1.0) / (1.0 + float(seg.sum()) + float(gt.sum()))


def _surface(mask: np.ndarray, connectivity: int = 1) -> np.ndarray:
    mask = np.asarray(mask, bool)
    structure = ndi.generate_binary_structure(mask.ndim, connectivity)
    eroded = ndi.binary_erosion(mask, structure=structure, iterations=1)
    return mask ^ eroded


def surface_distances(a: np.ndarray, b: np.ndarray, connectivity: int = 1) -> np.ndarray:
    """Distances from each surface voxel of ``a`` to the nearest surface voxel of
    ``b`` (medpy ``__surface_distances``). Dispatches to the native C++ engine
    when built (connectivity-1 surfaces, the medpy default)."""
    if connectivity == 1:
        from wt_pse_tpu import native

        if native.AVAILABLE:
            na = np.asarray(a, bool)
            nb = np.asarray(b, bool)
            if not na.any():
                raise ValueError("first mask is empty")
            if not nb.any():
                raise ValueError("second mask is empty")
            return native.surface_distances_native(na, nb).astype(np.float64)
    return surface_distances_scipy(a, b, connectivity)


def surface_distances_scipy(a: np.ndarray, b: np.ndarray,
                            connectivity: int = 1) -> np.ndarray:
    """scipy reference implementation (always available)."""
    a = np.asarray(a, bool)
    b = np.asarray(b, bool)
    if not a.any():
        raise ValueError("first mask is empty")
    if not b.any():
        raise ValueError("second mask is empty")
    sa = _surface(a, connectivity)
    sb = _surface(b, connectivity)
    dt = ndi.distance_transform_edt(~sb)
    return dt[sa]


def asd(result: np.ndarray, reference: np.ndarray) -> float:
    """Average (one-directional) surface distance, medpy ``binary.asd`` parity."""
    return float(surface_distances(result, reference).mean())


def assd(result: np.ndarray, reference: np.ndarray) -> float:
    """Average symmetric surface distance (medpy ``binary.assd``)."""
    d1 = surface_distances(result, reference)
    d2 = surface_distances(reference, result)
    return float(np.concatenate([d1, d2]).mean())


def hd95(result: np.ndarray, reference: np.ndarray) -> float:
    """95th-percentile Hausdorff distance, medpy ``binary.hd95`` parity.

    medpy takes the 95th percentile of the *concatenated* bidirectional
    distance set — ``np.percentile(np.hstack((d(a→b), d(b→a))), 95)`` — NOT
    ``max`` of the per-direction percentiles (those differ whenever the two
    surfaces have different sizes or distance distributions, e.g. a large
    accurate surface one way and a few distant voxels the other)."""
    d1 = surface_distances(result, reference)
    d2 = surface_distances(reference, result)
    return float(np.percentile(np.hstack((d1, d2)), 95))


def dice_coeff_2label(pred: np.ndarray, target: np.ndarray,
                      label: str | None) -> tuple[float, float]:
    """(cup, disc) Dice for a (C,H,W) prediction/target pair
    (metrics.py:115-149): with ``label`` set, both values come from channel 0."""
    pred = np.asarray(pred)
    target = np.asarray(target)
    if label is None:
        return dice_binary(pred[0], target[0]), dice_binary(pred[1], target[1])
    d = dice_binary(pred[0], target[0])
    return d, d
