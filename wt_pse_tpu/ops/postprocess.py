"""Prediction post-processing: sigmoid -> threshold -> largest connected component
-> binary fill-holes.

Behavioral spec: ``/root/reference/utils.py:267-329`` (``get_largest_fillhole`` uses
skimage ``label`` — 8-connectivity — + ``regionprops`` areas + scipy
``binary_fill_holes``; ``postprocessing`` thresholds sigmoid at 0.75 and applies it
per class channel). skimage is not a dependency here: connected components come from
``scipy.ndimage.label`` with an 8-connectivity structure (same labeling semantics),
areas from ``np.bincount``.

These run on host over small boolean masks (eval-time only; the hot train path never
calls them). A fused on-device variant is planned for the batched eval path.
"""

from __future__ import annotations

import numpy as np
import scipy.ndimage as ndi

_EIGHT = np.ones((3, 3), dtype=np.int8)


def largest_component_fill_holes(binary: np.ndarray) -> np.ndarray:
    """Keep the largest 8-connected component, then fill holes
    (utils.py:267-276). Dispatches to the native C++ implementation when built
    (wt_pse_tpu.native, ~3x faster on full-resolution masks); the scipy path
    below is the behavioral oracle."""
    from wt_pse_tpu import native

    if native.AVAILABLE:
        return native.largest_component_fill_holes_native(binary)
    return largest_component_fill_holes_scipy(binary)


def largest_component_fill_holes_scipy(binary: np.ndarray) -> np.ndarray:
    """scipy reference implementation (always available)."""
    binary = np.asarray(binary)
    labeled, n = ndi.label(binary, structure=_EIGHT)
    if n > 0:
        areas = np.bincount(labeled.ravel())[1:]  # label order, 1..n
        keep = int(np.argmax(areas)) + 1  # first max wins, as np.argmax in the ref
        binary = np.where(labeled == keep, binary, 0)
    return ndi.binary_fill_holes(np.asarray(binary).astype(int)).astype(np.uint8)


def postprocess_logits(logits_chw: np.ndarray, threshold: float = 0.75,
                       label: str | None = "OD") -> np.ndarray:
    """utils.postprocessing parity for the non-'D' dataset branch
    (utils.py:298-329): sigmoid -> >threshold -> per-channel LCC+fill.

    ``logits_chw``: (C, H, W) float logits. With ``label`` set only channel 0 is
    cleaned (1-class mode); with ``label=None`` channels 0 (cup) and 1 (disc) are.
    """
    prob = 1.0 / (1.0 + np.exp(-np.asarray(logits_chw, np.float64)))
    out = (prob > threshold).astype(np.uint8)
    if label is None:
        out[0] = largest_component_fill_holes(out[0])
        out[1] = largest_component_fill_holes(out[1])
    else:
        out[0] = largest_component_fill_holes(out[0])
    return out


def postprocess_probs_drishti(probs_chw: np.ndarray) -> np.ndarray:
    """utils.postprocessing 'D'-dataset branch (utils.py:279-297): inputs are
    already probabilities; disc = channel 1 > 0.5, cup = channel 0 > 0.1, each
    cleaned with LCC + fill-holes."""
    probs = np.asarray(probs_chw)
    out = np.copy(probs)
    disc = (probs[1] > 0.5).astype(np.uint8)
    cup = (probs[0] > 0.1).astype(np.uint8)
    out[0] = largest_component_fill_holes(cup)
    out[1] = largest_component_fill_holes(disc)
    return out
