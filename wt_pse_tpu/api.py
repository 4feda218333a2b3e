"""One-call inference API.

A user of the reference runs inference by editing module-level constants in
``test_visulization.py`` and re-running the script (``/root/reference/
test_visulization.py:35-39,122-230``). Here the same capability is a library
call::

    import wt_pse_tpu as w
    predict = w.load_predictor("checkpoint_800.pth.tar")   # or an orbax dir
    masks = predict(images)          # (B,H,W,3) uint8 or [-1,1] float
    masks["od"], masks["oc"]         # post-processed binary masks (B,H,W)
    masks["od_logits"], ...          # raw 256x256 logits if needed

``load_predictor`` accepts both checkpoint formats the framework reads:
the reference's 4-net ``.pth.tar`` (``{model, model_shape, model_oc,
model_oc_shape}``, ``Trainer.py:282-288``) and an orbax ensemble directory
written by :class:`wt_pse_tpu.train.trainer.Trainer`. Inference is the exact
two-stage eval path (coarse OD -> thresholded ROI -> fine OC,
``Trainer.py:170-184``), jitted once per input shape.
"""

from __future__ import annotations

import os

import numpy as np


class Predictor:
    """Callable wrapper over the jitted two-stage predict.

    ``__call__(images, postprocess=True)``:

    - ``images``: (B, H, W, 3) — uint8 in [0,255] (normalized internally with
      the reference's ``Normalize_tf``: x/127.5-1, ``custom_transforms.py:
      455-499``) or float already in [-1, 1]. Any resolution: non-256 inputs
      are LANCZOS-resized to the network resolution exactly like the
      reference's loader (``fundus_dataloader.py:164-197``; float inputs
      round-trip through the same uint8 path — the checkpoints were trained
      on 256² and running the convnets at native resolution would be
      silently off-distribution).
    - returns ``od``/``oc`` post-processed binary masks (sigmoid > 0.75 ->
      largest-CC -> fill-holes, ``utils.py:278-329``) and the raw
      ``od_logits``/``oc_logits`` — both AT THE INPUT RESOLUTION (non-256
      logits are bilinearly upsampled back before post-processing, the
      reference's ``Trainer.py:206-209`` / ``test_visulization.py:227-230``
      native-label semantics).
    """

    def __init__(self, predict_fn, variables, label: str | None = "OD",
                 image_size: int = 256):
        self._predict = predict_fn
        self._variables = variables
        self._label = label
        self._size = image_size

    def __call__(self, images: np.ndarray, postprocess: bool = True) -> dict:
        from wt_pse_tpu.ops.postprocess import postprocess_logits
        from wt_pse_tpu.train.eval import _resize_host

        arr = np.asarray(images)
        if arr.ndim == 3:
            arr = arr[None]
        native_hw = arr.shape[1:3]
        resize = native_hw != (self._size, self._size)
        if resize:
            from PIL import Image

            if arr.dtype != np.uint8:  # parity: the loader decodes uint8 PIL
                # round, don't truncate: x/127.5*127.5 lands 1 ulp below the
                # integer for many uint8 origins, and truncation would shift
                # those pixels a full gray level
                arr = np.clip(np.rint((np.asarray(arr, np.float32) + 1.0)
                                      * 127.5), 0, 255).astype(np.uint8)
            arr = np.stack([
                np.asarray(Image.fromarray(im).resize(
                    (self._size, self._size), Image.LANCZOS)) for im in arr])
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 127.5 - 1.0
        arr = np.asarray(arr, np.float32)
        out_od, out_oc = self._predict(*self._variables, arr)
        od_l, oc_l = np.asarray(out_od), np.asarray(out_oc)
        if resize:  # logits back to the input resolution (Trainer.py:206-209)
            od_l = _resize_host(od_l, native_hw)
            oc_l = _resize_host(oc_l, native_hw)
        out = {"od_logits": od_l, "oc_logits": oc_l}
        if postprocess:
            # 1-class checkpoints (label set) put their class in channel 0; the
            # 2-class convention is [cup, disc] (utils.py:298-329), so with
            # label=None the disc mask lives in channel 1. Only the kept
            # channel is cleaned (LCC+fill is the dominant host cost — the
            # discarded channel of each head would double it for nothing).
            od_ch = 0 if self._label is not None else 1
            out["od"] = np.stack([
                postprocess_logits(np.moveaxis(o, -1, 0)[od_ch:od_ch + 1],
                                   label=self._label or "OD")[0]
                for o in od_l])
            out["oc"] = np.stack([
                postprocess_logits(np.moveaxis(o, -1, 0)[0:1],
                                   label=self._label or "OC")[0]
                for o in oc_l])
        return out


def load_predictor(model_file: str, hparams: dict | None = None,
                   algorithm: str = "WT_PSE", label: str | None = "OD",
                   partial_load: bool = False,
                   image_size: int = 256) -> Predictor:
    """Build a :class:`Predictor` from a checkpoint.

    ``model_file``: a reference-format ``.pth.tar`` or an orbax ensemble
    directory. ``hparams`` defaults to the algorithm's registry defaults —
    pass overrides for ablation checkpoints (e.g. ``{"whitening": False}``,
    with ``partial_load=True`` to restore the reference's filtered partial
    load, ``test_visulization.py:132-197``). ``image_size`` is the network
    input resolution the checkpoint was trained at (the reference pipeline is
    fixed at 256, ``train.py:59``; pass the matching size for re-trained
    checkpoints at other resolutions).
    """
    from wt_pse_tpu.cli.test_visualization import (
        build_networks_from_orbax, build_networks_from_torch_ckpt)
    from wt_pse_tpu.config import default_hparams

    hp = dict(default_hparams(algorithm))
    hp.update(hparams or {})
    n_classes = 1 if label in ("OC", "OD") else 2
    if os.path.isdir(model_file):
        nets, variables = build_networks_from_orbax(
            model_file, hp, n_classes, algorithm)
    else:
        nets, variables = build_networks_from_torch_ckpt(
            model_file, hp, n_classes, algorithm, strict=not partial_load)
    if algorithm == "Unet_nips2023_joint_shape_regularization":
        from wt_pse_tpu.train.eval import make_predict_fn_joint

        predict_fn = make_predict_fn_joint(nets[0], nets[2])
    else:
        from wt_pse_tpu.train.eval import make_predict_fn

        predict_fn = make_predict_fn(*nets)
    return Predictor(predict_fn, variables, label, image_size=image_size)
