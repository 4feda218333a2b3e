"""Fundus dataset: directory scan + decode into numpy pools.

Mirrors the reference loader semantics (``/root/reference/fundus_dataloader.py``):

- layout ``{base_dir}/Domain{id}/{phase}/ROIs/image/*.png`` with masks at
  ``.../ROIs/mask/`` (path ``image``->``mask`` substitution, lines 47-54);
- pools keyed by dataset-origin flag inferred from the filename prefix
  (DGS: ``gd``/``nd``; REF: ``g``/``n``; RIM: ``G``/``N``/``S``; REF_val: ``V`` —
  lines 37-44, 168-179); empty pools pruned;
- images -> RGB, resized 256x256 LANCZOS; labels -> L; labels resized to 256
  (PIL default BICUBIC) unless ``state == 'prediction'`` (lines 181-195);
- the Domain4 pre-crop ``(144,144)+512x512``: the reference gates it on
  ``splitid[0] == '4'`` — a *string* compare, while both CLIs pass ints, so the
  crop never fires in the shipped pipelines (line 180). We replicate that check
  verbatim (crop only when the caller passes the string ``'4'``).

Unlike the reference (which keeps PIL handles and re-decodes lazily per access),
everything is decoded once into contiguous uint8 numpy arrays ready to be placed
in device HBM — the train loop then never touches the host again.

Documented deviation — multi-pool sampling: the reference ``__getitem__`` draws
one sample *per origin pool* and ``get_batch`` then keeps only the first pool's
draw (``fundus_dataloader.py:86-99``), whereas our sampler draws uniformly over
the *flattened* pools (``augment.py::sample_domain_batch``). Identical for the
shipped datasets (each domain directory holds a single prefix family, so one
non-empty pool); different only if a domain directory ever mixes prefixes — the
reference would then silently ignore every pool but the first, while we sample
all images uniformly.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from glob import glob

import numpy as np

FLAG_PREFIXES = {
    "DGS": ("gd", "nd"),
    "REF": ("g", "n"),
    "RIM": ("G", "N", "S"),
    "REF_val": ("V",),
}
POOL_ORDER = ("DGS", "REF", "RIM", "REF_val")


def classify_flag(basename: str) -> str | None:
    if basename[:2] in FLAG_PREFIXES["DGS"]:
        return "DGS"
    if basename[:1] in FLAG_PREFIXES["REF"]:
        return "REF"
    if basename[:1] in FLAG_PREFIXES["RIM"]:
        return "RIM"
    if basename[:1] in FLAG_PREFIXES["REF_val"]:
        return "REF_val"
    return None


def encode_masks(gray: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Threshold-encode a grayscale label (255 bg / 128 disc / 0 cup) into binary
    (od, oc) masks: OD = disc∪cup = gray<=200, OC = cup = gray<=50
    (``custom_transforms.py:466-497``, ``fundus_dataloader.py:112-134``)."""
    od = (gray <= 200).astype(np.float32)
    oc = (gray <= 50).astype(np.float32)
    return od, oc


@dataclass
class FundusDomain:
    """One decoded (domain, phase) slice."""

    images: np.ndarray  # (N, 256, 256, 3) uint8
    labels: np.ndarray | list  # (N, 256, 256) uint8, or list of native-res uint8
    names: list[str] = field(default_factory=list)

    def __len__(self):
        return len(self.images)


def load_fundus(
    base_dir: str,
    phase: str = "train",
    splitid=(1, 2, 4),
    state: str = "train",
    size: int = 256,
    cache: bool = True,
) -> FundusDomain:
    """Decode one FundusSegmentation-equivalent dataset.

    ``state='prediction'`` keeps labels at native resolution (list), as the
    reference does for test-time metrics (fundus_dataloader.py:193-194).

    Decoded arrays are cached as ``.npz`` next to the dataset (keyed by
    phase/split/state/size) so repeated runs skip the PIL decode entirely —
    the reference re-decodes every run (eagerly, into PIL handles).
    """
    import hashlib

    from PIL import Image

    cache_path = None
    if cache:
        # str(4) == str('4') but the Domain4 pre-crop fires only for the STRING
        # '4' (the reference's string-compare quirk, see do_crop below) — key
        # the crop decision explicitly so the two configurations never alias
        # to the same cache entry
        crop_tag = "crop" if (len(splitid) > 0 and splitid[0] == "4") else "nocrop"
        key = f"{phase}-{'_'.join(map(str, splitid))}-{state}-{size}-{crop_tag}"
        digest = hashlib.sha1(key.encode()).hexdigest()[:10]
        cache_dir = os.path.join(base_dir, ".wt_pse_cache")
        cache_path = os.path.join(cache_dir, f"fundus_{key}_{digest}.npz")
        if os.path.exists(cache_path):
            try:
                z = np.load(cache_path, allow_pickle=True)
                labels = (z["labels"] if state != "prediction"
                          else list(z["labels_ragged"]))
                return FundusDomain(images=z["images"], labels=labels,
                                    names=list(z["names"]))
            except Exception:
                pass  # stale/corrupt cache: fall through and re-decode

    entries = []
    for sid in splitid:
        img_dir = os.path.join(base_dir, f"Domain{sid}", phase, "ROIs", "image", "")
        for image_path in sorted(glob(img_dir + "*.png")):
            entries.append((image_path, image_path.replace("image", "mask")))
    if not entries:
        raise FileNotFoundError(
            f"no images under {base_dir}/Domain{{{','.join(map(str, splitid))}}}/{phase}/ROIs/image/")

    do_crop = len(splitid) > 0 and splitid[0] == "4"  # reference's string-compare quirk

    pools: dict[str, list] = {k: [] for k in POOL_ORDER}
    for image_path, mask_path in entries:
        flag = classify_flag(os.path.basename(image_path))
        if flag is None:
            raise ValueError(f"unknown dataset prefix: {image_path}")
        img = Image.open(image_path).convert("RGB")
        lab = Image.open(mask_path)
        if lab.mode != "L":
            lab = lab.convert("L")
        if do_crop:
            img = img.crop((144, 144, 144 + 512, 144 + 512))
            lab_arr = np.asarray(lab)[144 : 144 + 512, 144 : 144 + 512]
            lab = Image.fromarray(lab_arr)
        img = img.resize((size, size), Image.LANCZOS)
        if state != "prediction":
            lab = lab.resize((size, size))  # PIL default filter, as the reference
        pools[flag].append(
            (np.asarray(img, np.uint8), np.asarray(lab, np.uint8),
             os.path.basename(image_path))
        )

    # flatten in pool order (reference iterates dict order; single-domain datasets
    # have one non-empty pool anyway)
    images, labels, names = [], [], []
    for key in POOL_ORDER:
        for img, lab, name in pools[key]:
            images.append(img)
            labels.append(lab)
            names.append(name)

    images_arr = np.stack(images)
    if state != "prediction":
        labels_out: np.ndarray | list = np.stack(labels)
    else:
        labels_out = labels  # native resolutions may differ per image

    if cache_path is not None:
        try:
            os.makedirs(os.path.dirname(cache_path), exist_ok=True)
            payload = {"images": images_arr, "names": np.array(names)}
            if state != "prediction":
                payload["labels"] = labels_out
            else:
                payload["labels_ragged"] = np.array(labels_out, dtype=object)
            np.savez_compressed(cache_path, **payload)
        except Exception:
            pass  # read-only dataset dirs are fine; caching is best-effort
    return FundusDomain(images=images_arr, labels=labels_out, names=names)


def load_train_domains(base_dir: str, splitids, size: int = 256) -> list[FundusDomain]:
    """One FundusDomain per training domain id (train.py:71-75 builds one dataset
    per id)."""
    return [load_fundus(base_dir, "train", [sid], "train", size) for sid in splitids]
