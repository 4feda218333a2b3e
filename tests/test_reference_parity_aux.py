"""Parity vs the ACTUAL reference auxiliary modules (not a rewrite of them).

`tests/test_reference_parity.py` anchors the network/step math against
`/root/reference/algorithms.py` + `shape_networks.py`. This file anchors the
rest of the surface the same way — importing the real reference modules:

- `hparams_registry.py` — default hparam dicts must match key-for-key;
- `metrics.py` — `dice_coeff_2label` on both the `label=None` and labeled paths;
- `fundus_dataloader.py` — decode pipeline (RGB convert, LANCZOS 256 resize,
  label handling, prediction-state native masks, the Domain4 string-'4' crop
  quirk) compared byte-for-byte on a synthetic PNG tree;
- `custom_transforms.py` — `Normalize_tf` + `ToTensor` encode semantics and the
  `ToMultiLabel`/`SoftLable` domain-code helpers.

These run on host numpy/PIL (no heavy jit), so they live in the FAST suite.
"""

from __future__ import annotations

import importlib
import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference"


@pytest.fixture(scope="module")
def refmods():
    sys.path.insert(0, REF)
    try:
        yield {name: importlib.import_module(name)
               for name in ("hparams_registry", "metrics", "fundus_dataloader",
                            "custom_transforms")}
    finally:
        sys.path.remove(REF)


# --------------------------------------------------------------------------
# hparams_registry
# --------------------------------------------------------------------------

# Keys this framework adds on top of the reference surface (documented in
# config/hparams.py); everything else must match the reference exactly.
EXTENSION_KEYS = {"compute_dtype", "space_to_depth", "space_to_depth_levels",
                  "use_pallas_whitening"}


@pytest.mark.parametrize("algo", ["WT_PSE", "Unet_nips2023_joint_shape_regularization"])
def test_default_hparams_match_reference(refmods, algo):
    from wt_pse_tpu.config.hparams import default_hparams

    ref = refmods["hparams_registry"].default_hparams(algo, "Fundus")
    ours = default_hparams(algo)
    assert set(ours) - set(ref) == EXTENSION_KEYS
    assert set(ref) - set(ours) == set()
    for k, v in ref.items():
        if isinstance(v, (list, np.ndarray)):
            assert np.array_equal(ours[k], v), k
        else:
            assert ours[k] == v, k


def test_random_hparams_within_reference_ranges(refmods):
    """Our random search draws must stay inside the reference's search space
    (hparams_registry.py:31-47,82-93)."""
    from wt_pse_tpu.config.hparams import random_hparams

    for seed in range(5):
        hp = random_hparams("WT_PSE", seed=seed)
        assert 10 ** -5 <= hp["lr_gm"] <= 10 ** -3.5
        assert 10 ** -5 <= hp["lr_sc"] <= 10 ** -3.5
        assert 2 ** 3 <= hp["batch_size"] <= 2 ** 5.5
        assert 10 ** -6 <= hp["weight_decay"] <= 10 ** -2
        assert hp["margin"] in (1, 0.1, 0.01)
        assert hp["instance_wt_gm"] in (1, 0.1, 0.25, 0.75)
        assert hp["domain_wt_gm"] in (1, 0.1, 0.25, 0.75)


@pytest.mark.parametrize("algo", ["WT_PSE",
                                  "Unet_nips2023_joint_shape_regularization"])
@pytest.mark.parametrize("seed", [0, 1, 7, 42])
def test_random_hparams_seeded_draw_matches_reference(refmods, algo, seed):
    """Full seeded-draw parity: the rebuild mirrors the reference's tuple
    surface AND its RandomState consumption order, so the same seed must
    produce the identical draw for EVERY key — including the non-drawn
    random-side constants (`global_metric` -> True,
    `posterior_transform_follow_prior` -> True) the joint variant flips
    (hparams_registry.py:95-158)."""
    from wt_pse_tpu.config.hparams import random_hparams

    ref = refmods["hparams_registry"].random_hparams(algo, "Fundus", seed)
    ours = random_hparams(algo, seed=seed)
    assert set(ref) - set(ours) == set()
    assert set(ours) - set(ref) == EXTENSION_KEYS
    for k, v in ref.items():
        if isinstance(v, (list, np.ndarray)):
            assert np.array_equal(ours[k], v), k
        else:
            assert ours[k] == v, (k, ours[k], v)


# --------------------------------------------------------------------------
# metrics.dice_coeff_2label
# --------------------------------------------------------------------------

def test_dice_coeff_2label_matches_reference(refmods):
    from wt_pse_tpu.ops.metrics import dice_coeff_2label

    rng = np.random.RandomState(3)
    pred = (rng.rand(2, 33, 41) > 0.5).astype(np.float32)
    target = (rng.rand(2, 33, 41) > 0.5).astype(np.float32)
    for label in (None, "OD", "OC"):
        r_cup, r_disc = refmods["metrics"].dice_coeff_2label(
            pred.copy(), torch.from_numpy(target.copy()), label)
        o_cup, o_disc = dice_coeff_2label(pred, target, label)
        assert o_cup == pytest.approx(float(r_cup), abs=1e-12)
        assert o_disc == pytest.approx(float(r_disc), abs=1e-12)
    # empty prediction/target: the +1 smoothing keeps it finite on both sides
    z = np.zeros((2, 8, 8), np.float32)
    r = refmods["metrics"].dice_coeff_2label(z, torch.from_numpy(z), None)
    o = dice_coeff_2label(z, z, None)
    assert o == pytest.approx(tuple(map(float, r)))


# --------------------------------------------------------------------------
# fundus_dataloader vs data/fundus.py on a synthetic PNG tree
# --------------------------------------------------------------------------

def _write_tree(root, domain: int, phase: str, names_sizes):
    from PIL import Image

    img_dir = os.path.join(root, f"Domain{domain}", phase, "ROIs", "image")
    mask_dir = os.path.join(root, f"Domain{domain}", phase, "ROIs", "mask")
    os.makedirs(img_dir), os.makedirs(mask_dir)
    rng = np.random.RandomState(domain * 101 + len(names_sizes))
    for name, (w, h) in names_sizes:
        Image.fromarray(rng.randint(0, 256, (h, w, 3), np.uint8)).save(
            os.path.join(img_dir, name))
        # gray values straddling every encode threshold (0/50/51/128/200/201/255)
        gray = rng.choice([0, 30, 50, 51, 128, 200, 201, 230, 255],
                          size=(h, w)).astype(np.uint8)
        Image.fromarray(gray, mode="L").save(os.path.join(mask_dir, name))


def _ref_dataset(refmods, base, phase, splitid, state, label):
    return refmods["fundus_dataloader"].FundusSegmentation(
        base_dir=base, phase=phase, splitid=splitid, transform=None,
        state=state, label=label)


def _pool_by_name(ds):
    """name -> (PIL image, PIL label) across all reference pools."""
    out = {}
    for key in ds.image_pool:
        for img, lab, name in zip(ds.image_pool[key], ds.label_pool[key],
                                  ds.img_name_pool[key]):
            out[name] = (img, lab)
    return out


def test_fundus_decode_matches_reference(refmods, tmp_path):
    from wt_pse_tpu.data.fundus import load_fundus

    base = str(tmp_path)
    _write_tree(base, 1, "train",
                [("g0001.png", (300, 220)), ("n0002.png", (260, 300)),
                 ("gd003.png", (256, 256)), ("V0004.png", (280, 280))])
    ref = _ref_dataset(refmods, base, "train", [1], "train", None)
    ours = load_fundus(base, "train", [1], "train", cache=False)
    refpool = _pool_by_name(ref)
    assert set(ours.names) == set(refpool)
    for i, name in enumerate(ours.names):
        r_img, r_lab = refpool[name]
        np.testing.assert_array_equal(ours.images[i], np.asarray(r_img))
        np.testing.assert_array_equal(ours.labels[i], np.asarray(r_lab))


def test_fundus_prediction_state_and_original_masks(refmods, tmp_path):
    """state='prediction': labels stay native-resolution; the test-phase
    __getitem__ original_od/original_oc threshold maps must equal encode_masks
    (fundus_dataloader.py:100-161)."""
    from wt_pse_tpu.data.fundus import encode_masks, load_fundus

    base = str(tmp_path)
    _write_tree(base, 2, "test", [("g01.png", (180, 140)), ("n02.png", (140, 180))])
    ref = _ref_dataset(refmods, base, "test", [2], "prediction", "OD")
    ours = load_fundus(base, "test", [2], "prediction", cache=False)
    refpool = _pool_by_name(ref)
    for i, name in enumerate(ours.names):
        r_img, r_lab = refpool[name]
        np.testing.assert_array_equal(ours.images[i], np.asarray(r_img))
        np.testing.assert_array_equal(ours.labels[i], np.asarray(r_lab))
        assert ours.labels[i].shape == np.asarray(r_lab).shape  # native res kept
    # original_od / original_oc from the reference __getitem__ test branch.
    # ref[idx] indexes the reference's own (glob-ordered) pool — pair it with
    # that pool's label (ours are sorted; order is not part of the contract),
    # asserting encode_masks reproduces the __getitem__ threshold construction.
    (pool_key,) = ref.label_pool.keys()
    for idx in range(len(ours.names)):
        sample = ref[idx]
        od, oc = encode_masks(np.asarray(ref.label_pool[pool_key][idx]))
        np.testing.assert_array_equal(np.asarray(sample["original_od"])[0], od)
        np.testing.assert_array_equal(np.asarray(sample["original_oc"])[0], oc)


@pytest.mark.parametrize("splitid", [["4"], [4]])
def test_fundus_domain4_crop_quirk(refmods, tmp_path, splitid):
    """The Domain4 pre-crop fires only on the STRING '4' (string-compare quirk,
    fundus_dataloader.py:180); both configurations must match the reference."""
    from wt_pse_tpu.data.fundus import load_fundus

    base = str(tmp_path)
    _write_tree(base, 4, "train", [("S1.png", (700, 700)), ("G2.png", (660, 690))])
    ref = _ref_dataset(refmods, base, "train", splitid, "train", None)
    ours = load_fundus(base, "train", splitid, "train", cache=False)
    refpool = _pool_by_name(ref)
    assert set(ours.names) == set(refpool)
    for i, name in enumerate(ours.names):
        r_img, r_lab = refpool[name]
        np.testing.assert_array_equal(ours.images[i], np.asarray(r_img))
        np.testing.assert_array_equal(ours.labels[i], np.asarray(r_lab))


# --------------------------------------------------------------------------
# custom_transforms: Normalize_tf + ToTensor / domain-code helpers
# --------------------------------------------------------------------------

def test_normalize_tf_totensor_match_reference(refmods):
    """The production normalize_tf (augment.py:98-105) must reproduce the
    reference Normalize_tf->ToTensor encode exactly: img/127.5-1, OD=gray<=200,
    OC=gray<=50 (custom_transforms.py:455-530)."""
    from wt_pse_tpu.data.augment import normalize_tf

    ct = refmods["custom_transforms"]
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (64, 64, 3), np.uint8)
    gray = rng.choice([0, 30, 50, 51, 128, 200, 201, 230, 255],
                      size=(64, 64)).astype(np.uint8)
    sample = {"image": img.copy(), "label_od": gray.copy(),
              "label_oc": gray.copy(), "dc": 1}
    out = ct.ToTensor()(ct.Normalize_tf()(sample))

    o_img, o_od, o_oc = normalize_tf(jnp.asarray(img, jnp.float32),
                                     jnp.asarray(gray, jnp.float32))
    np.testing.assert_allclose(np.asarray(o_img),
                               out["image"].numpy().transpose(1, 2, 0),
                               rtol=0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(o_od)[..., 0],
                                  out["label_od"].numpy()[0])
    np.testing.assert_array_equal(np.asarray(o_oc)[..., 0],
                                  out["label_oc"].numpy()[0])
    # reference dc path: soft one-hot with the hot entry in [0.8, 1]
    dc = out["dc"].numpy()
    assert dc.shape == (3,) and dc.argmax() == 1 and 0.8 <= dc[1] <= 1.0


def test_domain_code_helpers_match_reference(refmods):
    from wt_pse_tpu.data.augment_extras import (domain_code_one_hot, soft_label,
                                                to_multilabel)

    ct = refmods["custom_transforms"]
    fd = refmods["fundus_dataloader"]
    for dc in range(3):
        np.testing.assert_array_equal(domain_code_one_hot(dc),
                                      ct.ToMultiLabel(dc))
    pre = np.array([[0, 1], [2, 0]])
    np.testing.assert_array_equal(to_multilabel(pre), fd.to_multilabel(pre))

    # SoftLable invariants (shared contract): argmax preserved, hot in [0.8,1],
    # off entries nonnegative. The reference sums to exactly 1 only when the
    # hot index is not last (custom_transforms.py:566-579 leaves the residual
    # unassigned otherwise — see soft_label docstring); ours always sums to 1.
    import random as pyrandom
    pyrandom.seed(5)
    for dc in range(3):
        r = np.asarray(ct.SoftLable(ct.ToMultiLabel(dc)), np.float64)
        assert r.argmax() == dc and 0.8 <= r[dc] <= 1.0 and (r >= 0).all()
        if dc != 2:
            assert r.sum() == pytest.approx(1.0, abs=1e-12)
        o = np.asarray(soft_label(jax.random.PRNGKey(dc),
                                  domain_code_one_hot(dc)), np.float64)
        assert o.argmax() == dc and 0.8 <= o[dc] <= 1.0 and (o >= 0).all()
        assert o.sum() == pytest.approx(1.0, abs=1e-6)
