"""Joint-shape-regularization algorithm dispatch + checkpoint resume."""

import os

import numpy as np
import pytest
from PIL import Image

from wt_pse_tpu.config import default_hparams
from wt_pse_tpu.data.fundus import load_fundus

pytestmark = pytest.mark.slow  # compile-heavy; scripts/test.sh default skips

SIZE = 48


@pytest.fixture(scope="module")
def fundus_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fundus_joint"))
    rng = np.random.RandomState(0)
    for dom, phase, n in [(1, "train", 3), (2, "train", 3), (4, "train", 3),
                          (3, "test", 2)]:
        d = os.path.join(root, f"Domain{dom}", phase, "ROIs")
        os.makedirs(os.path.join(d, "image"), exist_ok=True)
        os.makedirs(os.path.join(d, "mask"), exist_ok=True)
        prefix = {1: "gd", 2: "g", 3: "G", 4: "V"}[dom]
        for i in range(n):
            img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
            yy, xx = np.mgrid[0:64, 0:64]
            mask = np.full((64, 64), 255, np.uint8)
            mask[(yy - 32) ** 2 + (xx - 32) ** 2 < 400] = 128
            mask[(yy - 32) ** 2 + (xx - 32) ** 2 < 100] = 0
            Image.fromarray(img).save(os.path.join(d, "image", f"{prefix}_{i}.png"))
            Image.fromarray(mask).save(os.path.join(d, "mask", f"{prefix}_{i}.png"))
    return root


def _domains(root):
    return ([load_fundus(root, "train", [i], size=SIZE) for i in (1, 2, 4)],
            load_fundus(root, "test", [3], state="prediction", size=SIZE))


def test_joint_algorithm_trains(fundus_root, tmp_path):
    from wt_pse_tpu.train.trainer import Trainer

    hparams = default_hparams("Unet_nips2023_joint_shape_regularization")
    assert hparams["whitening"] is False and hparams["shape_prior"] is True
    train_doms, val_dom = _domains(fundus_root)
    trainer = Trainer(
        hparams=hparams, train_domains=train_doms, val_domain=val_dom,
        out_dir=str(tmp_path / "joint"), label="OD", batch_size=3,
        max_epoch=4, interval_validate=4, seed=1, image_size=SIZE,
        algorithm="Unet_nips2023_joint_shape_regularization",
    )
    best = trainer.train()
    assert len(best) == 6
    lines = open(os.path.join(str(tmp_path / "joint"), "metrics.jsonl")).readlines()
    import json

    rec = json.loads(lines[0])
    assert np.isfinite(rec["loss_seg"]) and np.isfinite(rec["loss_seg_oc"])
    assert "loss_kd" not in rec  # no distillation phases in the joint variant
    # per-epoch loss-trace txt files (joint epoch only, Trainer.py:706-720);
    # the reference never increments these in the joint epoch -> literal 0.0
    for name in ("ii", "ij", "all_ins", "domain"):
        trace = open(os.path.join(str(tmp_path / "joint"), f"{name}.txt")).read()
        assert trace == "0.0\n" * 4, (name, trace)


def test_joint_algorithm_with_whitening_trains(fundus_root, tmp_path):
    """joint + whitening=True (algorithms.py:1522-1535): previously refused with
    a ValueError; now the seg phases carry the whitening losses over the joint
    net's own wt features. No distillation phases either way. Forward/loss math
    is reference-parity-tested in test_reference_parity.py."""
    from wt_pse_tpu.train.trainer import Trainer

    hparams = dict(default_hparams("Unet_nips2023_joint_shape_regularization"))
    hparams["whitening"] = True
    train_doms, val_dom = _domains(fundus_root)
    trainer = Trainer(
        hparams=hparams, train_domains=train_doms, val_domain=val_dom,
        out_dir=str(tmp_path / "joint_wt"), label="OD", batch_size=3,
        max_epoch=2, interval_validate=4, seed=1, image_size=SIZE,
        algorithm="Unet_nips2023_joint_shape_regularization",
    )
    best = trainer.train()
    assert len(best) == 6
    import json

    rec = json.loads(
        open(os.path.join(str(tmp_path / "joint_wt"), "metrics.jsonl")).readline())
    assert np.isfinite(rec["loss_seg"]) and np.isfinite(rec["loss_seg_oc"])
    assert "loss_kd" not in rec  # still no distillation phases
    assert rec["loss_ins_wt"] > 0  # whitening losses active in the seg phases


def test_joint_algorithm_s2d_trains(fundus_root, tmp_path):
    """joint variant composes with space-to-depth (both packing levels share
    unet_run's cascade); one epoch runs, losses finite."""
    from wt_pse_tpu.train.trainer import Trainer

    hparams = dict(default_hparams("Unet_nips2023_joint_shape_regularization"),
                   space_to_depth=True, space_to_depth_levels=2)
    train_doms, val_dom = _domains(fundus_root)
    trainer = Trainer(
        hparams=hparams, train_domains=train_doms, val_domain=val_dom,
        out_dir=str(tmp_path / "joint_s2d"), label="OD", batch_size=3,
        max_epoch=1, interval_validate=4, seed=1, image_size=SIZE,
        algorithm="Unet_nips2023_joint_shape_regularization",
    )
    best = trainer.train()
    assert len(best) == 6
    import json

    rec = json.loads(
        open(os.path.join(str(tmp_path / "joint_s2d"), "metrics.jsonl")).readline())
    assert np.isfinite(rec["loss_seg"]) and np.isfinite(rec["loss_seg_oc"])


def test_resume_roundtrip(fundus_root, tmp_path):
    from wt_pse_tpu.io.checkpoint import save_ensemble
    from wt_pse_tpu.train.trainer import Trainer

    hparams = default_hparams("WT_PSE")
    train_doms, val_dom = _domains(fundus_root)
    kw = dict(hparams=hparams, train_domains=train_doms, val_domain=val_dom,
              label="OD", batch_size=3, max_epoch=2, interval_validate=99,
              seed=1, image_size=SIZE)
    t1 = Trainer(out_dir=str(tmp_path / "a"), **kw)
    t1.train()
    ck = str(tmp_path / "a" / "manual_ck")
    save_ensemble(ck, t1.state)
    assert int(t1.state.step) == 2 * t1.iter_per_epoch

    t2 = Trainer(out_dir=str(tmp_path / "b"), resume=ck, **kw)
    assert t2.epoch == 2  # resumes past the trained epochs
    a = np.asarray(__import__("jax").tree.leaves(t1.state.od.params)[0])
    b = np.asarray(__import__("jax").tree.leaves(t2.state.od.params)[0])
    np.testing.assert_array_equal(a, b)


def test_resume_restores_best_tracking(fundus_root, tmp_path):
    """best.json written on each new best is read back by --resume, so a
    resumed run can't report only post-resume metrics or overwrite a better
    checkpoint with a worse one."""
    import json

    from wt_pse_tpu.io.checkpoint import save_ensemble
    from wt_pse_tpu.train.trainer import Trainer

    hparams = default_hparams("WT_PSE")
    train_doms, val_dom = _domains(fundus_root)
    kw = dict(hparams=hparams, train_domains=train_doms, val_domain=val_dom,
              label="OD", batch_size=3, max_epoch=1, interval_validate=99,
              seed=1, image_size=SIZE)
    t1 = Trainer(out_dir=str(tmp_path / "a"), **kw)
    t1.train()
    ck = str(tmp_path / "a" / "manual_ck")
    save_ensemble(ck, t1.state)
    best = {"objective": 0.93, "epoch": 7,
            "best_list": [0.9, 5.0, 1.0, 0.93, 4.0, 0.8]}
    with open(str(tmp_path / "a" / "best.json"), "w") as f:
        json.dump(best, f)

    t2 = Trainer(out_dir=str(tmp_path / "b"), resume=ck, **kw)
    assert t2.best == {"objective": 0.93, "epoch": 7}
    assert t2.best_list == best["best_list"]


def test_trainer_rejects_label_none(fundus_root, tmp_path):
    """The reference's 2-class (label=None) TRAINING path crashes as shipped
    (BCELoss shape mismatch); the Trainer refuses it with a clear error.
    (evaluate_domain still supports label=None for programmatic eval parity.)"""
    from wt_pse_tpu.train.trainer import Trainer

    train_doms, val_dom = _domains(fundus_root)
    with pytest.raises(ValueError, match="label must be"):
        Trainer(hparams=default_hparams("WT_PSE"), train_domains=train_doms,
                val_domain=val_dom, label=None, batch_size=3, max_epoch=1,
                out_dir=str(tmp_path), image_size=SIZE)


def test_loader_cache_distinguishes_domain4_crop(fundus_root):
    """splitid [4] (int, no crop) and ['4'] (string, reference crop quirk)
    must not alias to one npz cache entry (fundus.py cache key)."""
    from wt_pse_tpu.data.fundus import load_fundus

    a = load_fundus(fundus_root, "train", [4], size=SIZE, cache=True)
    b = load_fundus(fundus_root, "train", ["4"], size=SIZE, cache=True)
    a2 = load_fundus(fundus_root, "train", [4], size=SIZE, cache=True)
    # the cropped variant reads a (144,144)+512x512 window of a 64px source ->
    # mostly black; the uncropped one is random noise. If the cache aliased,
    # a2 would silently return b's arrays.
    assert not np.array_equal(np.asarray(a.images), np.asarray(b.images))
    np.testing.assert_array_equal(np.asarray(a.images), np.asarray(a2.images))
