"""End-to-end dress rehearsal vs the ACTUAL reference stack (VERDICT r3 #4).

The reference's one published result (README.md:29 — released-checkpoint OD
Dice/ASD via ``test_visulization.py``) cannot be reproduced in this zero-egress
environment (no dataset, no ``.pth.tar``). This file builds the closest
possible stand-in: the REAL ``/root/reference`` ``Trainer.train()`` (CPU-
shimmed, nothing else altered) trains for a few epochs on a synthetic Fundus
fixture, its own ``validate()`` writes a genuine ``checkpoint_{E}.pth.tar``
(``Trainer.py:276-288``) and returns its Dice/HD/ASD means — and then THIS
framework's ``cli.test_visualization`` must reproduce those numbers through
its full independent pipeline: PIL decode -> Normalize_tf -> torch-checkpoint
import -> two-stage jitted predict -> native-res upsample -> postprocessing ->
metrics (``test_visulization.py:45-277`` / ``Trainer.py:137-311`` parity).

Environment shims (import plumbing only, no reference math touched):

- ``.cuda()`` no-oped (the reference hardcodes device placement);
- ``pytz``/``torchvision.make_grid`` stubbed (timestamps / TB image grids);
- ``medpy.metric.binary`` is NOT INSTALLED here, so both sides use this
  repo's ``ops.metrics.hd95/asd``. That makes the HD/ASD comparison pin the
  surrounding *pipeline* (resize, threshold, postprocessing, mask encoding)
  rather than the metric kernel itself — whose medpy-semantics parity is
  separately golden-tested in ``tests/test_metrics_postprocess.py``.
"""

from __future__ import annotations

import importlib
import os
import sys
import types

import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow  # trains real torch CPU epochs at 256^2

REF = "/root/reference"


def _write_domain(root, dom, phase, n, size):
    from PIL import Image

    d = os.path.join(root, f"Domain{dom}", phase, "ROIs")
    os.makedirs(os.path.join(d, "image"), exist_ok=True)
    os.makedirs(os.path.join(d, "mask"), exist_ok=True)
    prefix = {1: "gd", 2: "g", 3: "G", 4: "V"}[dom]
    rng = np.random.RandomState(dom * 31 + (phase == "test"))
    for i in range(n):
        img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
        yy, xx = np.mgrid[0:size, 0:size]
        cy = size / 2 + rng.randint(-size // 10, size // 10)
        cx = size / 2 + rng.randint(-size // 10, size // 10)
        disc = ((yy - cy) ** 2 + (xx - cx) ** 2) < (size / 3) ** 2
        cup = ((yy - cy) ** 2 + (xx - cx) ** 2) < (size / 6) ** 2
        # make the disc visually distinct so 4 epochs learn something
        img[disc] = (img[disc] * 0.4 + 120).astype(np.uint8)
        img[cup] = (img[cup] * 0.4).astype(np.uint8)
        mask = np.full((size, size), 255, np.uint8)
        mask[disc] = 128
        mask[cup] = 0
        Image.fromarray(img).save(os.path.join(d, "image", f"{prefix}_{i}.png"))
        Image.fromarray(mask).save(os.path.join(d, "mask", f"{prefix}_{i}.png"))


@pytest.fixture(scope="module")
def fundus_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fundus_rehearsal"))
    for dom in (1, 2, 4):
        _write_domain(root, dom, "train", 3, size=128)  # loader resizes to 256
    _write_domain(root, 3, "test", 4, size=96)  # native-res labels at 96^2
    return root


@pytest.fixture(scope="module")
def refstack():
    """Import the full reference stack with the documented shims."""
    # pytz: Trainer stamps its start time; any tzinfo will do
    if "pytz" not in sys.modules:
        import datetime as _dt

        pytz = types.ModuleType("pytz")
        pytz.timezone = lambda name: _dt.timezone.utc
        sys.modules["pytz"] = pytz
    # torchvision: make_grid only feeds tensorboard image grids; transforms
    # needs a working Compose (train.py:58-67 pipelines). Attributes are
    # (re)set even if another test file already stubbed the module.
    tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
    tv.models = getattr(tv, "models", None) or types.ModuleType(
        "torchvision.models")
    tvu = types.ModuleType("torchvision.utils")
    tvu.make_grid = lambda t, *a, **k: (
        t if t.dim() == 3 else t.reshape(-1, *t.shape[-2:]))
    tvt = types.ModuleType("torchvision.transforms")

    class _Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    tvt.Compose = _Compose
    tv.utils, tv.transforms = tvu, tvt
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv.models
    sys.modules["torchvision.utils"] = tvu
    sys.modules["torchvision.transforms"] = tvt
    # medpy: absent in this env; route to this repo's medpy-semantics kernels
    if "medpy" not in sys.modules:
        from wt_pse_tpu.ops import metrics as M

        medpy = types.ModuleType("medpy")
        metric = types.ModuleType("medpy.metric")
        binary = types.ModuleType("medpy.metric.binary")
        binary.hd95 = M.hd95
        binary.asd = M.asd
        metric.binary = binary
        medpy.metric = metric
        sys.modules["medpy"] = medpy
        sys.modules["medpy.metric"] = metric
        sys.modules["medpy.metric.binary"] = binary
    sys.modules.setdefault("torchfile", types.ModuleType("torchfile"))
    # skimage: absent in this env; the reference's validate path needs exactly
    # measure.label + regionprops (get_largest_fillhole, utils.py:267-276).
    # Stub on scipy.ndimage.label with 8-connectivity — skimage's 2-D default
    # (connectivity = ndim) — with regionprops ordered by label id, which the
    # reference's `idx_max + 1` indexing depends on. find_contours maps to
    # this repo's point-set equivalent (unused in validate; save_per_img only).
    if "skimage" not in sys.modules:
        import scipy.ndimage as _ndi

        from wt_pse_tpu.utils.visualization import find_contour_points

        sk = types.ModuleType("skimage")
        measure = types.ModuleType("skimage.measure")

        def _label(binary):
            lab, _ = _ndi.label(np.asarray(binary) > 0,
                                structure=np.ones((3, 3), int))
            return lab

        class _Region:
            def __init__(self, area):
                self.area = area

        measure.label = _label
        measure.regionprops = lambda lab: [
            _Region(int((lab == k).sum())) for k in range(1, int(lab.max()) + 1)]
        measure.find_contours = lambda a, level=0.5: [
            find_contour_points(np.asarray(a, np.float64), level)]
        morph = types.ModuleType("skimage.morphology")
        for name in ("disk", "erosion", "dilation", "opening", "closing",
                     "white_tophat", "binary_erosion"):
            setattr(morph, name, lambda *a, **k: None)
        transform = types.ModuleType("skimage.transform")
        transform.rotate = transform.resize = lambda *a, **k: None
        draw = types.ModuleType("skimage.draw")
        sk.measure, sk.morphology = measure, morph
        sk.transform, sk.draw = transform, draw
        sys.modules.update({
            "skimage": sk, "skimage.measure": measure,
            "skimage.morphology": morph, "skimage.transform": transform,
            "skimage.draw": draw})

    orig_t, orig_m = torch.Tensor.cuda, torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    sys.path.insert(0, REF)
    try:
        mods = {name: importlib.import_module(name)
                for name in ("hparams_registry", "algorithms", "shape_networks",
                             "Trainer", "fundus_dataloader",
                             "custom_transforms")}
        yield mods
    finally:
        sys.path.remove(REF)
        torch.Tensor.cuda, torch.nn.Module.cuda = orig_t, orig_m


@pytest.mark.parametrize("label", ["OD", "OC"])
def test_reference_training_checkpoint_reproduced_by_eval_cli(
        refstack, fundus_root, tmp_path, label):
    """Train the REAL reference Trainer 4 epochs -> its validate() saves a
    genuine .pth.tar and returns Dice/HD/ASD -> our eval CLI must reproduce
    every metric through the full independent pipeline. Parametrized over the
    two label modes: OD keys the objective to disc dice, OC to cup
    (Trainer.py:269-274), with the label threading through the loader,
    postprocessing and dice channel selection on both stacks."""
    import random

    from torch.utils.data import DataLoader
    from torchvision import transforms

    hr = refstack["hparams_registry"]
    algorithms = refstack["algorithms"]
    shape_networks = refstack["shape_networks"]
    RefTrainer = refstack["Trainer"].Trainer
    DL = refstack["fundus_dataloader"]
    tr = refstack["custom_transforms"]

    # ---- the reference construction, train.py:56-169 verbatim -------------
    hp = dict(hr.default_hparams("WT_PSE", "Fundus"))
    torch.manual_seed(42)
    np.random.seed(42)
    random.seed(42)

    composed_tr = transforms.Compose([
        tr.Resize(256), tr.RandomScaleCrop(256), tr.Normalize_tf(),
        tr.ToTensor()])
    composed_ts = transforms.Compose([
        tr.Resize(256), tr.Normalize_tf(), tr.ToTensor()])

    dataset_list = {}
    for i in (1, 2, 4):
        dataset_list[f"site{i}"] = DL.FundusSegmentation(
            base_dir=fundus_root, phase="train", splitid=[i],
            transform=composed_tr)
    domain_val = DL.FundusSegmentation(
        base_dir=fundus_root, phase="test", splitid=[3],
        transform=composed_ts, state="prediction", label=label)
    val_loader = DataLoader(domain_val, batch_size=4, shuffle=False,
                            num_workers=0)

    per_domain_batch = 9 // 3
    mk_main = lambda two_step: algorithms.WT_PSE(
        n_channels=3, n_classes=1, hparams=hp, device="cpu",
        two_step=two_step, per_domain_batch=per_domain_batch,
        source_domain_num=3)
    mk_stud = lambda: shape_networks.ShapeVariationalDist_x(
        hp, "cpu", n_classes=1, number_source_domain=3,
        batch_size=per_domain_batch)
    model_od, model_oc = mk_main(False), mk_main(True)
    stud_od, stud_oc = mk_stud(), mk_stud()
    adam = lambda m, lr: torch.optim.Adam(m.parameters(), lr=lr,
                                          betas=(0.9, 0.99))

    args = types.SimpleNamespace(label=label, datasetTest=[3])
    out = str(tmp_path / "ref_run")
    trainer = RefTrainer(
        algo="WT_PSE", cuda=False, hparams=hp, args=args,
        model=model_od, model_shape=stud_od, model_oc=model_oc,
        model_shape_oc=stud_oc, lr=5e-4, lr_shape=5e-4, lr_oc=5e-4,
        lr_shape_oc=5e-4, train_loader=dataset_list, val_loader=val_loader,
        optim=adam(model_od, 5e-4), optim_shape=adam(stud_od, 5e-4),
        optim_oc=adam(model_oc, 5e-4), optim_shape_oc=adam(stud_oc, 5e-4),
        out=out, max_epoch=4, stop_epoch=99, interval_validate=4,
        batch_size=9)

    # 4 epochs (3 imgs/domain -> iter_per_epoch = 1); validate fires at epoch 3
    # ((3+1) % 4 == 0 and 3 > 2, Trainer.py:1048) and saves the best checkpoint
    best = trainer.train()
    cup_dice, cup_hd, cup_asd, disc_dice, disc_hd, disc_asd = best
    assert (disc_dice if label == "OD" else cup_dice) > 0, \
        "reference validate never registered a best"
    ckpt = os.path.join(out, f"checkpoint_{trainer.best_epoch}.pth.tar")
    assert os.path.exists(ckpt)

    # ---- our full product pipeline on the reference's own checkpoint ------
    from wt_pse_tpu.cli.test_visualization import main as eval_main

    res = eval_main(["--datasetTest", "3", "--label", label,
                     "--data-dir", fundus_root, "--model-file", ckpt,
                     "--out", str(tmp_path / "vis"), "--batch-size", "4",
                     "--save-images"])

    # Dice: smoothed-dice over ~3k-px discs; a handful of borderline
    # threshold-flip pixels move it at the 1e-3 level. HD95/ASD: surface
    # distances in pixels at 96^2; sub-pixel logit noise flips boundary
    # pixels, bounded at a half-pixel. These bounds fail loudly for any seam
    # error (wrong resize semantics, mask encoding, postproc order, channel
    # swap — each shifts Dice by >1e-2 or distances by pixels).
    np.testing.assert_allclose(res["disc_dice"], disc_dice, atol=5e-3)
    np.testing.assert_allclose(res["cup_dice"], cup_dice, atol=5e-3)
    np.testing.assert_allclose(res["disc_hd"], disc_hd, atol=0.6)
    np.testing.assert_allclose(res["cup_hd"], cup_hd, atol=0.6)
    np.testing.assert_allclose(res["disc_asd"], disc_asd, atol=0.3)
    np.testing.assert_allclose(res["cup_asd"], cup_asd, atol=0.3)
    # objective keying parity (Trainer.py:269-274)
    want_obj = "disc_dice" if label == "OD" else "cup_dice"
    assert res["objective"] == res[want_obj]
    # the overlay artifacts of BASELINE config 1 exist
    assert os.path.exists(str(tmp_path / "vis" / "overlay" / "1.bmp"))
    assert os.path.exists(str(tmp_path / "vis" / "original_image" / "1.bmp"))


def test_reference_joint_training_checkpoint_reproduced_by_eval_cli(
        refstack, fundus_root, tmp_path, monkeypatch):
    """The JOINT-algorithm seam, closed the same way as WT_PSE's (r4 VERDICT
    missing #3): the REAL reference Trainer dispatches to
    ``train_epoch_joint_shape_reg``/``validate_joint_shape_reg``
    (``Trainer.py:1032-1035,1050-1053`` via 492-727/314-490), trains
    ``Unet_nips2023_joint_shape_regularization`` end to end, its validate
    saves a genuine 4-net ``.pth.tar`` — and our eval CLI must reproduce its
    metrics through ``--algorithm Unet_nips2023_joint_shape_regularization``.

    The reference joint class cannot construct as shipped
    (``ShapeVariationalDist_x`` is an undefined name inside ``algorithms.py``
    and is called with a different arity than the ``shape_networks`` class) —
    repaired mechanically exactly as in ``test_reference_parity.py::
    test_joint_update_whitening_matches_reference``: bind the class and adapt
    the two call signatures; no math altered. ``models/joint.py`` documents
    the same repair on our side."""
    import random

    from torch.utils.data import DataLoader
    from torchvision import transforms

    hr = refstack["hparams_registry"]
    algorithms = refstack["algorithms"]
    shape_networks = refstack["shape_networks"]
    RefTrainer = refstack["Trainer"].Trainer
    DL = refstack["fundus_dataloader"]
    tr = refstack["custom_transforms"]
    ALGO = "Unet_nips2023_joint_shape_regularization"
    label = "OD"

    class RepairedPrior(shape_networks.ShapeVariationalDist_x):
        def __init__(self, hparams, device, n_channels, bilinear, n_classes,
                     wt=True, prior=True, number_source_domain=3):
            super().__init__(hparams, device, n_classes,
                             number_source_domain=number_source_domain,
                             batch_size=3)

        def sample_forward(self, inputs, mask=None, training=True):
            return super().sample_forward(inputs, training)

    monkeypatch.setattr(algorithms, "ShapeVariationalDist_x", RepairedPrior,
                        raising=False)

    hp = dict(hr.default_hparams(ALGO, "Fundus"))
    torch.manual_seed(42)
    np.random.seed(42)
    random.seed(42)

    composed_tr = transforms.Compose([
        tr.Resize(256), tr.RandomScaleCrop(256), tr.Normalize_tf(),
        tr.ToTensor()])
    composed_ts = transforms.Compose([
        tr.Resize(256), tr.Normalize_tf(), tr.ToTensor()])

    dataset_list = {}
    for i in (1, 2, 4):
        dataset_list[f"site{i}"] = DL.FundusSegmentation(
            base_dir=fundus_root, phase="train", splitid=[i],
            transform=composed_tr)
    domain_val = DL.FundusSegmentation(
        base_dir=fundus_root, phase="test", splitid=[3],
        transform=composed_ts, state="prediction", label=label)
    val_loader = DataLoader(domain_val, batch_size=4, shuffle=False,
                            num_workers=0)

    mk_main = lambda two_step: getattr(algorithms, ALGO)(
        n_channels=3, n_classes=1, hparams=hp, device="cpu",
        two_step=two_step, per_domain_batch=3, source_domain_num=3)
    mk_stud = lambda: shape_networks.ShapeVariationalDist_x(
        hp, "cpu", n_classes=1, number_source_domain=3, batch_size=3)
    model_od, model_oc = mk_main(False), mk_main(True)
    stud_od, stud_oc = mk_stud(), mk_stud()  # ride along into the checkpoint
    adam = lambda m, lr: torch.optim.Adam(m.parameters(), lr=lr,
                                          betas=(0.9, 0.99))

    args = types.SimpleNamespace(label=label, datasetTest=[3])
    out = str(tmp_path / "ref_joint_run")
    trainer = RefTrainer(
        algo=ALGO, cuda=False, hparams=hp, args=args,
        model=model_od, model_shape=stud_od, model_oc=model_oc,
        model_shape_oc=stud_oc, lr=5e-4, lr_shape=5e-4, lr_oc=5e-4,
        lr_shape_oc=5e-4, train_loader=dataset_list, val_loader=val_loader,
        optim=adam(model_od, 5e-4), optim_shape=adam(stud_od, 5e-4),
        optim_oc=adam(model_oc, 5e-4), optim_shape_oc=adam(stud_oc, 5e-4),
        out=out, max_epoch=4, stop_epoch=99, interval_validate=4,
        batch_size=9)

    best = trainer.train()
    cup_dice, cup_hd, cup_asd, disc_dice, disc_hd, disc_asd = best
    # the joint validate keys is_best on cup dice unconditionally
    # (Trainer.py:455-458) and smoothed dice is always > 0
    assert cup_dice > 0, "joint validate never registered a best"
    ckpt = os.path.join(out, f"checkpoint_{trainer.best_epoch}.pth.tar")
    assert os.path.exists(ckpt)

    from wt_pse_tpu.cli.test_visualization import main as eval_main

    res = eval_main(["--datasetTest", "3", "--label", label,
                     "--algorithm", ALGO,
                     "--data-dir", fundus_root, "--model-file", ckpt,
                     "--out", str(tmp_path / "vis_joint"), "--batch-size", "4",
                     "--save-images"])

    # same tolerance rationale as the WT_PSE rehearsal above
    np.testing.assert_allclose(res["disc_dice"], disc_dice, atol=5e-3)
    np.testing.assert_allclose(res["cup_dice"], cup_dice, atol=5e-3)
    np.testing.assert_allclose(res["disc_hd"], disc_hd, atol=0.6)
    np.testing.assert_allclose(res["cup_hd"], cup_hd, atol=0.6)
    np.testing.assert_allclose(res["disc_asd"], disc_asd, atol=0.3)
    np.testing.assert_allclose(res["cup_asd"], cup_asd, atol=0.3)
    assert os.path.exists(str(tmp_path / "vis_joint" / "overlay" / "1.bmp"))
