"""Device-resident validation metrics vs the host (scipy/medpy-parity) oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from wt_pse_tpu.ops import metrics as M
from wt_pse_tpu.ops.postprocess import largest_component_fill_holes_scipy
from wt_pse_tpu.train.eval_device import device_metrics


def _blob(hw, cy, cx, r):
    yy, xx = np.mgrid[0:hw, 0:hw]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r)


def test_device_metrics_match_host(rng):
    hw, b = 64, 3
    od_logits = np.full((b, hw, hw), -8.0, np.float32)
    oc_logits = np.full((b, hw, hw), -8.0, np.float32)
    od_gt = np.zeros((b, hw, hw), np.float32)
    oc_gt = np.zeros((b, hw, hw), np.float32)
    for i in range(b):
        cy, cx = rng.randint(20, 44, 2)
        od_logits[i][_blob(hw, cy, cx, 12)] = 8.0
        od_logits[i][_blob(hw, 5, 5, 2)] = 8.0  # speck for LCC to remove
        oc_logits[i][_blob(hw, cy, cx, 6)] = 8.0
        od_gt[i][_blob(hw, cy + 1, cx - 1, 12)] = 1.0
        oc_gt[i][_blob(hw, cy + 1, cx - 1, 6)] = 1.0

    got = {k: np.asarray(v) for k, v in device_metrics(
        jnp.asarray(od_logits), jnp.asarray(oc_logits),
        jnp.asarray(od_gt), jnp.asarray(oc_gt)).items()}

    for i in range(b):
        pred_od = largest_component_fill_holes_scipy(
            (1 / (1 + np.exp(-od_logits[i].astype(np.float64))) > 0.75)
            .astype(np.uint8))
        pred_oc = largest_component_fill_holes_scipy(
            (1 / (1 + np.exp(-oc_logits[i].astype(np.float64))) > 0.75)
            .astype(np.uint8))
        np.testing.assert_allclose(got["disc_dice"][i],
                                   M.dice_binary(pred_od, od_gt[i]), rtol=1e-5)
        np.testing.assert_allclose(got["cup_dice"][i],
                                   M.dice_binary(pred_oc, oc_gt[i]), rtol=1e-5)
        np.testing.assert_allclose(got["disc_asd"][i],
                                   M.asd(pred_od, od_gt[i] > 0.5), rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(got["disc_hd"][i],
                                   M.hd95(pred_od, od_gt[i] > 0.5), rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(got["cup_asd"][i],
                                   M.asd(pred_oc, oc_gt[i] > 0.5), rtol=1e-4,
                                   atol=1e-4)


def test_device_metrics_empty_prediction_guard(rng):
    hw = 32
    od_logits = np.full((1, hw, hw), -8.0, np.float32)  # empty prediction
    oc_logits = np.full((1, hw, hw), -8.0, np.float32)
    gt = np.zeros((1, hw, hw), np.float32)
    gt[0][_blob(hw, 16, 16, 6)] = 1.0
    m = device_metrics(jnp.asarray(od_logits), jnp.asarray(oc_logits),
                       jnp.asarray(gt), jnp.asarray(gt))
    assert float(m["disc_hd"][0]) == 100.0
    assert float(m["disc_asd"][0]) == 100.0


def test_device_metrics_empty_gt_guard(rng):
    """Empty GROUND TRUTH with a nonempty prediction: every distance to the gt
    surface is +inf (EDT of an empty mask) — the guard must return the 100.0
    sentinel, not let inf poison the domain means (the host path raises and
    medpy crashes on this input; this sync-free path degrades gracefully)."""
    hw = 32
    logits = np.full((1, hw, hw), -8.0, np.float32)
    logits[0][_blob(hw, 16, 16, 6)] = 8.0  # nonempty prediction
    empty_gt = np.zeros((1, hw, hw), np.float32)
    m = device_metrics(jnp.asarray(logits), jnp.asarray(logits),
                       jnp.asarray(empty_gt), jnp.asarray(empty_gt))
    for k in ("disc_hd", "disc_asd", "cup_hd", "cup_asd"):
        v = float(m[k][0])
        assert np.isfinite(v) and v == 100.0, (k, v)


def test_device_hd95_uses_pooled_percentile():
    """Same medpy-aggregation regression as the host test: a pred box whose
    surface lies on the gt surface plus a distant gt speck — pooled p95 = 0,
    max-of-per-direction-p95 > 10 (the pre-fix device path returned the max)."""
    hw = 64
    logits = np.full((1, hw, hw), -8.0, np.float32)
    logits[0, 10:36, 10:36] = 8.0  # pred = 26x26 box (LCC keeps it intact)
    gt = np.zeros((1, hw, hw), np.float32)
    gt[0, 10:36, 10:36] = 1.0
    gt[0, 45:48, 45:48] = 1.0  # + distant speck: >5% of d(gt->pred), <5% pooled
    m = device_metrics(jnp.asarray(logits), jnp.asarray(logits),
                       jnp.asarray(gt), jnp.asarray(gt))
    pred = largest_component_fill_holes_scipy(
        (1 / (1 + np.exp(-logits[0].astype(np.float64))) > 0.75).astype(np.uint8))
    want = M.hd95(pred, gt[0] > 0.5)
    assert want == 0.0  # medpy semantics on this construction
    np.testing.assert_allclose(float(m["disc_hd"][0]), want, atol=1e-5)


@pytest.mark.slow  # trainer build + two validation compiles (~30s); scripts/test.sh --slow
def test_trainer_fast_validation_flag(tmp_path, rng):
    from wt_pse_tpu.config import default_hparams
    from wt_pse_tpu.data.fundus import FundusDomain
    from wt_pse_tpu.train.trainer import Trainer

    def dom(seed):
        rr = np.random.RandomState(seed)
        return FundusDomain(
            images=(rr.rand(6, 32, 32, 3) * 255).astype(np.uint8),
            labels=rr.choice([0, 128, 255], size=(6, 32, 32)).astype(np.uint8),
            names=list("abcdef"))

    val = FundusDomain(images=dom(9).images, labels=[l for l in dom(9).labels],
                       names=list("abcdef"))
    t = Trainer(hparams=default_hparams("WT_PSE"),
                train_domains=[dom(1), dom(2), dom(3)], val_domain=val,
                out_dir=str(tmp_path / "fv"), label="OD", batch_size=3,
                max_epoch=1, interval_validate=99, seed=1, image_size=32,
                fast_validation=True, eval_batch_size=4)
    res = t.validate()
    for k in ("cup_dice", "disc_dice", "cup_hd", "disc_hd", "cup_asd",
              "disc_asd", "objective"):
        assert k in res and np.isfinite(res[k])
