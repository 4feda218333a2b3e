"""The one-call inference API (`wt_pse_tpu.load_predictor`)."""

import numpy as np
import pytest
import torch

import jax

pytestmark = pytest.mark.slow  # compiles the two-stage predict (CPU ~1 min)

HW = 64


def _reference_format_ckpt(path):
    """A reference-layout .pth.tar ({model, model_shape, model_oc,
    model_oc_shape}, Trainer.py:282-288) from the golden torch mirrors."""
    import torch_ref

    torch.manual_seed(3)
    return_path = str(path / "checkpoint_1.pth.tar")
    torch.save({
        "model": torch_ref.WTPSE(16).state_dict(),
        "model_shape": torch_ref.Student(16).state_dict(),
        "model_oc": torch_ref.WTPSE(16).state_dict(),
        "model_oc_shape": torch_ref.Student(16).state_dict(),
    }, return_path)
    return return_path


def test_load_predictor_torch_ckpt(tmp_path):
    import wt_pse_tpu as w

    ckpt = _reference_format_ckpt(tmp_path)
    predict = w.load_predictor(ckpt)
    rng = np.random.RandomState(0)
    imgs = (rng.rand(2, HW, HW, 3) * 255).astype(np.uint8)
    out = predict(imgs)
    assert set(out) == {"od", "oc", "od_logits", "oc_logits"}
    assert out["od_logits"].shape == (2, HW, HW, 1)
    assert out["od"].shape == (2, HW, HW) and out["od"].dtype == np.uint8
    assert np.isfinite(out["od_logits"]).all()
    # uint8 and pre-normalized float inputs give the same result
    out2 = predict(imgs.astype(np.float32) / 127.5 - 1.0, postprocess=False)
    np.testing.assert_allclose(out2["oc_logits"], out["oc_logits"], atol=1e-6)
    # a single unbatched image is auto-batched
    one = predict(imgs[0], postprocess=False)
    assert one["od_logits"].shape == (1, HW, HW, 1)


def test_predictor_native_resolution_resize(tmp_path):
    """Non-network-resolution inputs take the reference pipeline: LANCZOS
    down to the network size (fundus_dataloader.py:164-197), predict, logits
    bilinearly upsampled back to the input resolution before post-processing
    (Trainer.py:206-209) — outputs come back at the INPUT resolution, and the
    convnets never run off-distribution at native size."""
    import wt_pse_tpu as w

    ckpt = _reference_format_ckpt(tmp_path)
    p = w.load_predictor(ckpt)
    p._size = HW  # shrink the network resolution for CPU test speed
    rng = np.random.RandomState(2)
    native = (rng.rand(2, 96, 96, 3) * 255).astype(np.uint8)
    out = p(native)
    assert out["od_logits"].shape == (2, 96, 96, 1)
    assert out["od"].shape == (2, 96, 96)
    assert np.isfinite(out["od_logits"]).all()
    # float [-1,1] input resizes through the same uint8 LANCZOS parity path
    out_f = p(native.astype(np.float32) / 127.5 - 1.0, postprocess=False)
    np.testing.assert_allclose(out_f["od_logits"], out["od_logits"], atol=1e-5)


def test_predictor_two_class_channel_convention():
    """With ``label=None`` (2-class checkpoints) the channel convention is
    [cup, disc] (utils.py:298-329): the ``od`` mask must come from channel 1,
    not channel 0 (which is the cup) — ADVICE r4. Stubbed predict_fn, so this
    is a fast unit test of the Predictor postprocessing alone."""
    from wt_pse_tpu.api import Predictor

    H = 32
    cup = np.full((H, H), -10.0)
    cup[12:20, 12:20] = 10.0
    disc = np.full((H, H), -10.0)
    disc[6:26, 6:26] = 10.0
    logits = np.stack([cup, disc], -1)[None].astype(np.float32)

    p = Predictor(lambda arr: (logits, logits), (), label=None, image_size=H)
    out = p(np.zeros((1, H, H, 3), np.float32))
    disc_mask = (disc > 0).astype(np.uint8)
    cup_mask = (cup > 0).astype(np.uint8)
    np.testing.assert_array_equal(out["od"][0], disc_mask)
    np.testing.assert_array_equal(out["oc"][0], cup_mask)


def test_load_predictor_orbax_dir(tmp_path):
    import wt_pse_tpu as w
    from wt_pse_tpu.config import default_hparams
    from wt_pse_tpu.io.checkpoint import save_ensemble
    from wt_pse_tpu.models.common import ModelConfig
    from wt_pse_tpu.models.shape_prior import ShapeStudent
    from wt_pse_tpu.models.wt_pse import WTPSE
    from wt_pse_tpu.train.state import init_ensemble

    cfg = ModelConfig.from_hparams(default_hparams("WT_PSE"))
    nets = (WTPSE(cfg), ShapeStudent(cfg), WTPSE(cfg, two_step=True),
            ShapeStudent(cfg))
    state, _ = init_ensemble(*nets, (1, HW, HW, 3), jax.random.PRNGKey(0))
    ck = str(tmp_path / "ensemble")
    save_ensemble(ck, state)

    predict = w.load_predictor(ck)
    imgs = (np.random.RandomState(1).rand(1, HW, HW, 3) * 255).astype(np.uint8)
    out = predict(imgs)
    assert out["oc"].shape == (1, HW, HW)
    assert np.isfinite(out["oc_logits"]).all()
