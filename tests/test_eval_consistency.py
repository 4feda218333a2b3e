"""Host-vs-device validation consistency: the model-selection contract.

``Trainer(fast_validation=True)`` swaps the host validator (native-resolution
bilinear upsample + C++/scipy LCC + medpy-semantics metrics,
``train/eval.py``) for the sync-free device validator (network resolution,
jittable LCC, exact-EDT surface metrics, ``train/eval_device.py``). The two
paths legitimately differ — resolution, empty-GT handling (raise vs 100.0
sentinel), post-processing engine — but what ``fast_validation=True`` actually
changes in a run is WHICH epoch wins best-checkpoint selection. This test pins
that contract (r4 VERDICT #4): across snapshots of one real training
trajectory, both paths must

1. pick the same best snapshot (the ``objective`` argmax),
2. agree on the objective to a quantified offset (bound stated below), and
3. agree on surface metrics once the resolution scale is accounted for.

Reference seams: ``Trainer.py:269-288`` (selection), ``Trainer.py:206-239``
(host metric path).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wt_pse_tpu.config import default_hparams
from wt_pse_tpu.data.fundus import load_fundus

from test_trainer_e2e import _write_domain

pytestmark = pytest.mark.slow  # trains a real (tiny) trajectory; CPU ~2-4 min

SIZE = 64          # network resolution (keeps CPU compiles fast)
NATIVE = 96        # native label resolution of the synthetic val set
EPOCHS_PER_SNAP = 2
SNAPS = 3          # 6 epochs x 4 steps total — the 1-core CI budget


@pytest.fixture(scope="module")
def fundus_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fundus_evalpaths"))
    for dom in (1, 2, 4):
        _write_domain(root, dom, "train", 12, hw=SIZE, native=NATIVE)
    _write_domain(root, 3, "test", 3, hw=SIZE, native=NATIVE)
    return root


def test_host_and_device_validation_select_the_same_model(fundus_root, tmp_path):
    from wt_pse_tpu.train.eval import evaluate_domain
    from wt_pse_tpu.train.eval_device import evaluate_domain_device
    from wt_pse_tpu.train.trainer import Trainer

    trainer = Trainer(
        hparams=default_hparams("WT_PSE"),
        train_domains=[load_fundus(fundus_root, "train", [i], size=SIZE)
                       for i in (1, 2, 4)],
        val_domain=load_fundus(fundus_root, "test", [3], state="prediction",
                               size=SIZE),
        out_dir=str(tmp_path / "run"),
        label="OD", batch_size=9, max_epoch=1, interval_validate=99, seed=3,
        image_size=SIZE, val_visualization=False, dp=False,
        fast_validation=True)  # precomputes the network-res masks both
    # validators below consume; each path is still invoked explicitly

    # drive the production epoch program directly; snapshot every EPOCHS_PER_SNAP
    # (=2) epochs, SNAPS snapshots total
    # (epoch_step donates its input state, so snapshots are explicit copies)
    state = trainer.state
    snaps = []
    for seg in range(SNAPS):
        for e in range(EPOCHS_PER_SNAP):
            epoch = seg * EPOCHS_PER_SNAP + e
            state, _ = trainer.epoch_step(
                state, trainer.data, trainer.run_key,
                epoch * trainer.iter_per_epoch, trainer.iter_per_epoch)
        snaps.append(jax.tree.map(jnp.copy, state))

    host, dev = [], []
    for snap in snaps:
        variables = (snap.od.variables, snap.od_shape.variables,
                     snap.oc.variables, snap.oc_shape.variables)
        host.append(evaluate_domain(
            trainer.predict_fn, variables, trainer.val_images,
            trainer.val_od, trainer.val_oc, "OD", trainer.eval_batch_size))
        dev.append(evaluate_domain_device(
            trainer.predict_fn, variables, trainer.val_images,
            trainer._val_od_256, trainer._val_oc_256, "OD",
            trainer.eval_batch_size))

    h_obj = np.array([m["objective"] for m in host])
    d_obj = np.array([m["objective"] for m in dev])

    # the trajectory must actually train (otherwise argmax is a coin flip and
    # the test has no power): demand a clear spread across snapshots
    assert h_obj.max() - h_obj.min() > 0.15, (
        f"trajectory did not differentiate snapshots: host objectives {h_obj}")

    # 1. the model-selection decision itself
    assert int(h_obj.argmax()) == int(d_obj.argmax()), (
        f"host selects snapshot {h_obj.argmax()} ({h_obj}) but "
        f"fast_validation selects {d_obj.argmax()} ({d_obj})")

    # 2. quantified objective offset. Sources: 96-vs-64 scoring resolution
    #    (bilinear logit upsample + GT re-threshold) and scipy-vs-device LCC.
    #    Measured on this fixture: max offset 0.017 (bound 4x).
    off = np.abs(h_obj - d_obj)
    assert off.max() < 0.07, (
        f"objective offset host-vs-device too large: {off} "
        f"(host {h_obj}, device {d_obj})")

    # 3. surface metrics agree once the resolution scale (96/64) is removed;
    #    only meaningful for the best (non-degenerate) snapshot — early ones
    #    may hit the empty-pred 100.0 sentinel on either path. Bound: 25%
    #    relative + 1 px, covering sub-pixel boundary shifts from the
    #    resolution change (measured best-snapshot disc ASD: host ~1-3 px
    #    at 96², device ~scale-matched within a pixel).
    b = int(h_obj.argmax())
    scale = NATIVE / SIZE
    for k in ("disc_asd", "disc_hd"):
        hv, dv = host[b][k], dev[b][k] * scale
        if hv >= 100.0 or dev[b][k] >= 100.0:  # sentinel on either side
            continue
        assert abs(hv - dv) <= 0.25 * max(hv, dv) + 1.0 * scale, (
            f"{k}: host {hv} vs scaled device {dv}")

    # offsets documented for the ledger (shown with pytest -s)
    print(f"[eval-consistency] host obj {h_obj} device obj {d_obj} "
          f"max offset {off.max():.4f}")
