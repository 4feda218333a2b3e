"""Benchmark: WT-PSE 4-phase training throughput (images/sec/chip).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

``value``       — steady-state throughput of the full jitted 4-phase train step
                  (OD seg + OD shape KD + OC seg + OC shape KD, whitening+MMD
                  losses, batch 9 at 256², the reference's default config) on the
                  default JAX backend (the TPU chip under the driver), in the
                  recommended production training mode: bf16 MXU compute with
                  f32 master params / BN stats / losses (hparam
                  ``compute_dtype=bfloat16``), driven as the Trainer does — one
                  lax.scan program per epoch. Convergence of this mode is gated
                  by tests/test_train_step.py::test_bf16_mode_step_learns and
                  was verified end-to-end on-chip. Timed with forced value
                  fetches (see note in ``jax_train_ips`` — ``block_until_ready``
                  is unreliable on the axon tunnel and earlier rounds' numbers
                  measured enqueue rate, not execution).
``vs_baseline`` — ratio vs the PyTorch-CPU reference-equivalent iteration
                  (BASELINE.md target: >=5x). The torch baseline mirrors the
                  reference's per-iteration work (6 U-Net-scale forwards,
                  4 backwards, 4 Adam steps — SURVEY.md §3.1) using the golden
                  modules in tests/torch_ref.py; it is measured once and cached
                  in .bench_cache.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

B, HW = 9, 256
CACHE = os.path.join(ROOT, ".bench_cache.json")


def torch_cpu_baseline_ips(n_steps: int = 2) -> float:
    """Reference-equivalent torch-CPU iteration: phase1 OD seg (fwd+bwd+Adam),
    phase2 teacher fwd + student fwd/bwd/Adam, phases 3-4 on the ROI."""
    if os.path.exists(CACHE):
        try:
            return float(json.load(open(CACHE))["torch_cpu_ips"])
        except Exception:
            pass

    import torch
    import torch_ref

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)
    main_od, stud_od = torch_ref.WTPSE(16), torch_ref.Student(16)
    main_oc, stud_oc = torch_ref.WTPSE(16), torch_ref.Student(16)
    opts = [torch.optim.Adam(m.parameters(), lr=5e-4, betas=(0.9, 0.99))
            for m in (main_od, stud_od, main_oc, stud_oc)]
    bce = torch.nn.BCELoss()
    mse = torch.nn.MSELoss()

    img = torch.rand(B, 3, HW, HW) * 2 - 1
    tgt_od = (torch.rand(B, 1, HW, HW) > 0.7).float()
    tgt_oc = (torch.rand(B, 1, HW, HW) > 0.9).float()
    eps = torch.randn(B, 1, HW, HW)

    def whitening_penalty(feats):
        total = 0.0
        for z in feats[:2]:
            b, c, h, w = z.shape
            f = z.reshape(b, c, -1)
            cov = torch.bmm(f, f.transpose(1, 2)) / (h * w - 1)
            total = total + cov.abs().mean()
        return total

    def one_iter():
        # phase 1
        opts[0].zero_grad()
        out, _, feats = main_od(img, tgt_od, img, eps)
        loss = bce(torch.sigmoid(out), tgt_od) + whitening_penalty(feats)
        loss.backward()
        opts[0].step()
        # phase 2
        opts[1].zero_grad()
        with torch.no_grad():
            tfeats = main_od.wt_model(img)
            _, mu_t = main_od.prior_dist(tfeats[-1], tgt_od, eps)
        sfeats = stud_od.wt_model(img)
        _, mu_s = stud_od(sfeats[-1], eps)
        loss2 = mse(mu_t, mu_s) + whitening_penalty(sfeats)
        loss2.backward()
        opts[1].step()
        # phase 3
        od_pred = (torch.sigmoid(out) > 0.75).float().detach()
        roi = (img + 1) * od_pred - 1
        opts[2].zero_grad()
        out_oc, _, feats_oc = main_oc(roi, tgt_oc, roi, eps)
        loss3 = torch.nn.functional.binary_cross_entropy_with_logits(
            out_oc * od_pred, tgt_oc) + whitening_penalty(feats_oc)
        loss3.backward()
        opts[2].step()
        # phase 4
        opts[3].zero_grad()
        with torch.no_grad():
            tfeats2 = main_oc.wt_model(roi)
            _, mu_t2 = main_oc.prior_dist(tfeats2[-1], tgt_oc, eps)
        sfeats2 = stud_oc.wt_model(roi)
        _, mu_s2 = stud_oc(sfeats2[-1], eps)
        loss4 = mse(mu_t2, mu_s2) + whitening_penalty(sfeats2)
        loss4.backward()
        opts[3].step()

    one_iter()  # warmup
    t0 = time.time()
    for _ in range(n_steps):
        one_iter()
    ips = B / ((time.time() - t0) / n_steps)
    json.dump({"torch_cpu_ips": ips}, open(CACHE, "w"))
    return ips


def jax_train_ips() -> float:
    """Steady-state throughput of the FUSED production step: per-domain sampling
    from the HBM-resident dataset + on-device RandomScaleCrop/Normalize_tf + the
    full 4-phase update, all one XLA program (what ``Trainer.train`` runs)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from wt_pse_tpu.config import default_hparams
    from wt_pse_tpu.data.fundus import FundusDomain
    from wt_pse_tpu.train.trainer import Trainer

    hp = default_hparams("WT_PSE")
    hp["compute_dtype"] = "bfloat16"  # production mixed-precision mode (see module docstring)

    rng = np.random.RandomState(0)

    def dom(n):
        return FundusDomain(
            images=(rng.rand(n, HW, HW, 3) * 255).astype(np.uint8),
            labels=rng.choice([0, 128, 255], size=(n, HW, HW)).astype(np.uint8),
            names=[str(i) for i in range(n)])

    val = FundusDomain(
        images=(rng.rand(2, HW, HW, 3) * 255).astype(np.uint8),
        labels=[rng.choice([0, 128, 255], size=(412, 412)).astype(np.uint8)
                for _ in range(2)],
        names=["a", "b"])
    trainer = Trainer(
        hparams=hp,
        train_domains=[dom(40), dom(40), dom(40)], val_domain=val,
        out_dir="/tmp/bench_run", label="OD", batch_size=B, max_epoch=1,
        interval_validate=99, seed=1)

    # production path: one lax.scan program per epoch (Trainer.train's driver).
    # MEASUREMENT NOTE: on this backend (axon tunnel) ``block_until_ready`` is
    # unreliable — it can return at enqueue time, which silently measures
    # dispatch rate instead of execution (observed: ~0.3 ms/step "timings" for
    # a step whose true device time is ~350 ms). Every timing below therefore
    # forces an actual value fetch; the ~40 ms dispatch+fetch overhead is <1%
    # of a 30-step scan.
    key = jax.random.PRNGKey(0)
    n = 30
    state, m = trainer.epoch_step(trainer.state, trainer.data, key, 0, n)  # compile
    float(np.asarray(m["loss_seg"]))
    dts = []
    for rep in (1, 2):
        t0 = time.time()
        state, m = trainer.epoch_step(state, trainer.data, key, rep * n, n)
        assert np.isfinite(float(np.asarray(m["loss_seg"])))
        dts.append(time.time() - t0)
    return B / (min(dts) / n)


def main():
    baseline = torch_cpu_baseline_ips()
    ours = jax_train_ips()
    print(json.dumps({
        "metric": "WT-PSE 4-phase train throughput, bf16 mixed precision (batch 9, 256x256)",
        "value": round(ours, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ours / baseline, 2),
    }))


if __name__ == "__main__":
    main()
