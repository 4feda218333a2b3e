"""Benchmark: WT-PSE 4-phase training throughput (images/sec/chip).

Prints ONE JSON line on stdout:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}
(progress/diagnostics go to stderr only).

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
                  fetches (``block_until_ready`` is unreliable on the axon
                  tunnel — it can return at enqueue time; earlier rounds'
                  numbers measured dispatch rate, not execution). The ~40 ms
                  dispatch+fetch constant is ~1% of one timed scan.

                  Two modes are measured: ``space_to_depth`` first
                  (ops/packed.py at the production default
                  ``space_to_depth_levels=2``: the 256²/16ch and 128²/32ch
                  levels run 2x2-pixel-packed at 4x MXU-lane utilization —
                  exact same math via apply-time kernel folding; measured
                  159 ms/step vs 345 unpacked on v5e, so the headline is
                  banked early), then the unpacked base as the comparison line,
                  skipped when over half the budget is gone. The JSON line
                  reports the better one in ``value`` with the mode in
                  ``"mode"``.
``vs_baseline`` — ratio vs the PyTorch-CPU reference-equivalent iteration
                  (BASELINE.md target: >=5x). The torch baseline mirrors the
                  reference's per-iteration work (6 U-Net-scale forwards,
                  4 backwards, 4 Adam steps — SURVEY.md §3.1) using the golden
                  modules in tests/torch_ref.py; it is measured once on this VM
                  and cached in ``.bench_cache.json`` (committed — one torch-CPU
                  iteration takes ~43 s, too slow to remeasure per run).

Budget: the whole script must finish inside the driver's timeout. A watchdog
thread (``WT_PSE_BENCH_BUDGET_S``, default 540 s) prints the JSON line with
whatever has been measured so far and exits if the deadline nears — a partial
single-rep number beats a timeout with no record (round 2's ``BENCH_r02.json``
was ``rc: 124, parsed: null``). Warm-cache wall times measured round 3: both
modes in 123 s on a free chip; PLUS up to ~6 minutes of axon TPU-claim wait if
another python process used the chip within the last few minutes (the claim
releases slowly even after a clean exit) — that wait is probed and logged
separately as "waiting for TPU claim" before any compile starts.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

B, HW = 9, 256
SCAN_N = 10
CACHE = os.path.join(ROOT, ".bench_cache.json")
T0 = time.time()

# bf16 peak of one TPU v5e chip (the driver's benchmark hardware), for the MFU
# field: MFU = analytic_step_flops * steps_per_sec / peak. The FLOP count
# comes from XLA's own cost analysis of the exact compiled epoch-scan program
# (verified available on the axon backend), so it includes every conv/matmul
# of the 4-phase step incl. backward — not a hand-derived estimate.
PEAK_FLOPS = float(os.environ.get("WT_PSE_PEAK_FLOPS", 197e12))

# shared progress record the watchdog prints from
progress: dict = {"ips": None, "torch_ips": None, "note": "startup"}
_printed = threading.Lock()


def log(msg: str) -> None:
    print(f"[bench +{time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def emit(note: str) -> bool:
    """Print the one JSON line (exactly once). Returns False if already printed."""
    if not _printed.acquire(blocking=False):
        return False
    ips = progress["ips"]
    torch_ips = progress["torch_ips"]
    if ips is None:
        # nothing measured — emit an explicit failure record rather than silence
        print(json.dumps({
            "metric": "WT-PSE 4-phase train throughput, bf16 mixed precision (batch 9, 256x256)",
            "value": None, "unit": "images/sec/chip", "vs_baseline": None,
            "error": f"no measurement completed ({note})",
        }), flush=True)
        return True
    rec = {
        "metric": "WT-PSE 4-phase train throughput, bf16 mixed precision (batch 9, 256x256)",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / torch_ips, 2) if torch_ips else None,
        "mode": progress.get("mode"),
    }
    # MFU basis: packed (space_to_depth) programs count the folded kernels'
    # structural zeros as FLOPs (XLA sees a denser conv), which would overstate
    # utilization; when the unpacked program's count (the true semantic MACs of
    # the 4-phase step) was captured, use it for every mode — it is the same
    # mathematical work (exactness-gated by tests/test_packed.py).
    sem = progress.get("flops_semantic")
    own = progress.get("flops_per_step")
    basis = sem or own
    if basis:
        rec["mfu"] = round(basis * (ips / B) / PEAK_FLOPS, 4)
        rec["flops_per_step"] = round(basis)
        rec["mfu_basis"] = ("unpacked-program flops (semantic MACs)" if sem
                           else "own-program flops (packed fold counts "
                                "structural zeros)")
        rec["peak_flops_assumed"] = PEAK_FLOPS
    scal = progress.get("scaling")
    if scal is not None:
        scal = dict(scal)
        own_flops = scal.pop("_own_flops", None)
        nb = scal["batch"]  # measure() always records it; KeyError beats a
        # silently-wrong default if that invariant ever breaks
        # flops scale linearly in batch -> semantic basis = sem * nb/B
        basis_s = (sem * nb / B if sem else own_flops)
        if basis_s:
            scal["mfu"] = round(basis_s * (scal["ips"] / nb) / PEAK_FLOPS, 4)
            # mirror the top-level field: when the unpacked measurement was
            # budget-skipped this MFU silently falls back to the packed
            # program's inflated count — readers must be able to tell whether
            # the two MFU numbers share a basis
            scal["mfu_basis"] = (
                "unpacked-program flops (semantic MACs), scaled by batch"
                if sem else
                "own-program flops (packed fold counts structural zeros)")
        # first-class throughput record (ROADMAP 3c-ii): the measured scaling
        # knee sits at batch 72 (103 img/s; 144 OOMs HBM), so the non-parity
        # "throughput mode" recommendation is this point, reported next to the
        # reference-semantics batch-9 headline
        rec["throughput_mode"] = scal
    print(json.dumps(rec), flush=True)
    return True


def watchdog(budget_s: float) -> None:
    """Deadline guard. Fires ONLY on overrun; uses os._exit because the main
    thread is typically stuck inside a device call then. The normal completion
    path returns from main() instead — a clean interpreter shutdown releases
    the axon TPU-session claim (an os._exit exit can leave the claim dangling,
    which serializes the NEXT python process against a stale session for
    minutes — observed round 3 while timing consecutive bench runs)."""

    def run():
        next_beat = 60.0
        while True:
            elapsed = time.time() - T0
            left = budget_s - elapsed
            if left <= 0:
                log(f"watchdog fired (budget {budget_s}s, state: {progress['note']})")
                emit(progress["note"])
                # rc mirrors whether a NUMBER exists, no matter who printed
                # the record: if main() already emitted, it may have been the
                # explicit-failure (value: null) record on its way to
                # sys.exit(1) — exiting 0 then would mislabel a failed run
                os._exit(0 if progress["ips"] is not None else 1)
            if elapsed >= next_beat:
                # the TPU-claim wait and long compile-cache loads are silent
                # from the main thread — heartbeat so a driver-side tail shows
                # the run is alive and *where* it is, not hung
                log(f"heartbeat: {progress['note']} ({left:.0f}s of budget left)")
                next_beat = elapsed + 60.0
            time.sleep(min(max(left, 0.1), 5.0))

    threading.Thread(target=run, daemon=True).start()


def torch_cpu_baseline_ips() -> float:
    """Reference-equivalent torch-CPU iteration: phase1 OD seg (fwd+bwd+Adam),
    phase2 teacher fwd + student fwd/bwd/Adam, phases 3-4 on the ROI.
    Measured once and cached (one iteration ~43 s on the 1-core VM)."""
    if os.path.exists(CACHE):
        try:
            ips = float(json.load(open(CACHE))["torch_cpu_ips"])
            log(f"torch baseline from cache: {ips:.3f} img/s")
            return ips
        except Exception:
            pass

    log("torch baseline cache miss — measuring (slow, ~90 s)")
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
    one_iter()
    ips = B / (time.time() - t0)
    json.dump({"torch_cpu_ips": ips}, open(CACHE, "w"))
    return ips


def jax_train_ips() -> float:
    """Steady-state throughput of the FUSED production step: per-domain sampling
    from the HBM-resident dataset + on-device RandomScaleCrop/Normalize_tf + the
    full 4-phase update, all one XLA program (what ``Trainer.train`` runs).

    Measures the space-to-depth production mode FIRST (banks the headline
    number early), then the unpacked base as the comparison line — skipped
    when over half the budget is gone; keeps the better rate in ``progress``
    (see module docstring)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    log(f"jax imported, backend={jax.default_backend()}")

    # claim the device with a trivial blocking op BEFORE any compile: on axon,
    # a recently-exited python process holds the TPU-session claim for minutes
    # (even after a clean exit) and the wait surfaces at the first value fetch —
    # probing here makes claim-wait and compile time separable in the log.
    progress["note"] = "waiting for TPU claim"
    log("waiting for TPU claim (a recently-exited python TPU process holds it "
        "for ~6 min even after a clean exit; each process KILLED mid-wait adds "
        "a further unclaimed-grant timeout — observed 20 min after two kills)")
    t0 = time.time()
    float(np.asarray(jax.numpy.zeros(()) + 1))
    log(f"TPU claim acquired in {time.time() - t0:.1f}s")
    progress["note"] = "building trainer"

    from wt_pse_tpu.config import default_hparams
    from wt_pse_tpu.data.fundus import FundusDomain
    from wt_pse_tpu.train.trainer import Trainer

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
    # 12 images/domain: enough for distinct random batches, and the host->HBM
    # transfer over the tunnel is ~3x smaller than the 40/domain it replaces
    # (pool size does not change the per-step compute — sampling is random)
    doms = [dom(12), dom(12), dom(12)]

    def measure(mode: str, s2d: bool, batch: int = B):
        hp = default_hparams("WT_PSE")
        hp["compute_dtype"] = "bfloat16"  # production mixed precision
        hp["space_to_depth"] = s2d
        trainer = Trainer(
            hparams=hp, train_domains=doms, val_domain=val,
            out_dir=f"/tmp/bench_run_{mode}", label="OD", batch_size=batch,
            max_epoch=1, interval_validate=99, seed=1, val_visualization=False,
            dp=False)  # per-CHIP metric: auto-DP on a multi-chip host would
        # silently spread the step over the slice while the record still says
        # images/sec/chip and MFU against one chip's peak
        log(f"[{mode}] trainer built")

        # production path: one lax.scan program per epoch (Trainer.train's
        # driver). MEASUREMENT NOTE: every timing forces an actual value fetch
        # (module docstring — block_until_ready can return at enqueue on the
        # axon tunnel).
        key = jax.random.PRNGKey(0)
        progress["note"] = f"compiling epoch scan [{mode}]"
        state, m = trainer.epoch_step(trainer.state, trainer.data, key, 0, SCAN_N)
        # epoch_step returns per-step metric stacks of shape (SCAN_N,); fetching
        # the last element forces compile-run completion of the whole scan
        float(np.asarray(m["loss_seg"])[-1])
        log(f"[{mode}] scan({SCAN_N}) compiled + warm")

        # analytic FLOPs of the exact compiled scan program (XLA cost
        # analysis; cached-compile, so this is cheap) -> per-step FLOPs for
        # the MFU field. Computed BEFORE the timed reps so a banked rate
        # always carries its MFU even if the watchdog fires mid-rep-2.
        flops_step = None
        try:
            ca = trainer.epoch_step.lower(
                state, trainer.data, key, 0, SCAN_N).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops_step = float(ca["flops"]) / SCAN_N
            log(f"[{mode}] XLA cost analysis: {flops_step / 1e9:.1f} GFLOP/step")
            if not s2d and batch == B:
                # the unpacked batch-9 program's count = the true semantic
                # MACs of one 4-phase step (packed programs inflate it with
                # the folded kernels' structural zeros) — emit() prefers it
                progress["flops_semantic"] = flops_step
        except Exception as e:  # cost analysis is best-effort, never fatal
            log(f"[{mode}] cost_analysis unavailable: {type(e).__name__}: {e}")

        def bank(ips):
            if batch != B:  # scaling/throughput data point, not the headline
                progress["scaling"] = {"ips": round(ips, 2), "batch": batch,
                                       "_own_flops": flops_step}
            elif progress["ips"] is None or ips > progress["ips"]:
                progress["ips"], progress["mode"] = ips, mode
                progress["flops_per_step"] = flops_step

        best = None
        for rep in (1, 2):
            progress["note"] = f"timed rep {rep} [{mode}]"
            t0 = time.time()
            state, m = trainer.epoch_step(state, trainer.data, key,
                                          rep * SCAN_N, SCAN_N)
            assert np.isfinite(float(np.asarray(m["loss_seg"])[-1]))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            log(f"[{mode}] rep {rep}: {dt:.2f}s for {SCAN_N} steps -> "
                f"{batch / (dt / SCAN_N):.2f} img/s")
            # bank after EVERY rep: if the watchdog fires during rep 2, the
            # rep-1 rate must already be in the record (not value:null)
            ips = batch / (best / SCAN_N)
            bank(ips)
        return ips

    # headline mode first (space_to_depth is the recommended production mode —
    # ~2x the unpacked rate, exact same math): its number is banked before the
    # unpacked comparison run. The second mode only starts if at least half the
    # budget remains — a compile-cache load over the tunnel has been observed to
    # take anywhere from 70 to 210 s for the same program, and a watchdog
    # os._exit mid-compile leaves the axon claim wedged for the next process.
    budget = float(os.environ.get("WT_PSE_BENCH_BUDGET_S", "540"))
    measure("space_to_depth", True)
    if time.time() - T0 < 0.45 * budget:
        measure("unpacked", False)
    else:
        log("skipping unpacked comparison (over 45% of the budget used)")
    # throughput-mode data point (ROADMAP 3c-ii): the measured batch-scaling
    # knee is 72 = 3 domains x 24 (90 img/s at 36, 103 at 72, OOM at 144), so
    # the non-parity recommendation is batch 72; reported as the
    # "throughput_mode" field next to its own MFU, never as the headline value
    if time.time() - T0 < 0.7 * budget:
        measure("space_to_depth_b72", True, batch=3 * 24)
    else:
        log("skipping batch-72 throughput point (over 70% of the budget used)")
    return progress["ips"]


def main():
    watchdog(float(os.environ.get("WT_PSE_BENCH_BUDGET_S", "540")))
    progress["note"] = "torch baseline"
    try:
        progress["torch_ips"] = torch_cpu_baseline_ips()
    except Exception as e:  # a broken torch install must not cost the JSON
        # line — emit() reports vs_baseline: null when torch_ips is missing
        log(f"torch baseline failed: {type(e).__name__}: {e}")
    progress["note"] = "importing jax"
    try:
        jax_train_ips()
    except Exception as e:  # backend outage (e.g. axon UNAVAILABLE) — still
        # print the one JSON line so the driver records an explicit failure
        # (or a partial number if one mode finished) instead of a crash
        log(f"measurement aborted: {type(e).__name__}: {e}")
        progress["note"] = f"{type(e).__name__}: {e}"
    emit(progress["note"])
    if progress["ips"] is None:
        sys.exit(1)  # record printed, but it is an explicit failure
    # fall through to a CLEAN interpreter exit — see watchdog() docstring


if __name__ == "__main__":
    main()
