"""Run-directory observability: CSV scalars, best-score file, stdout summaries.

Keeps the reference's artifact surface (``/root/reference/Trainer.py:105-122,
279-281``): ``log.csv`` (same header — and unlike the reference, actually appended
to), ``score.txt`` on each new best, plus a ``metrics.jsonl`` stream with every
scalar the jitted step returns (the tensorboardX equivalent; one JSON line per
logging interval is greppable and needs no extra deps).
"""

from __future__ import annotations

import json
import os
import time

LOG_HEADERS = [
    "epoch", "iteration", "train/loss_seg", "train/cup_dice", "train/disc_dice",
    "valid/loss_CE", "valid/cup_dice", "valid/disc_dice", "elapsed_time",
]


class RunLogger:
    def __init__(self, out_dir: str, tensorboard: bool = False,
                 null: bool = False):
        """``null=True``: a write-nothing logger (every method is a no-op).
        Used by non-zero processes in multi-host training — all processes run
        the identical loop on replicated state, so only process 0 owns the run
        directory (two processes appending the same shared file would race)."""
        self.out = out_dir
        self.null = null
        self.t0 = time.time()
        self.tb = None
        self.csv_path = os.path.join(out_dir, "log.csv")
        self.jsonl_path = os.path.join(out_dir, "metrics.jsonl")
        if null:
            return
        os.makedirs(out_dir, exist_ok=True)
        if not os.path.exists(self.csv_path):
            with open(self.csv_path, "w") as f:
                f.write(",".join(LOG_HEADERS) + "\n")
        # optional TensorBoard event files (the reference writes tensorboardX
        # events under out/tensorboard/, Trainer.py:120-122); torch's writer
        # emits the same format
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(
                    log_dir=os.path.join(out_dir, "tensorboard"))
            except Exception:
                self.tb = None

    def run_meta(self, meta: dict):
        """``run_meta.json``: one machine-readable record of how this run was
        configured — written once at Trainer construction so the exact
        reproduction command (notably the DP mode, which changes same-seed
        numerics — see Trainer's reproducibility note) survives next to
        log.csv instead of only scrolling by on stdout."""
        if self.null:
            return
        with open(os.path.join(self.out, "run_meta.json"), "w") as f:
            json.dump(meta, f, indent=2, default=str)
            f.write("\n")

    def scalars(self, step: int, payload: dict):
        if self.null:
            return
        rec = {"step": step, "t": round(time.time() - self.t0, 3)}
        rec.update({k: float(v) for k, v in payload.items()})
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self.tb is not None:
            for k, v in rec.items():
                if k not in ("step", "t"):
                    self.tb.add_scalar(k, v, step)

    def step_scalars(self, iteration: int, payload: dict):
        """Per-iteration train scalars (reference parity: ``Trainer.py:957-969``
        writes every loss scalar every iteration). One ``{"kind": "step"}`` JSON
        line per training step in metrics.jsonl — epoch records have no ``kind``
        key, so consumers distinguish them for free. Under the scan-epoch driver
        these are emitted in one burst per epoch from the stacked scan outputs
        (the values are identical to what a python loop would log; only the
        wall-clock ``t`` is end-of-epoch)."""
        self.step_scalars_many([(iteration, payload)])

    def step_scalars_many(self, records):
        """Batched ``step_scalars``: one file open for a whole epoch's burst
        (the scan driver hands over thousands of per-step records at the epoch
        boundary — per-record open/close there is pure syscall overhead).
        ``records`` is an iterable of ``(iteration, payload)`` pairs."""
        if self.null:
            return
        t = round(time.time() - self.t0, 3)
        lines = []
        for iteration, payload in records:
            rec = {"kind": "step", "step": iteration, "t": t}
            rec.update({k: float(v) for k, v in payload.items()})
            lines.append(json.dumps(rec))
            if self.tb is not None:
                for k, v in rec.items():
                    if k not in ("step", "t", "kind"):
                        self.tb.add_scalar(f"train_step/{k}", v, iteration)
        if lines:
            with open(self.jsonl_path, "a") as f:
                f.write("\n".join(lines) + "\n")

    def csv_row(self, epoch: int, iteration: int, loss_seg: float,
                val: dict | None = None, train_cup: float | None = None,
                train_disc: float | None = None):
        """One log.csv row per epoch. Semantics note: under the scan-epoch
        driver the train fields are *epoch means* (the python-loop driver and
        the reference's tensorboard stream record per-iteration running values —
        those live in metrics.jsonl ``kind=step`` records instead). ``val``
        fills the valid/* columns on validation epochs."""
        if self.null:
            return
        fmt = lambda v: "" if v is None else round(v, 6)
        row = [epoch, iteration, round(loss_seg, 6), fmt(train_cup),
               fmt(train_disc),
               "", "" if val is None else round(val.get("cup_dice", 0), 6),
               "" if val is None else round(val.get("disc_dice", 0), 6),
               round(time.time() - self.t0, 1)]
        with open(self.csv_path, "a") as f:
            f.write(",".join(str(x) for x in row) + "\n")

    def image(self, tag: str, img: "object", step: int):
        """Log an (H,W,3) uint8 image: PNG under ``images/`` (always) and a
        TensorBoard ``add_image`` when the writer is live (the reference writes
        train/val grids to tensorboardX every 30 iterations, Trainer.py:929-954)."""
        if self.null:
            return
        import numpy as np

        arr = np.asarray(img)
        d = os.path.join(self.out, "images")
        os.makedirs(d, exist_ok=True)
        try:
            from PIL import Image
        except ImportError:
            Image = None  # PNG export is optional; TB path below still works
        if Image is not None:
            try:
                Image.fromarray(arr).save(
                    os.path.join(d, f"{tag.replace('/', '_')}_{step}.png"))
            except Exception as e:  # bad dtype/shape: diagnose, don't die mid-train
                print(f"[logger] image save failed for {tag}@{step}: {e!r}")
        if self.tb is not None:
            self.tb.add_image(tag, arr, step, dataformats="HWC")

    def loss_trace(self, values: dict):
        """Per-epoch loss-trace txt files, joint-epoch parity
        (Trainer.py:706-720): one ``<name>.txt`` per key, one appended line per
        epoch, ``'{}\\n'.format(value)`` spelling (so 0.0 prints as ``0.0``)."""
        if self.null:
            return
        for name, v in values.items():
            with open(os.path.join(self.out, f"{name}.txt"), "a") as f:
                f.write("{}\n".format(v))

    def best_score(self, val: dict):
        """score.txt appended on each new best (Trainer.py:279-281 format)."""
        if self.null:
            return
        with open(os.path.join(self.out, "score.txt"), "a") as f:
            f.write(
                "cd:{} dd:{} c_hd:{} d_hd:{} c_asd:{} d_asd:{}\n".format(
                    val["cup_dice"], val["disc_dice"], val["cup_hd"],
                    val["disc_hd"], val["cup_asd"], val["disc_asd"]))

    def epoch_summary(self, epoch: int, lr: float, seg_oc: float, kd_oc: float,
                      ins_oc: float, dom_oc: float, seconds: float):
        print(
            f"\n[Epoch: {epoch}] lr:{lr:.6f},  Average segLoss: {seg_oc:.6f}, "
            f"Average kl: {kd_oc:.6f},Average ins wt: {ins_oc:.6f},"
            f"Average dom wt: {dom_oc:.6f}, Execution time: {seconds:.5f}")
