"""Leave-one-domain-out sweep CLI (BASELINE config 5).

The reference runs the 4 leave-one-out splits x {OD, OC} as 8 separate
``python train.py`` invocations (``/root/reference/train.py:182-213`` — one
``--datasetTest``/``--label`` pair per run). This entry point launches the
whole sweep from one command, assigning jobs to TPU devices round-robin
(:mod:`wt_pse_tpu.parallel.sweep` — each replica is an independent training,
so the decomposition is embarrassingly parallel, no collectives):

    python -m wt_pse_tpu.cli.sweep --data-dir /path/to/Fundus \
        [--targets 1 2 3 4] [--labels OD OC] [any cli.train flag ...]

Every ``cli.train`` flag (and hparam leftover, e.g. ``--compute_dtype
bfloat16``) passes through to each job; ``--datasetTrain``/``--datasetTest``/
``--label`` are set per job. Results land under ``<out>/target{t}_{label}/``
plus an aggregate ``sweep_results.json``.
"""

from __future__ import annotations

import argparse
import json
import os
from datetime import date

import numpy as np

from wt_pse_tpu.cli import train as train_cli
from wt_pse_tpu.parallel.sweep import SweepJob, run_sweep


def build_parser() -> argparse.ArgumentParser:
    p = train_cli.build_parser()
    p.add_argument("--targets", nargs="+", type=int, default=[1, 2, 3, 4],
                   help="target (held-out) domain ids to sweep")
    p.add_argument("--labels", nargs="+", type=str, default=["OD", "OC"],
                   choices=["OD", "OC"], help="structure labels to sweep")
    p.add_argument("--parallel-jobs", type=int, default=1,
                   help="run this many sweep jobs concurrently (worker threads,"
                        " capped at the device count) — replicas are"
                        " independent, so jobs on distinct devices overlap")
    return p


def job_args(args: argparse.Namespace, job: SweepJob,
             out_root: str) -> argparse.Namespace:
    """Per-job namespace: the sweep flags become the train CLI's split flags."""
    ns = argparse.Namespace(**vars(args))
    ns.datasetTrain = job.train_domains
    ns.datasetTest = [job.target_domain]
    ns.label = job.label
    ns.out = os.path.join(out_root, f"target{job.target_domain}_{job.label}")
    if ns.dp is None:
        # sweep parallelism IS the device decomposition here: each job owns one
        # device (run_sweep's round-robin + jax.default_device). The train
        # CLI's auto-DP (dp=None -> shard over ALL devices) would make every
        # job grab the whole slice; only an explicit --dp opts a job into it.
        ns.dp = False
    return ns


def main(args=None, left_argv=None):
    parser = build_parser()
    if args is None:
        args, left_argv = parser.parse_known_args()
    import jax

    if getattr(args, "resume", None):
        # vars(args) is copied into every job: a single checkpoint would warm-
        # start all leave-one-out splits/labels from the same weights (and
        # their step count skips epochs of each job's own schedule) — every
        # result would be silently contaminated. Resume individual jobs via
        # the train CLI instead.
        raise SystemExit(
            "--resume is not supported by the sweep launcher (it would "
            "restore ONE checkpoint into every split/label job); resume the "
            "affected job with wt-pse-train --resume ... --datasetTest <t> "
            "--label <l>")

    out_root = args.out or os.path.join("runs", f"sweep_{date.today()}")
    jobs = [SweepJob(t, l) for t in args.targets for l in args.labels]
    if len(set(jobs)) != len(jobs):
        # duplicates would race on one output dir and collapse in the results
        # dict (dict keyed by the frozen SweepJob), silently dropping runs
        dupes = list(dict.fromkeys(j for j in jobs if jobs.count(j) > 1))
        raise SystemExit(f"duplicate sweep jobs requested: {dupes} — "
                         "pass each target/label at most once")

    def job_fn(job: SweepJob, device):
        print("=" * 20, f"sweep job: target {job.target_domain}, "
              f"{job.label}, device {device}", "=" * 20)
        with jax.default_device(device):
            return train_cli.main(job_args(args, job, out_root), left_argv)

    results = run_sweep(job_fn, jobs, concurrency=args.parallel_jobs)
    failed = {j: r for j, r in results.items() if isinstance(r, Exception)}
    for job, err in failed.items():
        print(f"FAILED: target {job.target_domain} {job.label}: {err!r}")
    results = {j: r for j, r in results.items() if not isinstance(r, Exception)}

    summary = {}
    for job, res in results.items():
        key = f"target{job.target_domain}_{job.label}"
        summary[key] = {m: [float(v) for v in vals] for m, vals in res.items()}
    os.makedirs(out_root, exist_ok=True)
    with open(os.path.join(out_root, "sweep_results.json"), "w") as f:
        json.dump(summary, f, indent=1)

    # final table: per job, mean over running_times of the label-relevant Dice
    print("\n" + "=" * 20, "sweep summary", "=" * 20)
    for job, res in results.items():
        dice_key = "DSC_OD" if job.label == "OD" else "DSC_OC"
        vals = res[dice_key]
        print(f"target {job.target_domain} {job.label}: "
              f"{dice_key}={np.mean(vals):.4f}"
              + (f"+-{np.std(vals, ddof=1):.4f}" if len(vals) > 1 else ""))
    if failed:
        # a CI/driver gating on the exit code must not record a sweep with
        # dropped jobs as success; survivors' artifacts are already on disk
        raise SystemExit(
            f"{len(failed)}/{len(failed) + len(results)} sweep jobs failed")
    return results


if __name__ == "__main__":
    main()
