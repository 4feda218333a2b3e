"""Sweep parallelism: the 4 leave-one-domain-out splits x {OC, OD} (BASELINE
config 5).

The reference runs these as 8 sequential invocations of ``train.py``. On a slice,
each replica is an independent training (different data, different hparams key
surface), so the right decomposition is one replica per device (or device group)
— embarrassingly parallel, no collectives. This module provides the host-level
launcher that pins each replica's computation to its device via
``jax.default_device`` and runs them in a round-robin schedule.

For replicas-per-device > 1 chips, combine with :mod:`wt_pse_tpu.parallel.dp`.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass


@dataclass(frozen=True)
class SweepJob:
    target_domain: int
    label: str  # 'OD' | 'OC'

    @property
    def train_domains(self) -> list[int]:
        return [d for d in (1, 2, 3, 4) if d != self.target_domain]


def leave_one_out_jobs(labels=("OD", "OC")) -> list[SweepJob]:
    return [SweepJob(t, l) for t, l in itertools.product((1, 2, 3, 4), labels)]


def run_sweep(job_fn, jobs: list[SweepJob] | None = None, devices=None,
              concurrency: int = 1):
    """Run ``job_fn(job, device)`` for each sweep job, assigning devices
    round-robin. ``job_fn`` should wrap its computation in
    ``with jax.default_device(device):``. Returns {job: result}.

    ``concurrency > 1`` runs up to that many *device queues* at once in worker
    threads (capped at ``len(devices)``). Jobs are grouped by their assigned
    device and each device's jobs run sequentially within one thread — two
    trainings never share a chip regardless of completion order (a plain
    worker pool over jobs would let a freed worker start device 0's second
    job while its first is still training). Replicas are independent
    trainings (no collectives), so the device-level parallelism is exactly
    thread-level here: each thread's dispatches target its own device, and
    XLA executions on distinct devices overlap while the GIL is released.
    A job that raises is recorded as the exception instance (later jobs on
    that device and other queues keep running) — callers decide whether to
    re-raise; the sequential path keeps fail-fast semantics."""
    import jax

    jobs = jobs if jobs is not None else leave_one_out_jobs()
    devices = devices if devices is not None else jax.devices()
    assignment = [(job, devices[i % len(devices)]) for i, job in enumerate(jobs)]

    concurrency = max(1, min(concurrency, len(devices)))
    if concurrency == 1:
        return {job: job_fn(job, dev) for job, dev in assignment}

    from concurrent.futures import ThreadPoolExecutor

    per_device: dict = {}
    for job, dev in assignment:
        per_device.setdefault(dev, []).append(job)

    results: dict = {}

    def drain(dev, dev_jobs):
        for job in dev_jobs:
            try:
                results[job] = job_fn(job, dev)
            except Exception as e:  # noqa: BLE001 — surfaced in the result dict
                results[job] = e
            # SystemExit too: argparse/CLI-style job_fns raise it (e.g. the
            # train CLI's ambiguous-hparam repair), and it is a BaseException —
            # without this clause it would kill the queue thread and abort the
            # whole sweep, discarding every completed job's results. Wrapped in
            # RuntimeError because callers filter on `isinstance(r, Exception)`
            # and SystemExit is not an Exception subclass.
            except SystemExit as e:
                results[job] = RuntimeError(f"job exited: {e}")

    with ThreadPoolExecutor(max_workers=concurrency) as pool:
        futures = [pool.submit(drain, dev, dev_jobs)
                   for dev, dev_jobs in per_device.items()]
    for f in futures:
        f.result()  # drain() swallows job errors; surface scheduler bugs
    return {job: results[job] for job, _ in assignment}
