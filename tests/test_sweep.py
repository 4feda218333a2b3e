"""Leave-one-out sweep launcher: job enumeration and device assignment."""

import jax

from wt_pse_tpu.parallel.sweep import SweepJob, leave_one_out_jobs, run_sweep


def test_jobs_enumeration():
    jobs = leave_one_out_jobs()
    assert len(jobs) == 8  # 4 targets x {OD, OC}  (BASELINE config 5)
    assert SweepJob(3, "OD") in jobs
    assert SweepJob(3, "OD").train_domains == [1, 2, 4]
    assert SweepJob(1, "OC").train_domains == [2, 3, 4]


def test_run_sweep_round_robin_assignment():
    seen = {}

    def job_fn(job, device):
        seen[job] = device
        return f"{job.target_domain}-{job.label}"

    results = run_sweep(job_fn)
    assert len(results) == 8
    devices = jax.devices()
    assert len({id(d) for d in seen.values()}) == min(8, len(devices))
    assert results[SweepJob(1, "OD")] == "1-OD"
