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


def test_sweep_cli_job_args(tmp_path):
    from wt_pse_tpu.cli import sweep as sweep_cli

    args, left = sweep_cli.build_parser().parse_known_args(
        ["--data-dir", "/d", "--targets", "3", "--labels", "OD", "OC",
         "--running_times", "1"])
    assert left == []
    job = SweepJob(3, "OC")
    ns = sweep_cli.job_args(args, job, str(tmp_path))
    assert ns.datasetTrain == [1, 2, 4]
    assert ns.datasetTest == [3]
    assert ns.label == "OC"
    assert ns.out.endswith("target3_OC")
    # the original namespace is untouched (each job gets its own copy)
    assert args.label != "OC" or args.datasetTest != [3]
    # auto-DP must NOT leak into sweep jobs: each job owns one device; only an
    # explicit --dp opts in (cli/sweep.job_args)
    assert ns.dp is False
    args_dp, _ = sweep_cli.build_parser().parse_known_args(
        ["--data-dir", "/d", "--targets", "3", "--labels", "OD", "--dp"])
    assert sweep_cli.job_args(args_dp, job, str(tmp_path)).dp is True


def test_sweep_cli_end_to_end_stubbed(tmp_path, monkeypatch):
    """Fan-out/aggregation contract with the per-job training stubbed out."""
    import json
    import os

    from wt_pse_tpu.cli import sweep as sweep_cli

    calls = []

    def fake_train_main(args=None, left_argv=None):
        calls.append((tuple(args.datasetTrain), tuple(args.datasetTest),
                      args.label, args.out, tuple(left_argv)))
        d = 0.9 if args.label == "OD" else 0.8
        return {"DSC_OC": [d - 0.1], "HD_OC": [10.0], "ASD_OC": [2.0],
                "DSC_OD": [d], "HD_OD": [8.0], "ASD_OD": [1.0]}

    monkeypatch.setattr(sweep_cli.train_cli, "main", fake_train_main)
    out = str(tmp_path / "sweep")
    args, left = sweep_cli.build_parser().parse_known_args(
        ["--data-dir", "/d", "--out", out, "--compute_dtype=bfloat16"])
    results = sweep_cli.main(args, left)

    assert len(calls) == 8  # 4 targets x {OD, OC}
    trains = {c[0] for c in calls}
    assert (1, 2, 4) in trains and (2, 3, 4) in trains
    for tr, te, _label, _out, la in calls:
        assert te[0] not in tr and len(tr) == 3
        assert la == ("--compute_dtype=bfloat16",)  # hparam passthrough
    # non-`=` form: argparse's configs positional steals the value; each job's
    # namespace keeps it so train.main's _repair_left_argv re-pairs per job
    args2, left2 = sweep_cli.build_parser().parse_known_args(
        ["--data-dir", "/d", "--compute_dtype", "bfloat16"])
    ns = sweep_cli.job_args(args2, SweepJob(2, "OD"), out)
    assert ns.configs == ["bfloat16"] and left2 == ["--compute_dtype"]
    summary = json.load(open(os.path.join(out, "sweep_results.json")))
    assert len(summary) == 8
    assert summary["target1_OD"]["DSC_OD"] == [0.9]
    assert len(results) == 8


def test_run_sweep_concurrent():
    """concurrency>1 runs device queues in worker threads: all jobs complete,
    exceptions are captured per-job, genuinely concurrent execution happens,
    and two jobs assigned to the SAME device never overlap."""
    import threading
    import time

    import jax.numpy as jnp

    lock = threading.Lock()
    active, active_per_dev = 0, {}
    max_active, max_per_dev = 0, 0

    def job_fn(job, device):
        nonlocal active, max_active, max_per_dev
        with lock:
            active += 1
            active_per_dev[device] = active_per_dev.get(device, 0) + 1
            max_active = max(max_active, active)
            max_per_dev = max(max_per_dev, active_per_dev[device])
        try:
            if job.target_domain == 2 and job.label == "OC":
                raise RuntimeError("boom")
            time.sleep(0.05)
            # a real dispatch on the assigned device, from the worker thread
            with jax.default_device(device):
                return float(jnp.sum(jnp.ones(3)) * job.target_domain)
        finally:
            with lock:
                active -= 1
                active_per_dev[device] -= 1

    # 8 jobs round-robin onto 2 devices (4 per queue), 2 workers: overlap
    # must happen across devices and must NOT happen within one device
    devices = jax.devices()[:2]
    results = run_sweep(job_fn, devices=devices, concurrency=2)
    assert len(results) == 8
    assert isinstance(results[SweepJob(2, "OC")], RuntimeError)
    ok = {j: r for j, r in results.items() if not isinstance(r, Exception)}
    assert ok[SweepJob(3, "OD")] == 9.0
    assert max_active == 2, f"no cross-device overlap observed: {max_active}"
    assert max_per_dev == 1, "two jobs overlapped on one device"
    # concurrency caps at len(devices); a huge value must not crash
    max_active = max_per_dev = 0
    assert len(run_sweep(job_fn, concurrency=999)) == 8
    assert max_per_dev == 1


def test_run_sweep_concurrent_survives_system_exit():
    """SystemExit from a job (argparse-style CLI job_fns raise it, and it is a
    BaseException) must not kill the device-queue thread: later jobs keep
    running and the failure surfaces as an Exception instance the CLI's
    `isinstance(r, Exception)` filter actually catches."""
    import jax

    def job_fn(job, device):
        if job.target_domain == 1 and job.label == "OD":
            raise SystemExit("ambiguous hparam arguments")
        return f"{job.target_domain}-{job.label}"

    results = run_sweep(job_fn, devices=jax.devices()[:2], concurrency=2)
    assert len(results) == 8  # the queue drained fully despite the exit
    failed = results[SweepJob(1, "OD")]
    assert isinstance(failed, Exception)  # NOT a bare SystemExit
    assert "ambiguous hparam arguments" in str(failed)
    # (1,OD) is index 0 -> device 0's queue; (2,OD) index 2 is the NEXT job on
    # that same queue — it ran, so the thread survived the SystemExit
    assert results[SweepJob(2, "OD")] == "2-OD"


def test_sweep_cli_failed_jobs_exit_nonzero(tmp_path, monkeypatch):
    """A sweep with failed jobs reports them, aggregates survivors, and raises
    SystemExit (a driver gating on the exit code must not see success)."""
    import json
    import os

    import pytest

    from wt_pse_tpu.cli import sweep as sweep_cli

    def fake_train_main(args=None, left_argv=None):
        if args.datasetTest == [2]:
            raise RuntimeError("synthetic job failure")
        return {"DSC_OC": [0.8], "HD_OC": [10.0], "ASD_OC": [2.0],
                "DSC_OD": [0.9], "HD_OD": [8.0], "ASD_OD": [1.0]}

    monkeypatch.setattr(sweep_cli.train_cli, "main", fake_train_main)
    out = str(tmp_path / "sweep")
    args, left = sweep_cli.build_parser().parse_known_args(
        ["--data-dir", "/d", "--out", out, "--parallel-jobs", "4"])
    with pytest.raises(SystemExit, match="2/8 sweep jobs failed"):
        sweep_cli.main(args, left)
    # survivors still aggregated on disk
    summary = json.load(open(os.path.join(out, "sweep_results.json")))
    assert len(summary) == 6
    assert "target2_OD" not in summary and "target2_OC" not in summary


def test_sweep_cli_rejects_resume_and_duplicates(tmp_path):
    import pytest

    from wt_pse_tpu.cli import sweep as sweep_cli

    parser = sweep_cli.build_parser()
    # --resume would broadcast one checkpoint into every split/label job
    args, left = parser.parse_known_args(
        ["--resume", str(tmp_path / "ckpt"), "--out", str(tmp_path)])
    with pytest.raises(SystemExit, match="resume"):
        sweep_cli.main(args, left)
    # duplicate jobs would race on one output dir and collapse in the results
    args, left = parser.parse_known_args(
        ["--targets", "1", "1", "--labels", "OD", "--out", str(tmp_path)])
    with pytest.raises(SystemExit, match="duplicate"):
        sweep_cli.main(args, left)
