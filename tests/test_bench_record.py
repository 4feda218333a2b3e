"""The driver-facing bench record contract (bench.py): exactly ONE JSON line on
stdout, a parseable explicit-failure record when nothing was measured, and the
vs_baseline ratio derived from the cached torch baseline. These paths decide
whether BENCH_r{N}.json records a number — they must not regress silently
(round 2 shipped a timeout with no record at all)."""

import importlib
import json
import sys


def _fresh_bench():
    sys.modules.pop("bench", None)
    return importlib.import_module("bench")


def test_emit_prints_exactly_once(capsys):
    b = _fresh_bench()
    b.progress.update({"ips": 54.3, "torch_ips": 0.21, "mode": "space_to_depth"})
    assert b.emit("done") is True
    assert b.emit("again") is False  # the lock makes the record unique
    out = capsys.readouterr().out.strip().split("\n")
    assert len(out) == 1
    rec = json.loads(out[0])
    assert rec["value"] == 54.3
    assert rec["unit"] == "images/sec/chip"
    assert rec["vs_baseline"] == round(54.3 / 0.21, 2)
    assert rec["mode"] == "space_to_depth"


def test_emit_failure_record_when_nothing_measured(capsys):
    b = _fresh_bench()
    assert b.emit("waiting for TPU claim") is True
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["value"] is None and rec["vs_baseline"] is None
    assert "waiting for TPU claim" in rec["error"]


def test_emit_without_torch_baseline(capsys):
    # a broken torch install must not cost the record (bench.py main())
    b = _fresh_bench()
    b.progress.update({"ips": 10.0, "torch_ips": None, "mode": "unpacked"})
    assert b.emit("done") is True
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["value"] == 10.0 and rec["vs_baseline"] is None
