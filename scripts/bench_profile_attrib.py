"""On-chip profiler attribution of the production 4-phase step (r4 VERDICT #2).

Captures a ``jax.profiler`` trace of the exact production program (Trainer
epoch-scan, s2d levels=2, bf16, batch 9 — the bench.py headline config), then
parses the trace protobuf/JSON and aggregates device-op time by op class so
>=90% of the step is attributed (MXU convs / pack-unpack transposes /
BN+elementwise fusions / resize einsums / Adam / other).

Usage:  python scripts/bench_profile_attrib.py [outdir] [--batch N]
Writes the trace under <outdir> (default /tmp/wtpse_profile) and prints the
attribution table to stdout.
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

B, HW, SCAN_N = 9, 256, 10


def build_trainer(batch):
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
    hp = default_hparams("WT_PSE")
    hp["compute_dtype"] = "bfloat16"
    hp["space_to_depth"] = True
    per_dom = max(4, batch // 3)
    return Trainer(
        hparams=hp, train_domains=[dom(per_dom) for _ in range(3)],
        val_domain=val, out_dir="/tmp/profile_run", label="OD",
        batch_size=batch, max_epoch=1, interval_validate=99, seed=1,
        val_visualization=False, dp=False)


def parse_trace(outdir: str):
    """Aggregate device-op time using XLA's OWN event metadata: every op event
    in the TPU track carries ``hlo_category`` (XLA's classification:
    "convolution", "loop fusion", "copy", ...), ``model_flops``,
    ``bytes_accessed`` and ``source`` (repo file:line) — no name heuristics.
    Umbrella spans (the while-loop scan wrapper, step markers) carry no
    hlo_category and are skipped, so nothing double-counts."""
    paths = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print(f"no trace.json.gz under {outdir}; files present:")
        for p in glob.glob(os.path.join(outdir, "**", "*"), recursive=True):
            print("  ", p)
        return
    path = max(paths, key=os.path.getmtime)
    print(f"parsing {path}")
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    dev_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in e.get("args", {}).get("name", "")}
    if not dev_pids:
        names = {e.get("args", {}).get("name") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
        print(f"no TPU pid found; process names: {sorted(filter(None, names))}")
        return
    by_cat = defaultdict(lambda: [0.0, 0.0, 0.0])  # us, flops, bytes
    by_src = defaultdict(float)
    by_name = defaultdict(lambda: [0.0, "", ""])
    wall_us = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        args = e.get("args") or {}
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))
        cat = args.get("hlo_category")
        if cat is None:
            continue  # step markers etc.
        if cat in ("while", "conditional"):
            # control-flow umbrella spans CONTAIN the op events (the epoch
            # scan's while wraps the whole step) — they are the wall-clock
            # reference, never an op cost
            wall_us += dur
            continue
        rec = by_cat[cat]
        rec[0] += dur
        rec[1] += float(args.get("model_flops", 0) or 0)
        rec[2] += float(args.get("bytes_accessed", 0) or 0)
        src = args.get("source", "?")
        by_src[src] += dur
        r = by_name[name]
        r[0] += dur
        r[1], r[2] = cat, src
    total = sum(r[0] for r in by_cat.values())
    if total == 0:
        print("no categorized device op events found")
        return
    print(f"\nscan-loop wall: {wall_us / 1e3 / SCAN_N:.1f} ms/step; "
          f"op time attributed: {total / 1e3 / SCAN_N:.1f} ms/step "
          f"({total / max(wall_us, 1):.0%} of wall — the rest is inter-op gaps)")
    print(f"\n{'hlo_category':24s} {'ms/step':>8s} {'share':>7s} "
          f"{'TFLOP/s':>8s} {'GB/s':>7s}")
    for cat, (us, fl, by) in sorted(by_cat.items(), key=lambda kv: -kv[1][0]):
        tflops = fl / (us * 1e-6) / 1e12 if us else 0.0
        gbs = by / (us * 1e-6) / 1e9 if us else 0.0
        print(f"{cat:24s} {us / 1e3 / SCAN_N:8.2f} {us / total:7.1%} "
              f"{tflops:8.2f} {gbs:7.0f}")
    print(f"\ntop 20 source lines:")
    for src, us in sorted(by_src.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {us / 1e3 / SCAN_N:8.3f} ms/step  {us / total:6.1%}  {src}")
    print(f"\ntop 20 individual ops:")
    for name, (us, cat, src) in sorted(by_name.items(),
                                       key=lambda kv: -kv[1][0])[:20]:
        print(f"  {us / 1e3 / SCAN_N:8.3f} ms/step  {us / total:6.1%}  "
              f"{name[:40]:40s} {cat:18s} {src}")


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else "/tmp/wtpse_profile"
    batch = B
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    if "--scan-n" in sys.argv:
        # per-step figures divide by the scan length; a trace captured with a
        # different length (another harness / future SCAN_N change) must be
        # parsed with its own value or every ms/step number silently scales
        global SCAN_N
        SCAN_N = int(sys.argv[sys.argv.index("--scan-n") + 1])
    if "--parse-only" in sys.argv:  # re-analyze an existing trace, no TPU
        parse_trace(outdir)
        return
    print(f"backend={jax.default_backend()} batch={batch}")
    t0 = time.time()
    float(np.asarray(jnp.zeros(()) + 1))  # claim probe
    print(f"claim acquired in {time.time() - t0:.1f}s")

    trainer = build_trainer(batch)
    key = jax.random.PRNGKey(0)
    state, m = trainer.epoch_step(trainer.state, trainer.data, key, 0, SCAN_N)
    float(np.asarray(m["loss_seg"])[-1])  # warm (forced value fetch)
    print("warm; tracing...")
    jax.profiler.start_trace(outdir)
    state, m = trainer.epoch_step(state, trainer.data, key, SCAN_N, SCAN_N)
    float(np.asarray(m["loss_seg"])[-1])
    jax.profiler.stop_trace()
    print(f"trace captured -> {outdir}")
    parse_trace(outdir)


if __name__ == "__main__":
    main()
