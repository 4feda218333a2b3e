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


CLASSES = (
    # (class label, name substrings — first hit wins)
    ("conv (MXU)", ("convolution", "conv")),
    ("matmul/einsum (MXU)", ("dot", "einsum")),
    ("transpose/pack", ("transpose", "reshape", "copy", "bitcast")),
    ("reduce (BN stats/loss)", ("reduce", "all-reduce")),
    ("sort (none expected)", ("sort",)),
    ("scatter/gather/dynamic", ("scatter", "gather", "dynamic", "select-and")),
    ("elementwise fusion", ("fusion", "add", "multiply", "subtract", "divide",
                            "maximum", "exponential", "log", "compare",
                            "select", "tanh", "rsqrt", "power", "convert",
                            "broadcast", "iota", "pad", "slice", "concatenate",
                            "clamp", "negate", "sign", "floor", "ceil", "abs",
                            "and", "or", "not", "xor", "rem", "map")),
    ("rng", ("rng", "bitcast-convert", "shift", "xor")),
    ("infeed/outfeed/host", ("infeed", "outfeed", "send", "recv", "host")),
)


def classify(name: str) -> str:
    n = name.lower()
    # strip the "%fusion.123" wrapper to the root op when present; XLA device
    # events are usually named after the root or the fusion kind
    for label, keys in CLASSES:
        if any(k in n for k in keys):
            return label
    return "other"


def parse_trace(outdir: str):
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
    # find device PIDs: process_name metadata containing "TPU" and not "host"
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname = e.get("args", {}).get("name", "")
            if ("TPU" in pname or "tpu" in pname) and "Host" not in pname:
                dev_pids.add(e["pid"])
    if not dev_pids:  # fall back: report all pids found
        names = {e.get("args", {}).get("name") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
        print(f"no TPU pid found; process names: {sorted(filter(None, names))}")
        return
    by_class = defaultdict(float)
    by_name = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        name = e.get("name", "?")
        # skip the per-step/trace-level umbrella events (module-level spans
        # overlap the op events and would double-count)
        if dur <= 0 or name.startswith(("jit_", "XLA Modules", "Steps")):
            continue
        total += dur
        by_class[classify(name)] += dur
        by_name[name] += dur
    if total == 0:
        print("no device op events found")
        return
    steps_ms = total / 1e3 / SCAN_N
    print(f"\ndevice op time total: {total / 1e3:.1f} ms over {SCAN_N} steps "
          f"-> {steps_ms:.1f} ms/step attributed")
    print(f"\n{'class':28s} {'ms/step':>9s} {'share':>7s}")
    for cls, us in sorted(by_class.items(), key=lambda kv: -kv[1]):
        print(f"{cls:28s} {us / 1e3 / SCAN_N:9.2f} {us / total:7.1%}")
    print(f"\ntop 25 individual ops:")
    for name, us in sorted(by_name.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {us / 1e3 / SCAN_N:8.3f} ms/step  {us / total:6.1%}  {name[:90]}")


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else "/tmp/wtpse_profile"
    batch = B
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
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
