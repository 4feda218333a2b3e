"""Batch-scaling knee probe (r4 VERDICT #2b): batches 9/36/72/144.

The r4 record stops at batch 36 (86.8 img/s, 1.57x for 4x batch — not yet at
the knee). This measures the production epoch-scan program (s2d levels=2,
bf16) at 72 and 144 to find where throughput saturates; the winner becomes
bench.py's "throughput mode" record.

Usage: python scripts/bench_batch_knee.py [batches...]   (default 36 72 144)
Timing: forced value fetches, 2 reps of a scan(10), best rate kept (same
methodology as bench.py — block_until_ready is unreliable on axon).
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

HW, SCAN_N = 256, 10


def main():
    batches = [int(a) for a in sys.argv[1:]] or [36, 72, 144]
    print(f"backend={jax.default_backend()}")
    t0 = time.time()
    float(np.asarray(jnp.zeros(()) + 1))
    print(f"claim acquired in {time.time() - t0:.1f}s", flush=True)

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

    results = {}
    for batch in batches:
        per_dom = batch // 3
        hp = default_hparams("WT_PSE")
        hp["compute_dtype"] = "bfloat16"
        hp["space_to_depth"] = True
        trainer = Trainer(
            hparams=hp, train_domains=[dom(max(per_dom, 4)) for _ in range(3)],
            val_domain=val, out_dir=f"/tmp/knee_{batch}", label="OD",
            batch_size=batch, max_epoch=1, interval_validate=99, seed=1,
            val_visualization=False, dp=False)
        key = jax.random.PRNGKey(0)
        t0 = time.time()
        state, m = trainer.epoch_step(trainer.state, trainer.data, key, 0,
                                      SCAN_N)
        float(np.asarray(m["loss_seg"])[-1])
        print(f"[b{batch}] compiled+warm in {time.time() - t0:.0f}s", flush=True)
        best = None
        for rep in (1, 2):
            t0 = time.time()
            state, m = trainer.epoch_step(state, trainer.data, key,
                                          rep * SCAN_N, SCAN_N)
            assert np.isfinite(float(np.asarray(m["loss_seg"])[-1]))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            print(f"[b{batch}] rep {rep}: {dt:.2f}s -> "
                  f"{batch / (dt / SCAN_N):.2f} img/s", flush=True)
        results[batch] = batch / (best / SCAN_N)
        del trainer, state, m

    print("\nbatch  img/s   ms/step  img/s-per-batch9-equiv")
    for b, ips in results.items():
        print(f"{b:5d} {ips:7.2f} {b / ips * 1e3:8.1f}  {ips / b * 9:7.2f}")


if __name__ == "__main__":
    main()
