"""Probe (r4 VERDICT #2a): does a 4x4 top-level space-to-depth pay?

The production mode packs the 256²/16ch level 2x2 (64ch @128² — half the 128
MXU lanes). A 4x4 pack (256ch @64²) fills the lanes completely, but the folded
kernel's structural-zero ratio grows from 4x to 16x the semantic FLOPs:
lane-utilization gain x2 vs executed-FLOPs growth x4 predicts a ~2x LOSS over
2x2 — unless tile-padding effects dominate (as they did for 16ch, where 2x2
measured 6.5x despite 4x FLOPs). This probe measures it.

Method: the 4x4 transform is the 2x2 transform composed twice (pack twice,
fold the kernel twice — exactness composes), marginal-scan timing
(bench_common), bf16, batch 9. Layout is the probe's phase-major variant —
timing-equivalent to the production channel-major layout, NEVER library code.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from bench_s2d_probe import conv, fold_kernel, s2d, scan_of, DT, B

N = 100


def measure(body, x0, label):
    fns = {n: scan_of(body, x0, n) for n in (N, 3 * N)}
    for f in fns.values():
        float(np.asarray(f()))
    best = None
    for _ in range(3):
        ts = {}
        for n, f in fns.items():
            t0 = time.time()
            float(np.asarray(f()))
            ts[n] = time.time() - t0
        ms = (ts[3 * N] - ts[N]) / (2 * N) * 1e3
        best = ms if best is None else min(best, ms)
    print(f"{label:46s} {best:8.3f} ms/iter", flush=True)
    return best


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, 256, 256, 16), DT)
    k = jnp.asarray(rng.randn(3, 3, 16, 16) * 0.1, DT)
    k32 = np.asarray(rng.randn(3, 3, 16, 16) * 0.1, np.float32)

    x2 = s2d(x)                       # (B, 128, 128, 64)
    x4 = s2d(x2)                      # (B, 64, 64, 256)
    k2 = jnp.asarray(fold_kernel(k32), DT)                    # (3,3,64,64)
    k4 = jnp.asarray(fold_kernel(np.asarray(fold_kernel(k32),
                                            np.float32)), DT)  # (3,3,256,256)

    # exactness sanity of the composed fold (f32, small slab)
    xs = jnp.asarray(rng.rand(1, 16, 16, 16), jnp.float32)
    ref = conv(xs, jnp.asarray(k32, jnp.float32))
    got4 = conv(s2d(s2d(xs)), jnp.asarray(
        fold_kernel(np.asarray(fold_kernel(k32), np.float32)), jnp.float32))
    # undo the double pack for comparison
    def unpack(y):
        b, h, w, c4 = y.shape
        c = c4 // 4
        y = y.reshape(b, h, w, 2, 2, c)
        return jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(b, 2 * h, 2 * w, c)
    np.testing.assert_allclose(np.asarray(unpack(unpack(got4)), np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)
    print("composed 4x4 fold exactness: ok", flush=True)

    t1 = measure(lambda c: conv(c, k) * 0.5 + c * 0.5, x,
                 "conv3x3 16->16 @256^2 (unpacked)")
    t2 = measure(lambda c: conv(c, k2) * 0.5 + c * 0.5, x2,
                 "conv3x3 folded 64->64 @128^2 (2x2)")
    t4 = measure(lambda c: conv(c, k4) * 0.5 + c * 0.5, x4,
                 "conv3x3 folded 256->256 @64^2 (4x4)")

    def chain(c, kk):
        for _ in range(3):
            c = jax.nn.relu(conv(c, kk))
        return c * 0.5

    c1 = measure(lambda c: chain(c, k) + c * 0.5, x, "3x(conv+relu) @256^2")
    c2 = measure(lambda c: chain(c, k2) + c * 0.5, x2, "3x(conv+relu) 2x2")
    c4m = measure(lambda c: chain(c, k4) + c * 0.5, x4, "3x(conv+relu) 4x4")
    print(f"\nsingle conv: 4x4 is {t4 / t2:.2f}x the 2x2 time "
          f"({'LOSS' if t4 > t2 else 'WIN'}); vs unpacked {t4 / t1:.2f}x")
    print(f"conv chain:  4x4 is {c4m / c2:.2f}x the 2x2 time "
          f"({'LOSS' if c4m > c2 else 'WIN'}); vs unpacked {c4m / c1:.2f}x")


if __name__ == "__main__":
    main()
