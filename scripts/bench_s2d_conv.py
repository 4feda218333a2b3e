"""Focused conv timing: standard 16ch @256² vs s2d-folded 64ch @128² (bf16).
Higher iteration counts + repeats to beat tunnel noise."""

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
    print(f"{label:44s} {best:8.3f} ms/iter", flush=True)
    return best


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, 256, 256, 16), DT)
    k = jnp.asarray(rng.randn(3, 3, 16, 16) * 0.1, DT)
    xr = s2d(x)
    kr = jnp.asarray(fold_kernel(np.asarray(k, np.float32)), DT)

    measure(lambda c: conv(c, k) * 0.5 + c * 0.5, x, "conv3x3 16->16 @256^2")
    measure(lambda c: conv(c, kr) * 0.5 + c * 0.5, xr, "conv3x3 folded 64->64 @128^2")

    # a 3-conv chain (closer to ConvD: conv-bn-relu x2-3 fused by XLA)
    def chain(c, kk):
        for _ in range(3):
            c = jax.nn.relu(conv(c, kk))
        return c * 0.5

    measure(lambda c: chain(c, k) + c * 0.5, x, "3x(conv+relu) @256^2")
    measure(lambda c: chain(c, kr) + c * 0.5, xr, "3x(conv+relu) folded @128^2")


if __name__ == "__main__":
    main()
