"""Microbenchmark: XLA einsum covariance vs the fused Pallas kernel, on-chip.

The round-1 end-to-end measurement with ``use_pallas_whitening=true`` was
pathologically slow (5.5 img/s vs 1253); this isolates the op itself (fwd and
fwd+bwd at the production shape: B=9 feature maps 256x256x16 from DeepWT) so the
kernel's standing is recorded from a direct measurement rather than inferred.

Run on the real chip: ``python scripts/bench_whitening.py``.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from wt_pse_tpu.ops.whitening import feature_covariance
from wt_pse_tpu.ops.whitening_pallas import feature_covariance_pallas


def timeit(fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])
    z = jax.random.normal(jax.random.PRNGKey(0), (9, 256, 256, 16), jnp.float32)

    for name, fn in [("xla", feature_covariance), ("pallas", feature_covariance_pallas)]:
        fwd = jax.jit(fn)
        ms = timeit(fwd, z)
        grad = jax.jit(jax.grad(lambda x: jnp.sum(fn(x) ** 2)))
        ms_g = timeit(grad, z)
        # roofline: one pass over 9*256*256*16*4 B = 37.7 MB (fwd); ~3 passes for bwd
        print(f"{name:7s} fwd {ms:7.3f} ms   fwd+bwd {ms_g:7.3f} ms")


if __name__ == "__main__":
    main()
