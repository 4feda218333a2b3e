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


def timeit(fn, x, n=50):
    """Chained scan + forced value fetch. block_until_ready is unreliable on
    the axon tunnel (can return at enqueue), and an un-chained loop measures
    dispatch rate. The scan carry perturbs the input each iteration so XLA
    cannot hoist ``fn`` out of the loop; the marginal over two scan lengths
    cancels the dispatch/fetch constant."""
    import numpy as np

    def chained(k):
        @jax.jit
        def run(z):
            def body(c, _):
                return c + 1e-6 * jnp.sum(fn(z * (1.0 + 1e-9 * c))), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
            return out
        return run

    times = {}
    for k in (n, 3 * n):
        r = chained(k)
        float(np.asarray(r(x)))  # compile + warm
        t0 = time.perf_counter()
        float(np.asarray(r(x)))
        times[k] = time.perf_counter() - t0
    return (times[3 * n] - times[n]) / (2 * n) * 1e3  # ms


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])
    z = jax.random.normal(jax.random.PRNGKey(0), (9, 256, 256, 16), jnp.float32)

    for name, fn in [("xla", feature_covariance), ("pallas", feature_covariance_pallas)]:
        ms = timeit(fn, z)
        grad = jax.grad(lambda x: jnp.sum(fn(x) ** 2))
        ms_g = timeit(grad, z)
        # roofline: one pass over 9*256*256*16*4 B = 37.7 MB (fwd); ~3 passes for bwd
        print(f"{name:7s} fwd {ms:7.3f} ms   fwd+bwd {ms_g:7.3f} ms")


if __name__ == "__main__":
    main()
