"""Probe: does packing the SECOND U-Net level (32ch @128²) pay too?

Level 1 (16ch @256²) is already space-to-depth packed in production
(`ops/packed.py`, 2.0× the full step). The next candidate is level 2:
32ch @128² uses 32/128 MXU lanes; folded to 128ch @64² it would use all 128.
Same question for level 3 (64ch @64² -> 256ch @32²).

Times conv3x3 C->C stacks (x2, the DoubleConv shape) per level, packed vs
unpacked, bf16 batch 9, marginal-scan methodology (bench_s2d_probe.py). The
per-step win estimate multiplies by the pass count: the 4-phase step runs
~10 U-Net-scale passes (6 fwd + 4 bwd; bwd ≈ 2 conv applications per conv).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench_s2d_probe import conv, fold_kernel, s2d, scan_of, marginal_ms, DT, B


def main():
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    rng = np.random.RandomState(0)
    results = {}
    for level, (hw, c) in enumerate([(256, 16), (128, 32), (64, 64)], start=1):
        k1 = jnp.asarray(rng.randn(3, 3, c, c) * 0.1, DT)
        k2 = jnp.asarray(rng.randn(3, 3, c, c) * 0.1, DT)
        x = jnp.asarray(rng.randn(B, hw, hw, c), DT)
        kp1 = jnp.asarray(fold_kernel(k1), DT)
        kp2 = jnp.asarray(fold_kernel(k2), DT)
        xp = s2d(x)

        def unpacked(t, k1=k1, k2=k2):
            return conv(jax.nn.relu(conv(t, k1)), k2)

        def packed(t, kp1=kp1, kp2=kp2):
            return conv(jax.nn.relu(conv(t, kp1)), kp2)

        mu = marginal_ms(lambda n: scan_of(unpacked, x, n),
                         f"L{level} 2xconv3x3 {c}ch @{hw}^2 unpacked")
        mp = marginal_ms(lambda n: scan_of(packed, xp, n),
                         f"L{level} 2xconv3x3 {4*c}ch @{hw//2}^2 packed")
        results[level] = (mu, mp)
    print()
    for level, (mu, mp) in results.items():
        # ~10 passes/step x (2 DoubleConvs at this level per pass: down+up path)
        per_step = (mu - mp) * 10 * 2
        print(f"L{level}: packed saves {mu-mp:+.3f} ms per DoubleConv -> "
              f"~{per_step:+.1f} ms per 4-phase step if folded everywhere",
              flush=True)


if __name__ == "__main__":
    main()
