"""Probe: does a space-to-depth repack of the shallow (16-channel, 256²) level
actually pay on this chip? (ROADMAP #3 feasibility, round 3)

Times, bf16, batch 9, marginal-scan methodology (see bench_step_breakdown.py):

  1. conv3x3 16->16 @256²                  vs the exact repacked equivalent
     conv3x3 64->64 @128² (folded kernel, 25% structurally nonzero)
  2. BN+ReLU @ (256²,16)                   vs @ (128²,64) (phase-grouped stats)
  3. maxpool 2x2 @ (256²,16)               vs phase-max @ (128²,64)
  4. U-Net bf16 forward at 256² vs 128² input (isolates the whole top level)
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

import bench_common
from bench_common import scan_of  # noqa: F401 — re-exported to sibling scripts

B = 9
N = 20
DT = jnp.bfloat16

marginal_ms = functools.partial(bench_common.marginal_ms, n=N, width=44)


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(DT)


def s2d(x):
    # LAYOUT WARNING: this probe packs PHASE-MAJOR (channel blocks of size c
    # per phase) — the PRODUCTION implementation (wt_pse_tpu/ops/packed.py) is
    # CHANNEL-MAJOR (out channel c*4+phase) and the two are NOT interchangeable.
    # Timing is layout-agnostic (same op shapes), which is all this probe and
    # its sibling scripts (bench_s2d_conv / bench_s2d_level2) measure; never
    # copy these helpers into the library or mix them with ops.packed tensors.
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, h // 2, w // 2, 4 * c)


def fold_kernel(k):
    """Exact fold of a 3x3 stride-1 SAME conv (C->D) into repacked space:
    (3,3,C,D) -> (3,3,4C,4D) operating on s2d tensors. Phase p=(di,dj) of the
    output at repacked (i,j) is original (2i+di, 2j+dj); its 3x3 taps land in
    repacked neighbors with input phase q=(ri%2, rj%2) at repacked offset
    ((di-1+ri)//2 - ... ) — computed index-wise below. 36/144 taps nonzero."""
    kh, kw, c, d = k.shape
    assert (kh, kw) == (3, 3)
    out = np.zeros((3, 3, 4 * c, 4 * d), np.float32)
    k = np.asarray(k, np.float32)
    for di in (0, 1):
        for dj in (0, 1):
            p = di * 2 + dj
            for ti in range(3):
                for tj in range(3):
                    # original input row = 2i+di + (ti-1) = 2(i+si)+ri
                    ri = (di + ti - 1) % 2
                    si = (di + ti - 1) // 2  # -1, 0 (repacked offset)
                    rj = (dj + tj - 1) % 2
                    sj = (dj + tj - 1) // 2
                    q = ri * 2 + rj
                    out[si + 1, sj + 1, q * c:(q + 1) * c, p * d:(p + 1) * d] += k[ti, tj]
    return jnp.asarray(out, k.dtype if hasattr(k, "dtype") else jnp.float32)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, 256, 256, 16), DT)
    k = jnp.asarray(rng.randn(3, 3, 16, 16) * 0.1, DT)
    xr = s2d(x)
    kr = jnp.asarray(fold_kernel(np.asarray(k, np.float32)), DT)

    # correctness of the fold
    y = conv(x, k)
    yr = conv(xr, kr)
    err = float(jnp.max(jnp.abs(s2d(y).astype(jnp.float32) - yr.astype(jnp.float32))))
    print("fold max err (bf16):", err, flush=True)

    marginal_ms(lambda n: scan_of(
        lambda c: conv(c, k) * 0.5 + c * 0.5, x, n), "conv3x3 16->16 @256^2")
    marginal_ms(lambda n: scan_of(
        lambda c: conv(c, kr) * 0.5 + c * 0.5, xr, n), "conv3x3 folded 64->64 @128^2")

    def bn_relu(z, c_eff):
        m = jnp.mean(z.astype(jnp.float32), axis=(0, 1, 2))
        v = jnp.var(z.astype(jnp.float32), axis=(0, 1, 2))
        zn = (z.astype(jnp.float32) - m) * jax.lax.rsqrt(v + 1e-5)
        return jax.nn.relu(zn).astype(DT)

    marginal_ms(lambda n: scan_of(
        lambda c: bn_relu(c, 16) * 0.5 + c * 0.5, x, n), "BN+ReLU @(256^2,16)")
    marginal_ms(lambda n: scan_of(
        lambda c: bn_relu(c, 64) * 0.5 + c * 0.5, xr, n), "BN+ReLU @(128^2,64)")

    def pool(z):
        return jax.lax.reduce_window(z, -jnp.inf, jax.lax.max,
                                     (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    def phase_max(z):
        b, h, w, c4 = z.shape
        return jnp.max(z.reshape(b, h, w, 4, c4 // 4), axis=3)

    marginal_ms(lambda n: scan_of(
        lambda c: jnp.concatenate([pool(c)] * 4, -1).reshape(c.shape) * 0.5 + c * 0.5,
        x, n), "maxpool2x2 @(256^2,16) (+restack)")
    marginal_ms(lambda n: scan_of(
        lambda c: jnp.concatenate([phase_max(c)] * 4, -1) * 0.5 + c * 0.5,
        xr, n), "phase-max @(128^2,64) (+restack)")

    # 1x1 head: 8 -> 1 at 256² vs repacked 32 -> 4 at 128² (block-diag fold)
    xe = jnp.asarray(rng.rand(B, 256, 256, 8), DT)
    ke = jnp.asarray(rng.randn(1, 1, 8, 1) * 0.1, DT)
    xer = s2d(xe)
    ker = jnp.asarray(np.kron(np.eye(4, dtype=np.float32),
                              np.asarray(ke, np.float32)[0, 0]).reshape(1, 1, 32, 4), DT)
    marginal_ms(lambda n: scan_of(
        lambda c: c + conv(c[..., :8], ke) * 0.01, xe, n), "1x1 8->1 @256^2 (+add)")
    marginal_ms(lambda n: scan_of(
        lambda c: c + conv(c, ker).repeat(8, -1) * 0.01, xer, n), "1x1 folded 32->4 @128^2 (+add)")

    # whole U-Net forward at 256 vs 128 input
    from wt_pse_tpu.config import default_hparams
    from wt_pse_tpu.models.common import ModelConfig
    from wt_pse_tpu.models.wt_pse import WTPSE

    hp = default_hparams("WT_PSE")
    hp["compute_dtype"] = "bfloat16"
    cfg = ModelConfig.from_hparams(hp)
    net = WTPSE(cfg)
    for hw in (256, 128):
        img = jnp.zeros((B, hw, hw, 3))
        msk = jnp.zeros((B, hw, hw, 1))
        v = net.init({"params": jax.random.PRNGKey(0)}, img, msk,
                     method=WTPSE.initialize)

        def fwd(z, v=v):
            return net.apply(v, z, method=WTPSE.predict_no_shape)

        marginal_ms(lambda n: scan_of(
            lambda c: c * 0.999 + fwd(c) * 1e-3, img, n), f"U-Net fwd @{hw}^2")


if __name__ == "__main__":
    main()
