"""Pallas TPU kernel: fused per-sample feature covariance.

The whitening losses need ``cov_b = z_b^T z_b / (HW-1) + eps I`` for each
sample's (HW=65536, C=16) feature map (``/root/reference/algorithms.py:1277-1283``).
This kernel consumes the model's native NHWC layout directly — blocks of
(TILE_K, C) rows stream HBM -> VMEM and accumulate the 16x16 Gram matrix in a
VMEM scratch on the MXU; nothing but the 16x16 result is written back, and no
layout change ever materializes (an earlier BCHW variant spent more on its
transpose than the contraction; measured in scripts/bench_whitening.py).
A custom VJP supplies the exact backward ``dz = z @ (dG + dG^T)`` as a second
streaming kernel, so the op is usable inside the jitted train step.

The jnp path (``ops.whitening.feature_covariance``) stays the default — XLA
fuses this shape well; select the kernel with hparam ``use_pallas_whitening:
true``. Validated against the jnp path in ``tests/test_whitening_pallas.py``
(interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wt_pse_tpu.ops.whitening import EPS

TILE_K = 2048  # rows (H*W) per block. NB: the C=16 lane dim pads to 128 in
# VMEM, so a block costs TILE_K*128*4 B = 1 MB; 2048 keeps in+out double
# buffering inside the 16 MB scoped-vmem budget.

# None = auto: interpret off TPU (CPU tests), compiled on TPU. Tests may set
# True explicitly. jax 0.9's pltpu.force_tpu_interpret_mode() deadlocks on this
# CPU stack even for trivial kernels, so the generic interpreter is the CPU
# validation path instead.
INTERPRET: bool | None = None


def _interpret() -> bool:
    if INTERPRET is not None:
        return INTERPRET
    return jax.default_backend() != "tpu"


def _gram_kernel(z_ref, out_ref, acc_ref):
    """Accumulate z_tile^T @ z_tile over the K grid dimension.

    z_ref: (1, TILE_K, C) block of the (B, HW, C) input — rows on sublanes,
    C on lanes. acc_ref: (C, C) f32 VMEM scratch.
    """
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    zt = z_ref[0]  # (TILE_K, C)
    acc_ref[...] += jax.lax.dot_general(
        zt, zt, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # ambient MXU default is bf16-level

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        out_ref[0] = acc_ref[...]


def _gram(z_bkc: jax.Array) -> jax.Array:
    """(B, HW, C) f32 -> (B, C, C) Gram matrices via the streaming kernel."""
    b, hw, c = z_bkc.shape
    if hw % TILE_K:
        pad = TILE_K - hw % TILE_K
        z_bkc = jnp.pad(z_bkc, ((0, 0), (0, pad), (0, 0)))
        hw += pad
    grid = (b, hw // TILE_K)
    return pl.pallas_call(
        _gram_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, TILE_K, c), lambda i, k: (i, k, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, c, c), lambda i, k: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * c * c * hw, bytes_accessed=b * c * hw * 4,
            transcendentals=0),
        interpret=_interpret(),
    )(z_bkc)


def _dz_kernel(s_ref, z_ref, out_ref):
    """dz tile = z_tile @ S_sym, streaming over the same K grid."""
    s = s_ref[0]           # (C, C) symmetrized upstream gradient
    zt = z_ref[0]          # (TILE_K, C)
    out_ref[0] = jnp.dot(zt, s, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)


def _dz(s_sym: jax.Array, z_bkc: jax.Array) -> jax.Array:
    b, hw, c = z_bkc.shape
    pad = (-hw) % TILE_K
    if pad:
        z_bkc = jnp.pad(z_bkc, ((0, 0), (0, pad), (0, 0)))
    grid = (b, (hw + pad) // TILE_K)
    out = pl.pallas_call(
        _dz_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, c, c), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_K, c), lambda i, k: (i, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_K, c), lambda i, k: (i, k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, (hw + pad), c), jnp.float32),
        interpret=_interpret(),
    )(s_sym, z_bkc)
    return out[:, :hw, :]


@jax.custom_vjp
def feature_covariance_pallas(z: jax.Array) -> jax.Array:
    """Drop-in replacement for ``ops.whitening.feature_covariance``:
    NHWC ``z`` -> (B, C, C) covariance ``z^T z / (HW-1) + eps I``."""
    return _fwd_impl(z)


def _to_bkc(z):
    b, h, w, c = z.shape
    return z.reshape(b, h * w, c).astype(jnp.float32)  # layout no-op


def _fwd_impl(z):
    b, h, w, c = z.shape
    gram = _gram(_to_bkc(z))
    return gram / (h * w - 1) + EPS * jnp.eye(c, dtype=jnp.float32)


def _fwd(z):
    return _fwd_impl(z), z


def _bwd(z, g):
    b, h, w, c = z.shape
    s_sym = (g + jnp.swapaxes(g, 1, 2)) / (h * w - 1)
    dz_bkc = _dz(s_sym.astype(jnp.float32), _to_bkc(z))
    return (dz_bkc.reshape(b, h, w, c).astype(z.dtype),)


feature_covariance_pallas.defvjp(_fwd, _bwd)
