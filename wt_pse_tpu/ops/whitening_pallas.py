"""Pallas TPU kernel: fused per-sample feature covariance.

The whitening losses need ``cov_b = z_b z_b^T / (HW-1) + eps I`` for each sample's
(C=16, HW=65536) feature map (``/root/reference/algorithms.py:1277-1283``). This
kernel streams the feature map HBM -> VMEM once in lane-aligned (C, TILE_K) tiles
and accumulates the 16x16 Gram matrix in a VMEM scratch on the MXU — one pass over
the data, nothing but the 16x16 result written back. A custom VJP supplies the
exact backward ``dz = (dG + dG^T) @ z`` as a second streaming kernel, so the op is
usable inside the jitted train step.

The jnp path (``ops.whitening.feature_covariance``) stays the default — XLA already
fuses this shape well; the kernel is the building block for deeper fusion
(covariance + hinge + MMD in one launch) and is validated against the jnp path in
``tests/test_whitening_pallas.py`` (interpret mode on CPU, compiled on TPU).
Select it with hparam ``use_pallas_whitening: true``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wt_pse_tpu.ops.whitening import EPS

TILE_K = 4096  # HW tile (lane-aligned multiple of 128)


def _gram_kernel(z_ref, out_ref, acc_ref):
    """Accumulate z_tile @ z_tile^T over the K grid dimension.

    z_ref: (1, C, TILE_K) block of the (B, C, HW) input — C on sublanes,
    HW tile on lanes. acc_ref: (C, C) f32 VMEM scratch.
    """
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    zt = z_ref[0]  # (C, TILE_K)
    acc_ref[...] += jax.lax.dot_general(
        zt, zt, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        out_ref[0] = acc_ref[...]


def _gram(z_bchw: jax.Array) -> jax.Array:
    """(B, C, HW) f32 -> (B, C, C) Gram matrices via the streaming kernel."""
    b, c, hw = z_bchw.shape
    if hw % TILE_K:
        pad = TILE_K - hw % TILE_K
        z_bchw = jnp.pad(z_bchw, ((0, 0), (0, 0), (0, pad)))
        hw += pad
    grid = (b, hw // TILE_K)
    return pl.pallas_call(
        _gram_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, c, TILE_K), lambda i, k: (i, 0, k),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, c, c), lambda i, k: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * c * c * hw, bytes_accessed=b * c * hw * 4,
            transcendentals=0),
    )(z_bchw)


def _dz_kernel(s_ref, z_ref, out_ref):
    """dz tile = S_sym @ z_tile, streaming over the same K grid."""
    s = s_ref[0]           # (C, C) symmetrized upstream gradient
    zt = z_ref[0]          # (C, TILE_K)
    out_ref[0] = jnp.dot(s, zt, preferred_element_type=jnp.float32)


def _dz(s_sym: jax.Array, z_bchw: jax.Array) -> jax.Array:
    b, c, hw = z_bchw.shape
    pad = (-hw) % TILE_K
    if pad:
        z_bchw = jnp.pad(z_bchw, ((0, 0), (0, 0), (0, pad)))
    grid = (b, (hw + pad) // TILE_K)
    out = pl.pallas_call(
        _dz_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, c, c), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, TILE_K), lambda i, k: (i, 0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, TILE_K), lambda i, k: (i, 0, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, (hw + pad)), jnp.float32),
    )(s_sym, z_bchw)
    return out[:, :, :hw]


@jax.custom_vjp
def feature_covariance_pallas(z: jax.Array) -> jax.Array:
    """Drop-in replacement for ``ops.whitening.feature_covariance``:
    NHWC ``z`` -> (B, C, C) covariance ``z^T z / (HW-1) + eps I``."""
    return _fwd_impl(z)


def _to_bchw(z):
    b, h, w, c = z.shape
    return jnp.transpose(z.reshape(b, h * w, c), (0, 2, 1)).astype(jnp.float32)


def _fwd_impl(z):
    b, h, w, c = z.shape
    gram = _gram(_to_bchw(z))
    return gram / (h * w - 1) + EPS * jnp.eye(c, dtype=jnp.float32)


def _fwd(z):
    return _fwd_impl(z), z


def _bwd(z, g):
    b, h, w, c = z.shape
    s_sym = (g + jnp.swapaxes(g, 1, 2)) / (h * w - 1)
    dz_bchw = _dz(s_sym.astype(jnp.float32), _to_bchw(z))
    dz = jnp.transpose(dz_bchw, (0, 2, 1)).reshape(b, h, w, c)
    return (dz.astype(z.dtype),)


feature_covariance_pallas.defvjp(_fwd, _bwd)
