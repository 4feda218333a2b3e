"""Space-to-depth ("packed") execution for the 256²/16-channel network level.

Why: the WT-PSE nets put most of their work in 16-channel convs + BN/pool
plumbing at 256² (reference topology ``/root/reference/algorithms.py:877-962``).
On TPU the channel axis maps to the 128 MXU/VPU lanes, so 16-channel tensors
run at ≤1/8 utilization — measured round 3: a 3x3 16→16 conv at 256² runs 6.5x
slower than its exact repacked equivalent (``scripts/bench_s2d_conv.py``), and
the 256² level is ~76% of a U-Net forward. Repacking 2x2 pixels into 4x
channels moves that level to 64 lanes.

Layout: **channel-major phases**. ``pack`` maps NHWC ``(B, H, W, C)`` to
``(B, H/2, W/2, 4C)`` with packed channel index ``c*4 + (di*2 + dj)`` where
``(di, dj)`` is the pixel's position inside its 2x2 block. Channel-major means
concatenation of packed tensors along the channel axis is again a valid packed
tensor — skip connections need no re-indexing.

Exactness: parameters stay in the reference layout; kernels are *folded* at
apply time (a pure re-indexing einsum — no arithmetic beyond placing taps), so
the torch-checkpoint importer is untouched and every op below is the same math
as its unpacked counterpart:

- ``fold3x3``: a stride-1 SAME 3x3 conv C→D becomes a 3x3 conv 4C→4D on packed
  tensors (36 of 144 phase-tap blocks nonzero; SAME zero-padding in packed
  space corresponds exactly to SAME padding in original space).
- ``fold1x1``: block-diagonal ``kron(k, I4)``.
- max-pool 2x2/stride 2 == max over the 4 phases (windows align with blocks).
- 2x bilinear upsample (torch align_corners=False) == 4 per-phase matmul pairs
  with the even/odd rows of the resize matrix; output is packed.
- BatchNorm reduces over (N, H, W, phases) per original channel — statistics
  are bit-compatible with the unpacked layout (same set of elements).
- the whitening covariance contracts over (pixels) == (packed pixels, phases).

Elementwise ops (ReLU, sigmoid, masking, BCE terms, sums/means over all
elements) are phase-invariant and need no changes.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# S[a, q, d, t] = 1 iff output-phase d's tap t (of a 3-tap stencil) lands at
# packed offset a-1 with input phase q:  d + t - 1 = 2*(a-1) + q.
_S = np.zeros((3, 2, 2, 3), np.float32)
for _d in (0, 1):
    for _t in range(3):
        _m = _d + _t - 1
        _S[_m // 2 + 1, _m % 2, _d, _t] = 1.0


def pack(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel-major phases."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))  # b, h2, w2, c, di, dj
    return x.reshape(b, h // 2, w // 2, 4 * c)


def unpack(x: jax.Array) -> jax.Array:
    """Inverse of :func:`pack`."""
    b, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h2, w2, c, 2, 2)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))  # b, h2, di, w2, dj, c
    return x.reshape(b, 2 * h2, 2 * w2, c)


def fold3x3(kernel: jax.Array, bias: jax.Array | None):
    """(3,3,C,D) -> (3,3,4C,4D) packed-equivalent kernel (+ bias repeated 4x).

    Pure tap placement (one einsum over the 0/1 selection tensor ``_S``); done
    inside jit per apply — the folded kernels are tiny (<=150 KB)."""
    s = jnp.asarray(_S, kernel.dtype)
    # kr[a,b, c,qi,qj, d,di,dj] = sum_{t,u} S[a,qi,di,t] S[b,qj,dj,u] k[t,u,c,d]
    # HIGHEST is mandatory: S is 0/1 so the contraction is pure tap placement —
    # exact in f32 — but the ambient default would round the taps to bf16.
    kr = jnp.einsum("aqit,brju,tucd->abcqrdij", s, s, kernel,
                    precision=jax.lax.Precision.HIGHEST)
    c, d = kernel.shape[2], kernel.shape[3]
    kr = kr.reshape(3, 3, 4 * c, 4 * d)
    return kr, (None if bias is None else jnp.repeat(bias, 4))


def fold1x1(kernel: jax.Array, bias: jax.Array | None):
    """(1,1,C,D) -> (1,1,4C,4D): block structure kron(k, I4) in channel-major."""
    c, d = kernel.shape[2], kernel.shape[3]
    eye = jnp.eye(4, dtype=kernel.dtype)
    kr = jnp.einsum("cd,qp->cqdp", kernel[0, 0], eye,
                    precision=jax.lax.Precision.HIGHEST
                    ).reshape(1, 1, 4 * c, 4 * d)
    return kr, (None if bias is None else jnp.repeat(bias, 4))


def pbroadcast_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Multiply packed ``a`` (..., 4*Ca) by packed ``b`` (..., 4*Cb) with
    broadcasting over ORIGINAL channels (Cb == 1 or Cb == Ca) — the packed
    equivalent of NHWC broadcasting like ``embedding * attention`` where the
    gate has one channel."""
    ca, cb = a.shape[-1] // 4, b.shape[-1] // 4
    av = a.reshape(a.shape[:-1] + (ca, 4))
    bv = b.reshape(b.shape[:-1] + (cb, 4))
    return (av * bv).reshape(a.shape)


def phase_max_unpool(x: jax.Array) -> jax.Array:
    """Packed (B,h,w,4C) -> UNPACKED (B,h,w,C): max over the 4 phases ==
    torch MaxPool2d(2) of the unpacked tensor (windows align with 2x2 blocks)."""
    b, h, w, c4 = x.shape
    return jnp.max(x.reshape(b, h, w, c4 // 4, 4), axis=-1)


def _phase_resize_matrices(h: int):
    """Even/odd rows of the (2h, h) torch align_corners=False 2x bilinear
    matrix: out row 2i -> 0.25/0.75 on rows i-1,i (edge-clamped); row 2i+1 ->
    0.75/0.25 on i,i+1."""
    from wt_pse_tpu.models.layers import _linear_resize_matrix

    r = _linear_resize_matrix(h, 2 * h)
    return r[0::2], r[1::2]  # each (h, h)


def upsample2x_packed(x: jax.Array) -> jax.Array:
    """UNPACKED (B,h,w,C) -> PACKED (B,h,w,4C): torch 2x bilinear upsample with
    the output left in packed layout. Phase (di,dj) = R_di @ x @ R_dj^T.

    bf16 inputs use bf16 operands with f32 accumulation (the 2x weights
    0.25/0.75 are exact in bf16 — same argument as resize_bilinear's pow2
    path); f32 pins HIGHEST."""
    b, h, w, c = x.shape
    r0, r1 = _phase_resize_matrices(h)
    rs_h = jnp.stack([r0, r1])  # (2, h, h)
    if h == w:
        rs_w = rs_h
    else:
        r0w, r1w = _phase_resize_matrices(w)
        rs_w = jnp.stack([r0w, r1w])
    if x.dtype == jnp.bfloat16:
        y = jnp.einsum("uoh,nhwc->nuowc", rs_h.astype(jnp.bfloat16), x,
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        y = jnp.einsum("vpw,nuowc->nopcuv", rs_w.astype(jnp.bfloat16), y,
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    else:
        xf = x.astype(jnp.float32)
        y = jnp.einsum("uoh,nhwc->nuowc", rs_h, xf,
                       precision=jax.lax.Precision.HIGHEST)
        y = jnp.einsum("vpw,nuowc->nopcuv", rs_w, y,
                       precision=jax.lax.Precision.HIGHEST).astype(x.dtype)
    return y.reshape(b, h, w, 4 * c)
