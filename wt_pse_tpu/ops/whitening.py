"""Whitening-transform (covariance) losses and the cross-domain MMD penalty.

Formulas (behavioral spec, verified against golden torch tensors in
``tests/test_whitening.py``):

- per-feature-map covariance  ``f_cor = f @ f^T / (HW - 1) + eps*I``  with
  ``f: (B, C, HW)`` and eps = 1e-5 (``/root/reference/algorithms.py:1277-1283``);
- instance loss = hinge(sum |upper-tri(f_cor)| - margin) / C(C-1)/2, averaged over B,
  plus hinge(sum |diag(f_cor) - 1| - margin) / C, averaged over B
  (``algorithms.py:1289-1301``);
- domain loss = mean pairwise Gaussian-kernel MMD (gamma=1) between the per-domain
  blocks of the (B, C(C-1)/2) upper-triangle vectors (``algorithms.py:59-121``,
  slicing at 107: the batch is laid out domain-contiguously).

Reference quirks (both active in the released checkpoint's training run) are
replicated by default and switchable via ``replicate_ref_quirks=False``:

1. main net: losses are summed over the first 2 of 3 DeepWT maps but divided by 3
   (``algorithms.py:1259-1267``);
2. student net: the diag-term accumulator is clobbered each loop iteration and then
   added to itself, so the surviving value is ``2 * diag_loss(last map)``
   (``shape_networks.py:545-552``).

TPU notes: everything is a batched 16x16 matmul + tiny reductions; the covariance
contraction is done in f32 with HIGHEST precision so loss values are stable in bf16
training. A fused Pallas implementation lives in ``whitening_pallas.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-5


def feature_covariance(z: jax.Array, packed: bool = False) -> jax.Array:
    """Covariance of an NHWC feature map: (B, C, C) = f f^T / (HW-1) + eps*I.

    ``packed=True``: ``z`` is a space-to-depth tensor (..., 4C) in channel-major
    layout (ops/packed.py); the contraction runs over (packed pixels, phases) —
    the identical element set, so the covariance is the same matrix.

    Precision: f32 inputs contract with HIGHEST (true f32 — the ambient TPU
    default silently degrades to bf16-level, which breaks loss parity). bf16
    inputs (mixed-precision mode) contract natively on the MXU with f32
    accumulation — the operands are already bf16, so a HIGHEST f32 contraction
    could not recover accuracy and costs ~6x the MXU passes.
    """
    if packed:
        # contract over (packed pixels, phases) DIRECTLY — transposing to the
        # unpacked (b, hw, c) layout first materializes a full-resolution
        # reordered copy, which the r5 profiler measured at ~6 ms/step of pure
        # data formatting across the step's eight covariance sites
        b, h2, w2, c4 = z.shape
        c = c4 // 4
        n = 4 * h2 * w2
        f = z.reshape(b, h2 * w2, c, 4)
        eq = "bpcq,bpdq->bcd"
    else:
        b, h, w, c = z.shape
        n = h * w
        f = z.reshape(b, n, c)
        eq = "bpc,bpd->bcd"
    if f.dtype == jnp.bfloat16:
        cov = jnp.einsum(eq, f, f, preferred_element_type=jnp.float32)
    else:
        f = f.astype(jnp.float32)
        cov = jnp.einsum(eq, f, f, precision=jax.lax.Precision.HIGHEST)
    cov = cov / (n - 1)
    return cov + EPS * jnp.eye(c, dtype=jnp.float32)


def instance_whitening_terms(cov: jax.Array, margin: float = 0.0):
    """(off-diag hinge term, diag hinge term), each averaged over the batch."""
    b, c, _ = cov.shape
    upper = jnp.triu(jnp.ones((c, c), jnp.float32), k=1)
    num_off = c * (c - 1) / 2.0
    off_sum = jnp.sum(jnp.abs(cov * upper), axis=(1, 2)) - margin
    off_term = jnp.mean(jnp.maximum(off_sum / num_off, 0.0))

    diag = jnp.abs(jnp.diagonal(cov, axis1=1, axis2=2) - 1.0)
    diag_sum = jnp.sum(diag, axis=1) - margin
    diag_term = jnp.mean(jnp.maximum(diag_sum / c, 0.0))
    return off_term, diag_term


def upper_triangle_vectors(cov: jax.Array) -> jax.Array:
    """(B, C(C-1)/2) row-major upper-triangle entries — matches
    ``torch.triu_indices`` ordering (algorithms.py:1305-1306)."""
    c = cov.shape[1]
    iu, ju = jnp.triu_indices(c, k=1)
    return cov[:, iu, ju]


def _gaussian_mmd(x: jax.Array, y: jax.Array) -> jax.Array:
    """Gaussian-kernel (gamma=1) MMD between two (n, d) sets
    (algorithms.py:65-88; squared distances clamped at 1e-30)."""

    def cdist2(a, b):
        # HIGHEST precision: the ambient default may be bf16-ish, and exp(-D)
        # is sensitive near D=0 (the Kxx/Kyy diagonals).
        ab = jnp.matmul(a, b.T, precision=jax.lax.Precision.HIGHEST)
        d = jnp.sum(a * a, -1)[:, None] + jnp.sum(b * b, -1)[None, :] - 2.0 * ab
        return jnp.maximum(d, 1e-30)

    kxx = jnp.mean(jnp.exp(-cdist2(x, x)))
    kyy = jnp.mean(jnp.exp(-cdist2(y, y)))
    kxy = jnp.mean(jnp.exp(-cdist2(x, y)))
    return kxx + kyy - 2 * kxy


def domain_mmd(vectors: jax.Array, domain_num: int, per_domain_batch: int) -> jax.Array:
    """Mean pairwise MMD over domain-contiguous blocks of ``vectors``
    (algorithms.py:102-121). With one domain, returns 0 (reference returns the int
    ``penalty = 0`` untouched)."""
    if domain_num <= 1:
        return jnp.asarray(0.0, jnp.float32)
    blocks = [
        vectors[i * per_domain_batch : (i + 1) * per_domain_batch]
        for i in range(domain_num)
    ]
    penalty = 0.0
    for i in range(domain_num):
        for j in range(i + 1, domain_num):
            penalty = penalty + _gaussian_mmd(blocks[i], blocks[j])
    return penalty / (domain_num * (domain_num - 1) / 2)


def whitening_loss_single(z: jax.Array, domain_num: int, per_domain_batch: int,
                          margin: float = 0.0, axis_name: str | None = None,
                          axis_size: int = 1, cov_fn=None, packed: bool = False):
    """One feature map -> (off_term, diag_term, domain_term).

    Under ``shard_map`` data parallelism (``axis_name`` set), the local batch holds
    ``domain_num * per_domain_batch`` samples laid out domain-contiguously; the
    tiny (B, C(C-1)/2) covariance vectors are all-gathered over the mesh axis and
    re-interleaved so each global domain block is contiguous before the MMD —
    the only cross-device traffic the whitening loss needs (a few KB over ICI).
    Instance terms stay local: combined with the gradient ``pmean`` they equal the
    global-batch loss exactly (equal shards).
    """
    if packed:  # the Pallas cov kernel is unpacked-only; the einsum handles both
        cov = feature_covariance(z, packed=True)
    else:
        cov = (cov_fn or feature_covariance)(z)
    off_term, diag_term = instance_whitening_terms(cov, margin)
    vec = upper_triangle_vectors(cov)
    pdb = per_domain_batch
    if axis_name is not None and axis_size > 1:
        g = jax.lax.all_gather(vec, axis_name)  # (ndev, D*pdb_local, F)
        f = g.shape[-1]
        g = g.reshape(axis_size, domain_num, pdb, f)
        vec = jnp.transpose(g, (1, 0, 2, 3)).reshape(domain_num * axis_size * pdb, f)
        pdb = axis_size * pdb
    dom = domain_mmd(vec, domain_num, pdb)
    return off_term, diag_term, dom


def main_whitening_loss(wt_feats, domain_num: int, per_domain_batch: int,
                        margin: float = 0.0, replicate_ref_quirks: bool = True,
                        axis_name: str | None = None, axis_size: int = 1,
                        cov_fn=None, packed: bool = False):
    """Main-net whitening loss over the DeepWT list (algorithms.py:1256-1267).

    Returns (instance_loss, domain_loss). Sums maps 0..len-2; divides by len
    (quirk #1) or by the number of summed maps when quirks are disabled.
    """
    num = len(wt_feats)
    inst = 0.0
    dom = 0.0
    for z in wt_feats[: num - 1]:
        off_t, diag_t, dom_t = whitening_loss_single(
            z, domain_num, per_domain_batch, margin, axis_name, axis_size,
            cov_fn, packed)
        inst = inst + off_t + diag_t
        dom = dom + dom_t
    denom = num if replicate_ref_quirks else max(num - 1, 1)
    return inst / denom, dom / denom


def student_whitening_loss(wt_feats, domain_num: int, per_domain_batch: int,
                           margin: float = 0.0, replicate_ref_quirks: bool = True,
                           axis_name: str | None = None, axis_size: int = 1,
                           cov_fn=None, packed: bool = False):
    """Student-net whitening loss (shape_networks.py:537-554).

    Returns (inst_total, inst_offdiag, inst_diag, domain_loss) matching the
    reference's (instance_wt_loss_total, instance_wt_loss, instance_wt_loss2,
    domain_wt_loss) return order. ``inst_diag`` carries quirk #2 by default.
    """
    num = len(wt_feats)
    offs, diags, doms = [], [], []
    for z in wt_feats[: num - 1]:
        off_t, diag_t, dom_t = whitening_loss_single(
            z, domain_num, per_domain_batch, margin, axis_name, axis_size,
            cov_fn, packed)
        offs.append(off_t)
        diags.append(diag_t)
        doms.append(dom_t)
    if not diags:
        # single-map list (DeepWT(whitening=False) returns [x]): nothing to
        # whiten — return zeros like main_whitening_loss does, instead of
        # indexing diags[-1] below
        zero = jnp.asarray(0.0, jnp.float32)
        return zero, zero, zero, zero
    denom = num if replicate_ref_quirks else max(num - 1, 1)
    inst_off = sum(offs) / denom
    if replicate_ref_quirks:
        inst_diag = 2.0 * diags[-1] / denom  # clobber-then-double, see module docstring
    else:
        inst_diag = sum(diags) / denom
    dom = sum(doms) / denom
    return inst_off + inst_diag, inst_off, inst_diag, dom
