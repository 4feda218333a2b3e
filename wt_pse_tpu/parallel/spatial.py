"""Spatial (and batch) partitioning of inference via GSPMD.

The reference's model is a conv U-Net on fixed 256² inputs — SURVEY.md §5: no
sequence dimension, so TP/PP/ring-attention are structurally inapplicable; the
meaningful extra axis is *spatial*. Here inference is partitioned by annotating
the image's H dimension (or the batch dimension) with a mesh axis and letting
XLA's SPMD partitioner insert the conv halo exchanges — no manual ring code, and
the result is bitwise the unsharded computation (verified in
``tests/test_spatial.py`` on a virtual 8-device mesh).

Use ``spatial_sharded(fn, mesh)`` for megapixel inputs that exceed one chip's
VMEM-friendly working set, ``batch_sharded(fn, mesh)`` for plain eval DP.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def _sharded_predict(predict_fn, mesh: Mesh, img_spec: P):
    """Shared wrapper: jit ONCE at wrap time (a per-call ``jax.jit`` would
    retrace/recompile every invocation — each ``jax.jit(fn)`` object carries
    its own cache), device_put the operands to their shardings per call."""
    img_sharding = NamedSharding(mesh, img_spec)
    jitted = {}  # arity -> compiled wrapper (variables count is call-dependent)

    def wrapped(*args):
        *variables, image = args
        n = len(variables)
        if n not in jitted:
            jitted[n] = jax.jit(
                predict_fn,
                in_shardings=(*(_replicated(mesh),) * n, img_sharding),
                out_shardings=img_sharding)
        variables = jax.tree.map(
            lambda x: jax.device_put(x, _replicated(mesh)), tuple(variables))
        image = jax.device_put(image, img_sharding)
        return jitted[n](*variables, image)

    return wrapped


def spatial_sharded(predict_fn, mesh: Mesh, axis: str = "data"):
    """Wrap ``predict_fn(*variable_trees, image)`` so the NHWC image (last arg)
    is sharded over its H dimension across ``axis``; variables replicated.
    XLA inserts halo exchanges for every conv/pool/resize crossing shard edges.
    """
    return _sharded_predict(predict_fn, mesh, P(None, axis, None, None))


def batch_sharded(predict_fn, mesh: Mesh, axis: str = "data"):
    """Shard the batch dimension across the mesh (eval data parallelism)."""
    return _sharded_predict(predict_fn, mesh, P(axis, None, None, None))
