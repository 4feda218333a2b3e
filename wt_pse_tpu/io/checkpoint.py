"""Checkpoint save/restore.

Native format: orbax (one directory per checkpoint holding the 4-net ensemble's
params + batch_stats + opt state + step). Interop: the reference's ``.pth.tar``
4-state_dict format can be *read* via :mod:`wt_pse_tpu.io.torch_import` (the
released checkpoint path), and a minimal writer emits a torch-loadable dict so
reference tooling can consume checkpoints trained here.

Reference behavior being covered: best-on-validation save of
``{model, model_shape, model_oc, model_oc_shape}`` (``Trainer.py:282-288``) and the
filtered partial load (``test_visulization.py:132-197``).
"""

from __future__ import annotations

import os
import re

import jax
import numpy as np

from wt_pse_tpu.train.state import WTPSETrainState


def save_ensemble(path: str, state: WTPSETrainState):
    """Save the full train state with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, state), force=True)
    ckptr.wait_until_finished()


def restore_ensemble(path: str, template: WTPSETrainState) -> WTPSETrainState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    try:
        return ckptr.restore(os.path.abspath(path), template)
    except (ValueError, KeyError) as e:
        # orbax's structure-mismatch errors are deep tree diffs; surface the
        # usual root cause (checkpoint trained with a different --algorithm /
        # config than the template built here) before the raw detail
        raise ValueError(
            f"orbax restore from {path} does not match the model template "
            "(checkpoint trained with a different --algorithm or model "
            f"config?): {e}") from e


# ---------------------------------------------------------------------------
# torch-format export (so reference tooling can read our checkpoints)
# ---------------------------------------------------------------------------

_SEQ_HEADS = ("mu", "outc", "mu_prior", "logvar_prior", "fusion")


def _flatten(tree: dict, prefix=()) -> dict:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def _to_torch_key(path: tuple[str, ...], leaf: str) -> tuple[str, np.ndarray | None]:
    """Inverse of torch_import._rewrite_key for the module names we emit."""
    parts = list(path)
    # c{k} -> Sequential index 2k under the 1x1-conv heads
    if len(parts) >= 2 and parts[-2] in _SEQ_HEADS and re.fullmatch(r"c\d+", parts[-1]):
        idx = 2 * int(parts[-1][1:])
        parts = parts[:-2] + [parts[-2], str(idx)]
    # DoubleConv/DoubleConvWT conv/bn names -> double_conv indices are handled by
    # the reverse map at call site (needs module kind); keep flax names otherwise.
    return ".".join(parts), None


def export_torch_state_dict(variables: dict) -> dict:
    """Convert one net's flax variables into a torch-style state_dict of numpy
    arrays (conv kernels HWIO->OIHW). Note: DoubleConv* children are emitted with
    their flax names (conv1/bn1/...); ``torch_import.convert_state_dict`` accepts
    both spellings, so round-trip through this framework is exact. Loading into
    *actual reference code* additionally needs the double_conv index spelling —
    provided by ``rename_for_reference``.
    """
    out = {}
    for coll, leaf_map in (("params", {"kernel": "weight", "scale": "weight",
                                       "bias": "bias"}),
                           ("batch_stats", {"mean": "running_mean",
                                            "var": "running_var"})):
        flat = _flatten(variables.get(coll, {}))
        for path, arr in flat.items():
            *mods, leaf = path
            key, _ = _to_torch_key(tuple(mods), leaf)
            tleaf = leaf_map[leaf]
            if leaf == "kernel":
                arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
            out[f"{key}.{tleaf}" if key else tleaf] = arr
    return out
