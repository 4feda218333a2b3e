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


_DC_CHILD = re.compile(
    r"^(?P<parent>(?:.*\.)?)(?P<child>conv1|bn1|conv2|bn2)\.(?P<leaf>[^.]+)$")


def rename_for_reference(state_dict: dict) -> dict:
    """Rewrite DoubleConv/DoubleConvWT child names into the reference's
    ``nn.Sequential`` spelling so the dict loads into *actual reference code*:
    ``conv1/bn1/conv2/bn2 -> double_conv.{0,1,3,4}`` for DoubleConv
    (``/root/reference/algorithms.py:398-413``) and ``conv1/conv2 ->
    double_conv.{0,2}`` for DoubleConvWT (``algorithms.py:416-428``) — the
    inverse of ``torch_import._rewrite_key``.

    Block kinds are inferred from the flat dict itself: ConvD/ConvU spell
    their convs directly (``algorithms.py:877-962``) and always own a
    ``conv3`` child, so any parent with ``conv3`` is left untouched; of the
    rest, a ``bn1`` sibling marks DoubleConv, its absence DoubleConvWT.
    BatchNorm ``num_batches_tracked`` buffers are not emitted — torch's
    ``load_state_dict(strict=False)`` and the reference's filtered-partial
    load pattern (``test_visulization.py:132-197``) both tolerate that.
    """
    parents_conv3 = {k[: -len("conv3.weight")] for k in state_dict
                     if k.endswith("conv3.weight")}
    parents_bn1 = set()
    for k in state_dict:
        m = _DC_CHILD.match(k)
        if m and m.group("child") == "bn1":
            parents_bn1.add(m.group("parent"))
    out = {}
    for k, v in state_dict.items():
        m = _DC_CHILD.match(k)
        if not m or m.group("parent") in parents_conv3:
            out[k] = v
            continue
        parent, child, leaf = m.group("parent"), m.group("child"), m.group("leaf")
        if child == "conv2":
            idx = "3" if parent in parents_bn1 else "2"
        else:
            idx = {"conv1": "0", "bn1": "1", "bn2": "4"}[child]
        out[f"{parent}double_conv.{idx}.{leaf}"] = v
    return out
