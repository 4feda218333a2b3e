"""PyTorch ``.pth.tar`` state_dict -> Flax variables importer.

The reference saves a dict of 4 state_dicts keyed ``model`` / ``model_shape`` /
``model_oc`` / ``model_oc_shape`` (``/root/reference/Trainer.py:282-288``), loaded
with a filter-update-load partial pattern (``test_visulization.py:132-197``). Our
Flax modules keep the reference's module names, so conversion is a mechanical
key-rewrite + layout transpose:

- conv ``weight`` OIHW -> HWIO ``kernel``; ``bias`` unchanged;
- BatchNorm ``weight``/``bias`` -> ``scale``/``bias`` params;
  ``running_mean``/``running_var`` -> ``batch_stats`` ``mean``/``var``;
  ``num_batches_tracked`` dropped;
- torch Sequential indices -> named children:
  ``double_conv.{0,1,3,4}`` -> ``conv1,bn1,conv2,bn2`` (DoubleConv,
  ``algorithms.py:398-413``), ``double_conv.{0,2}`` -> ``conv1,conv2``
  (DoubleConvWT, ``algorithms.py:416-428``), and 1x1-conv stacks
  ``mu/outc/mu_prior/logvar_prior/fusion`` index ``2k`` -> ``c{k}``.

Unknown keys are skipped (matching the reference's filtered partial load); keys the
model expects but the checkpoint lacks keep their initialization values.
"""

from __future__ import annotations

import re

import numpy as np

_SEQ_HEADS = ("mu", "outc", "mu_prior", "logvar_prior", "fusion")


def _rewrite_key(key: str) -> str | None:
    """Rewrite one torch state_dict key into a '/'-joined flax path (sans leaf)."""
    if key.endswith("num_batches_tracked"):
        return None
    key = re.sub(r"(^|\.)double_conv\.0\.", r"\1conv1.", key)
    key = re.sub(r"(^|\.)double_conv\.1\.", r"\1bn1.", key)
    key = re.sub(r"(^|\.)double_conv\.2\.", r"\1conv2.", key)  # DoubleConvWT second conv
    key = re.sub(r"(^|\.)double_conv\.3\.", r"\1conv2.", key)
    key = re.sub(r"(^|\.)double_conv\.4\.", r"\1bn2.", key)

    def seq_sub(m):
        return f"{m.group(1)}.c{int(m.group(2)) // 2}."

    key = re.sub(rf"\b({'|'.join(_SEQ_HEADS)})\.(\d+)\.", seq_sub, key)
    return key


def convert_state_dict(state_dict: dict) -> dict:
    """Convert a torch state_dict (tensor or ndarray values) into
    ``{"params": ..., "batch_stats": ...}`` nested dicts (plain dicts of float32
    numpy arrays, ready for ``flax.core.freeze`` or direct use)."""
    params: dict = {}
    stats: dict = {}

    def insert(tree, path, leaf, value):
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = value

    for key, value in state_dict.items():
        # copy=True: torch .numpy() returns a VIEW of the live parameter
        # memory, and jnp.asarray on the CPU backend can alias numpy buffers —
        # without the copy, a later in-place torch optimizer step would mutate
        # the "imported" arrays behind JAX's back
        arr = np.array(getattr(value, "numpy", lambda: value)(),
                       dtype=np.float32, copy=True)
        new_key = _rewrite_key(key)
        if new_key is None:
            continue
        parts = new_key.split(".")
        path, leaf = parts[:-1], parts[-1]
        if leaf == "weight":
            if arr.ndim == 4:  # conv OIHW -> HWIO
                insert(params, path, "kernel", arr.transpose(2, 3, 1, 0))
            else:  # BN scale
                insert(params, path, "scale", arr)
        elif leaf == "bias":
            insert(params, path, "bias", arr)
        elif leaf == "running_mean":
            insert(stats, path, "mean", arr)
        elif leaf == "running_var":
            insert(stats, path, "var", arr)
        # anything else (buffers we don't model) is skipped
    return {"params": params, "batch_stats": stats}


def _merge(dst: dict, src: dict, path=()):  # partial-load: src wins where keys match
    matched, unmatched = [], []
    for k, v in src.items():
        here = "/".join(path + (k,))
        if k not in dst:
            unmatched += ([here] if not isinstance(v, dict) else
                          [f"{here}/{p}" for p in _leaf_paths(v)])
            continue
        if isinstance(v, dict) and isinstance(dst[k], dict):
            m, u = _merge(dst[k], v, path + (k,))
            matched += m
            unmatched += u
        elif not isinstance(v, dict) and not isinstance(dst[k], dict):
            if np.shape(dst[k]) == np.shape(v):
                dst[k] = np.asarray(v, dtype=np.asarray(dst[k]).dtype)
                matched.append(here)
            else:
                unmatched.append(f"{here} (shape {np.shape(v)} vs template "
                                 f"{np.shape(dst[k])})")
        else:
            unmatched.append(here)
    return matched, unmatched


def _leaf_paths(t: dict, path=()):
    for k, v in t.items():
        if isinstance(v, dict):
            yield from _leaf_paths(v, path + (k,))
        else:
            yield "/".join(path + (k,))


def load_into_variables(variables: dict, converted: dict,
                        strict: bool = False) -> tuple[dict, list[str]]:
    """Overlay converted torch weights onto initialized flax ``variables``
    (the reference's filter-update-load pattern). Returns (new_variables,
    list of matched leaf paths).

    ``strict=True`` raises when any checkpoint leaf finds no slot in the
    template (name or shape mismatch) — the signal that the checkpoint was
    trained for a different algorithm/config than the selected template, which
    a silent partial load would hide behind freshly-initialized weights."""
    import jax

    out = jax.tree_util.tree_map(np.asarray, dict(variables))
    # unfreeze-ish deep copy into plain dicts
    def to_plain(t):
        return {k: to_plain(v) for k, v in t.items()} if isinstance(t, dict) else t

    out = to_plain(out)
    matched, unmatched = [], []
    for coll in ("params", "batch_stats"):
        if coll in out and coll in converted:
            m, u = _merge(out[coll], converted[coll], (coll,))
            matched += m
            unmatched += u
    if strict and unmatched:
        preview = ", ".join(unmatched[:6])
        raise ValueError(
            f"checkpoint/template mismatch: {len(unmatched)} checkpoint "
            f"leaves have no slot in the selected model template (matched "
            f"{len(matched)}). First mismatches: {preview}. Is --algorithm "
            "set to the algorithm this checkpoint was trained with?")
    return out, matched


def load_reference_checkpoint(path: str) -> dict:
    """Read a reference ``checkpoint_*.pth.tar`` into 4 converted variable trees
    keyed model / model_shape / model_oc / model_oc_shape (Trainer.py:282-288)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    out = {}
    for key in ("model", "model_shape", "model_oc", "model_oc_shape"):
        if key in ckpt:
            out[key] = convert_state_dict(ckpt[key])
    return out
