"""Hyperparameter registry.

Reproduces the default/random hparam surface of the reference registry
(``/root/reference/hparams_registry.py:6-158``) for the two algorithms the framework
ships (``WT_PSE`` at lines 71-93, ``Unet_nips2023_joint_shape_regularization`` at
lines 95-146), as plain dict-producing functions with no framework dependencies.

Only the keys actually consumed by the training/eval pipeline are documented here;
the full key surface is kept so user configs written against the reference keep
working unchanged.
"""

from __future__ import annotations

import numpy as np

_COMMON = {
    "eval_steps": 400,
    "training_fraction": 0.8,
    "data_augmentation": True,
    "val_augment": False,
    "resnet18": False,
    "resnet_dropout": 0.5,
    "class_balanced": False,
    "optimizer": "adam",
    "freeze_bn": True,
    "pretrained": True,
    # non-SMALL_IMAGES branch (fundus) of hparams_registry.py:31-47
    "lr_gm": 1e-3,
    "lr_sc": 1e-3,
    "batch_size": 9,
    "weight_decay": 0.0,
    # --- framework extensions beyond the reference surface (all default to the
    # reference behavior; override as CLI leftovers, e.g. `--compute_dtype
    # bfloat16 --space_to_depth true`) ---
    # bf16 MXU compute with f32 master params/BN/losses; None = f32 HIGHEST
    "compute_dtype": None,
    # 2x2 space-to-depth execution of the 16-channel top level (ops/packed.py):
    # exact same math, ~2x the step rate on TPU
    "space_to_depth": False,
    # how many U-Net levels run packed under space_to_depth: 1 = top level,
    # 2 = also the 128²/32ch level (full 128-lane utilization there),
    # 3 = also the 64²/64ch level. On-chip (v5e, bf16, batch 9, marginal-scan):
    # unpacked 345 ms/step, levels=1 169 ms, levels=2 159 ms, levels=3 234 ms
    # (the 256-channel fold + pack/unpack transposes outweigh the lane gain) —
    # so 2 is the production default (scripts/bench_s2d_levels.py).
    "space_to_depth_levels": 2,
    # fused Pallas covariance kernel for the whitening loss (validated-correct;
    # XLA's einsum is faster at the shipped 16-channel shape, so default off)
    "use_pallas_whitening": False,
}

_WT_PSE = {
    "eval_steps": 90,
    "margin": 0,
    "shape_attention": True,
    "shape_prior": True,
    "cat_shape": False,
    "shape_attention_coeffient": 0.3,
    "shape_start": 0.5,
    "whitening": True,
    "shape_weight": 0,
    "instance_wt_gm": 1,
    "domain_wt_gm": 1,
    "instance_wt_sc": 1,
    "domain_wt_sc": 1,
    "multi-turn": 1,
    "sg_type": "oc",
    "whitening_type": "instance_wt",
    "wt_type_inference": "instance_wt",
}

_JOINT = {
    "num_mc": 10,
    "num_monte_carlo": 40,
    "moped_delta_factor": 0.1,
    "bnn_rho_init": -3,
    "kl_weight": 1,
    "ce_weight": 1,
    "global_weight": 0.1,
    "p_weight1": 2,
    "classifier": "SGP",
    "contrastive_type": "contrastive_plain_v2_segmentation",
    "contrastive_type_global": "contrastive_plain_v2_segmentation",
    "margin": 0,
    "pairs_number": 200,
    "global_loss": False,
    "global_metric": [True],
    "metric_dimension": 8,
    "level2_gamma": [1],
    "level1_gamma_global": [1],
    "level1_gamma": [1],
    "eval_steps": 90,
    "shape_attention": True,
    "shape_prior": True,
    "cat_shape": False,
    "shape_attention_coeffient": 0,
    "shape_start": 0.5,
    "whitening": False,
    "shape_weight": 0,
    "instance_wt_gm": 0,
    "domain_wt_gm": 0,
    "instance_wt_sc": 0,
    "domain_wt_sc": 0,
    "multi-turn": 1,
    "sg_type": "oc",
    "whitening_type": "instance_wt",
    "wt_type_inference": "instance_wt",
    "CCA_type": "cca_all",
    "CCA_transform_type": "ZCA",
    "posterior_transform_follow_prior": False,
}

ALGORITHMS = ("WT_PSE", "Unet_nips2023_joint_shape_regularization")


def default_hparams(algorithm: str, dataset: str = "fundus") -> dict:
    """Default hparams for ``algorithm`` (parity with hparams_registry.default_hparams)."""
    hp = dict(_COMMON)
    if algorithm == "WT_PSE":
        hp.update(_WT_PSE)
    elif algorithm == "Unet_nips2023_joint_shape_regularization":
        hp.update(_JOINT)
    return hp


def random_hparams(algorithm: str, dataset: str = "fundus", seed: int = 0) -> dict:
    """Random-search hparams (parity with hparams_registry.random_hparams:156-158).

    Only the numerically-searched keys the reference actually varies for fundus are
    randomized; boolean/structural flags stay at their defaults (as in the reference,
    where e.g. ``whitening`` random draw is a constant ``(True, True)``).
    """
    rs = np.random.RandomState(seed)
    hp = default_hparams(algorithm, dataset)
    hp["lr_gm"] = float(10 ** rs.uniform(-5, -3.5))
    hp["lr_sc"] = float(10 ** rs.uniform(-5, -3.5))
    hp["batch_size"] = int(2 ** rs.uniform(3, 5.5))
    hp["weight_decay"] = float(10 ** rs.uniform(-6, -2))
    if algorithm == "WT_PSE":
        hp["margin"] = float(rs.choice([1, 0.1, 0.01]))
        hp["shape_attention_coeffient"] = float(rs.choice([1, 0.1, 0.01]))
        hp["instance_wt_gm"] = float(rs.choice([1, 0.1, 0.25, 0.75]))
        hp["domain_wt_gm"] = float(rs.choice([1, 0.1, 0.25, 0.75]))
    return hp
