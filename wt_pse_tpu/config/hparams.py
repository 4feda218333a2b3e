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

    Mirrors the FULL ``(default, random)`` tuple surface of the reference
    registry in its exact dict-construction order — every ``random_state``
    draw happens in the same sequence with the same expression, so a seeded
    draw here equals ``hparams_registry.random_hparams(algorithm, dataset,
    seed)`` key-for-key (asserted against the real registry in
    ``tests/test_reference_parity_aux.py``). Note the random side is not
    "defaults plus overrides": e.g. the joint variant's ``global_metric``
    random value is ``True`` (default ``[True]``) and
    ``posterior_transform_follow_prior`` flips to ``True``
    (hparams_registry.py:120,146).
    """
    rs = np.random.RandomState(seed)
    choice = lambda opts: rs.choice(opts)
    hp = default_hparams(algorithm, dataset)  # non-drawn keys keep defaults

    # common block, draw order = hparams_registry.py:14-24
    hp["eval_steps"] = float(choice([1, 0.1, 0.01]))
    hp["training_fraction"] = float(choice([1, 0.1, 0.01]))
    hp["resnet_dropout"] = float(choice([0.0, 0.1, 0.5]))
    # fundus is not SMALL_IMAGES -> lines 32-47
    hp["lr_gm"] = float(10 ** rs.uniform(-5, -3.5))
    hp["lr_sc"] = float(10 ** rs.uniform(-5, -3.5))
    hp["batch_size"] = int(2 ** rs.uniform(3, 5.5))
    hp["weight_decay"] = float(10 ** rs.uniform(-6, -2))

    if algorithm == "WT_PSE":
        # lines 75-93, in order; (x, x) constant tuples consume no draw
        hp["eval_steps"] = float(choice([1, 0.1, 0.01]))
        hp["margin"] = float(choice([1, 0.1, 0.01]))
        hp["shape_attention_coeffient"] = float(choice([1, 0.1, 0.01]))
        hp["shape_start"] = float(choice([1, 0.1, 0.01]))
        hp["shape_weight"] = float(choice([1, 0.1, 0.25, 0.75]))
        hp["instance_wt_gm"] = float(choice([1, 0.1, 0.25, 0.75]))
        hp["domain_wt_gm"] = float(choice([1, 0.1, 0.25, 0.75]))
        hp["instance_wt_sc"] = float(choice([1, 0.1, 0.25, 0.75]))
        hp["domain_wt_sc"] = float(choice([1, 0.1, 0.25, 0.75]))
        hp["multi-turn"] = float(choice([1, 0.1, 0.25, 0.75]))
        hp["sg_type"] = str(choice(["oc", "od"]))
        hp["whitening_type"] = str(choice(["cca", "instance_wt"]))
        hp["wt_type_inference"] = str(choice(["instance_wt", "instance_wt"]))
    elif algorithm == "Unet_nips2023_joint_shape_regularization":
        # lines 97-146, in order
        hp["num_mc"] = int(choice([1, 1, 1]))
        hp["num_monte_carlo"] = int(choice([20, 30, 40, 50]))
        hp["moped_delta_factor"] = float(choice([0.1, 0.2, 0.3]))
        hp["bnn_rho_init"] = float(choice([-1, -2, -3, -4, -5]))
        hp["kl_weight"] = float(choice([1, 0.1, 0.5, 0.25, 0.75]))
        hp["ce_weight"] = float(choice([1, 0.1, 0.5, 0.25, 0.75]))
        hp["global_weight"] = float(choice([1, 0.1, 0.25, 0.75]))
        hp["p_weight1"] = float(choice([1, 0.1, 0.25, 0.75]))
        hp["classifier"] = str(choice(["SGP", "NO"]))
        hp["contrastive_type"] = str(
            choice(["contrastive", "triplet", "contrastive_plain"]))
        hp["contrastive_type_global"] = str(
            choice(["contrastive", "triplet", "contrastive_plain"]))
        hp["margin"] = float(choice([1, 0.1, 0.01]))
        hp["pairs_number"] = float(choice([1, 0.1, 0.01]))
        hp["global_metric"] = True  # ([True], True): constant, no draw
        hp["metric_dimension"] = float(choice([1, 10, 0.1]))
        hp["level2_gamma"] = float(choice([1, 10, 0.1]))
        hp["level1_gamma_global"] = float(choice([1, 0.01, 0.1]))
        hp["level1_gamma"] = float(choice([1, 0.1, 10]))
        hp["eval_steps"] = float(choice([1, 0.1, 0.01]))
        hp["shape_attention_coeffient"] = float(choice([1, 0.1, 0.01]))
        hp["shape_start"] = float(choice([1, 0.1, 0.01]))
        hp["shape_weight"] = float(choice([1, 0.1, 0.25, 0.75]))
        hp["instance_wt_gm"] = float(choice([1, 0.1, 0.25, 0.75]))
        hp["domain_wt_gm"] = float(choice([1, 0.1, 0.25, 0.75]))
        hp["instance_wt_sc"] = float(choice([1, 0.1, 0.25, 0.75]))
        hp["domain_wt_sc"] = float(choice([1, 0.1, 0.25, 0.75]))
        hp["multi-turn"] = float(choice([1, 0.1, 0.25, 0.75]))
        hp["sg_type"] = str(choice(["oc", "od"]))
        hp["whitening_type"] = str(choice(["cca", "instance_wt"]))
        hp["wt_type_inference"] = str(choice(["instance_wt", "instance_wt"]))
        hp["CCA_type"] = str(choice(["cca_all", "caa_random_2"]))
        hp["CCA_transform_type"] = str(choice(["ZCA", "CCA"]))
        hp["posterior_transform_follow_prior"] = True  # (False, True), no draw
    return hp
