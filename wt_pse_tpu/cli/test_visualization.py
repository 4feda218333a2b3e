"""Checkpoint inference + visualization CLI.

Reproduces ``test_visulization.py`` (``/root/reference/test_visulization.py:45-277``
— the released-checkpoint demo, BASELINE config 1): rebuild the 4 networks, load a
``.pth.tar`` (torch) or orbax checkpoint, run two-stage inference over a target
domain's test split, upsample to native label resolution, post-process, report
Dice/HD95/ASD means, and save contour overlays.

    python -m wt_pse_tpu.cli.test_visualization --datasetTest 4 --label OD \
        --data-dir /path/to/Fundus --model-file /path/to/checkpoint.pth.tar \
        --out ./vis_out
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax.numpy as jnp

from wt_pse_tpu.config import default_hparams, load_config
from wt_pse_tpu.data.fundus import encode_masks, load_fundus
from wt_pse_tpu.models.common import ModelConfig
from wt_pse_tpu.models.layers import resize_bilinear
from wt_pse_tpu.models.shape_prior import ShapeStudent
from wt_pse_tpu.models.wt_pse import WTPSE
from wt_pse_tpu.ops import metrics as M
from wt_pse_tpu.ops.postprocess import postprocess_logits
from wt_pse_tpu.train.eval import evaluate_domain, make_predict_fn
from wt_pse_tpu.utils.visualization import save_per_img


def build_networks_from_torch_ckpt(model_file: str, hparams: dict,
                                   n_classes: int = 1,
                                   algorithm: str = "WT_PSE",
                                   strict: bool = True):
    """Rebuild the 4 nets and overlay a reference-format checkpoint
    (test_visulization.py:122-197 filtered partial load). The load is strict
    by default: a checkpoint leaf with no slot in the selected template (wrong
    ``--algorithm``, wrong config) raises instead of silently evaluating
    freshly-initialized weights. ``strict=False`` (CLI ``--partial-load``)
    restores the reference's filter-update-load semantics — needed to evaluate
    a FULL checkpoint under a reduced ablation template (e.g.
    ``--whitening false``, whose DeepWT leaves then have no slot)."""
    import jax

    from wt_pse_tpu.io.torch_import import load_into_variables, load_reference_checkpoint

    cfg = ModelConfig.from_hparams(hparams, n_classes=n_classes)
    if algorithm == "Unet_nips2023_joint_shape_regularization":
        from wt_pse_tpu.models.joint import JointShapeReg

        main_od, main_oc = JointShapeReg(cfg), JointShapeReg(cfg, two_step=True)
    else:
        main_od, main_oc = WTPSE(cfg), WTPSE(cfg, two_step=True)
    stud_od, stud_oc = ShapeStudent(cfg), ShapeStudent(cfg)

    img = jnp.zeros((1, 256, 256, 3))
    mask = jnp.zeros((1, 256, 256, 1))
    k = jax.random.PRNGKey(0)
    v_od = main_od.init({"params": k}, img, mask, method=type(main_od).initialize)
    v_od_shape = stud_od.init({"params": k}, img, method=ShapeStudent.initialize)
    v_oc = main_oc.init({"params": k}, img, mask, method=type(main_oc).initialize)
    v_oc_shape = stud_oc.init({"params": k}, img, method=ShapeStudent.initialize)

    trees = load_reference_checkpoint(model_file)
    v_od, n1 = load_into_variables(v_od, trees["model"], strict=strict)
    v_od_shape, n2 = load_into_variables(v_od_shape, trees["model_shape"], strict=strict)
    v_oc, n3 = load_into_variables(v_oc, trees["model_oc"], strict=strict)
    v_oc_shape, n4 = load_into_variables(v_oc_shape, trees["model_oc_shape"], strict=strict)
    print(f"checkpoint leaves matched: model={len(n1)} shape={len(n2)} "
          f"oc={len(n3)} oc_shape={len(n4)}")
    to_dev = lambda t: jax.tree.map(jnp.asarray, t)
    nets = (main_od, stud_od, main_oc, stud_oc)
    variables = tuple(to_dev(v) for v in (v_od, v_od_shape, v_oc, v_oc_shape))
    return nets, variables


def build_networks_from_orbax(model_file: str, hparams: dict,
                              n_classes: int = 1, algorithm: str = "WT_PSE"):
    """Load an orbax ensemble directory written by this framework's Trainer
    (``save_ensemble``) — so checkpoints trained here are evaluable without a
    torch round-trip. Honors ``algorithm`` so joint-variant checkpoints restore
    into the matching (JointShapeReg) template."""
    import jax

    from wt_pse_tpu.io.checkpoint import restore_ensemble
    from wt_pse_tpu.train.state import init_ensemble

    cfg = ModelConfig.from_hparams(hparams, n_classes=n_classes)
    if algorithm == "Unet_nips2023_joint_shape_regularization":
        from wt_pse_tpu.models.joint import JointShapeReg

        nets = (JointShapeReg(cfg), ShapeStudent(cfg),
                JointShapeReg(cfg, two_step=True), ShapeStudent(cfg))
    else:
        nets = (WTPSE(cfg), ShapeStudent(cfg),
                WTPSE(cfg, two_step=True), ShapeStudent(cfg))
    state, _ = init_ensemble(*nets, (1, 256, 256, 3), jax.random.PRNGKey(0))
    state = restore_ensemble(model_file, state)
    variables = (state.od.variables, state.od_shape.variables,
                 state.oc.variables, state.oc_shape.variables)
    print(f"orbax ensemble restored from {model_file} (step {int(state.step)})")
    return nets, variables


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--datasetTrain", nargs="+", type=int, default=[1, 2, 3])
    p.add_argument("--datasetTest", nargs="+", type=int, default=[4])
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--data-dir", default="./dataset/")
    p.add_argument("--model-file", required=True)
    p.add_argument("--out", default="./vis_out")
    p.add_argument("--dataset", type=str, default="fundus")
    p.add_argument("--algorithm", type=str, default="WT_PSE")
    p.add_argument("--label", type=str, default="OD")
    p.add_argument("--save-images", action="store_true",
                   help="write contour overlays (original_image/ + overlay/)")
    p.add_argument("--partial-load", action="store_true",
                   help="skip checkpoint leaves with no slot in the template "
                        "(the reference's filtered partial load, "
                        "test_visulization.py:122-197) instead of raising — "
                        "for evaluating a full checkpoint under a reduced "
                        "ablation config")
    p.add_argument("--packed", action="store_true",
                   help="space-to-depth predict (~2x; exact same math at "
                        "reassociation level — default off: the unpacked path "
                        "is the checkpoint-parity path)")
    p.add_argument("configs", nargs="*")
    args, left = p.parse_known_args(argv)
    from wt_pse_tpu.cli.train import _repair_left_argv  # same argparse trap

    left, args.configs = _repair_left_argv(list(left), list(args.configs))

    hparams = default_hparams(args.algorithm, args.dataset)
    yamls = [c for c in ["config.yaml"] + list(args.configs) if os.path.exists(c)]
    hparams = load_config(hparams, yamls, left)

    n_classes = 1 if args.label in ("OC", "OD") else 2
    joint = args.algorithm == "Unet_nips2023_joint_shape_regularization"
    if os.path.isdir(args.model_file):  # orbax dir from our Trainer
        nets, variables = build_networks_from_orbax(
            args.model_file, hparams, n_classes, args.algorithm)
    else:  # reference-format .pth.tar (WT_PSE 4-net layout)
        nets, variables = build_networks_from_torch_ckpt(
            args.model_file, hparams, n_classes, args.algorithm,
            strict=not args.partial_load)
    if joint:
        from wt_pse_tpu.train.eval import make_predict_fn_joint

        predict_fn = make_predict_fn_joint(nets[0], nets[2], packed=args.packed)
    else:
        predict_fn = make_predict_fn(*nets, packed=args.packed)

    domain = load_fundus(args.data_dir, "test", args.datasetTest, state="prediction")
    od_masks, oc_masks = [], []
    for lab in domain.labels:
        od, oc = encode_masks(np.asarray(lab, np.uint8))
        od_masks.append(od)
        oc_masks.append(oc)

    res = evaluate_domain(predict_fn, variables, domain.images, od_masks, oc_masks,
                          args.label, args.batch_size)
    print({k: round(v, 4) for k, v in res.items()})

    if args.save_images:
        for i in range(len(domain.images)):
            img = jnp.asarray(domain.images[i : i + 1].astype(np.float32) / 127.5 - 1)
            out_od, out_oc = predict_fn(*variables, img)
            hw = od_masks[i].shape[-2:]
            od_l = np.asarray(resize_bilinear(out_od, hw))[0, ..., 0]
            oc_l = np.asarray(resize_bilinear(out_oc, hw))[0, ..., 0]
            p_oc = postprocess_logits(oc_l[None], label=args.label)[0]
            p_od = postprocess_logits(od_l[None], label=args.label)[0]
            # reference channel construction (test_visulization.py:243-249):
            # mask[pred_od==1]=[0,1]; mask[pred_oc==1]=[1,1] — the disc
            # channel is the UNION od|oc (cup pixels set it too), the cup
            # channel is oc alone
            pred = np.stack([p_oc, np.maximum(p_od, p_oc)])
            gt = np.stack([oc_masks[i], od_masks[i]])
            from wt_pse_tpu.models.layers import resize_bilinear as _rb
            native_img = np.asarray(_rb(
                jnp.asarray(domain.images[i : i + 1], jnp.float32), hw))[0]
            save_per_img(native_img.astype(np.uint8), args.out, str(i + 1), pred, gt)
    return res


if __name__ == "__main__":
    main()
