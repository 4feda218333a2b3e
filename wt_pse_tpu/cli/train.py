"""Training CLI — one-to-one flag surface with the reference
(``/root/reference/train.py:182-211``).

Usage (same as the reference):

    python -m wt_pse_tpu.cli.train --datasetTrain 1 2 4 --datasetTest 3 \
        --label OD --data-dir /path/to/Fundus --batch-size 9 [config.yaml ...]

Runs ``--running_times`` independent trainings and prints mean±std of the 6 best
metrics (train.py:174-175).
"""

from __future__ import annotations

import argparse
import os
from datetime import date

import numpy as np

from wt_pse_tpu.config import default_hparams, load_config
from wt_pse_tpu.data.fundus import load_fundus, load_train_domains
from wt_pse_tpu.train.trainer import Trainer
from wt_pse_tpu.utils.seed import seed_initialization


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("-g", "--gpu", type=int, default=0,
                   help="device id (kept for flag parity; JAX selects the TPU)")
    p.add_argument("--resume", default=None, help="checkpoint path")
    p.add_argument("--datasetTrain", nargs="+", type=int, default=[1, 2, 4],
                   help="train domain ids in [1,2,3,4]")
    p.add_argument("--datasetTest", nargs="+", type=int, default=[3],
                   help="test domain id, one of [1,2,3,4]")
    p.add_argument("--batch-size", type=int, default=9)
    p.add_argument("--group-num", type=int, default=1)
    p.add_argument("--max-epoch", type=int, default=200)
    p.add_argument("--stop-epoch", type=int, default=200)
    p.add_argument("--interval-validate", type=int, default=1)
    p.add_argument("--lr_od", type=float, default=5e-4)
    p.add_argument("--lr_od_shape", type=float, default=5e-4)
    p.add_argument("--lr_oc", type=float, default=5e-4)
    p.add_argument("--lr_oc_shape", type=float, default=5e-4)
    p.add_argument("--lr-decrease-rate", type=float, default=0.2)
    p.add_argument("--lam", type=float, default=0.9)
    p.add_argument("--data-dir", default="./dataset/")
    p.add_argument("--out", default=None, help="run output directory")
    p.add_argument("--out-stride", type=int, default=16)
    p.add_argument("--dataset", type=str, default="fundus")
    p.add_argument("--algorithm", type=str, default="WT_PSE")
    p.add_argument("configs", nargs="*")
    p.add_argument("--label", type=str, default="OD")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--running_times", type=int, default=3,
                   help="independent trainings to aggregate (mean±std of the 6 "
                        "best metrics, train.py:174-175). DOCUMENTED DEVIATION: "
                        "run r uses seed+r, so the std measures real seed "
                        "variance; the reference re-seeds IDENTICALLY each "
                        "repetition (train.py:53-54 inside the loop), making "
                        "its reported ±std the spread of identical runs (GPU "
                        "nondeterminism only). Pass --identical-reruns for "
                        "reference semantics")
    p.add_argument("--identical-reruns", action="store_true",
                   help="re-seed every repetition with the SAME --seed, exactly "
                        "like the reference (see --running_times); on TPU the "
                        "runs are then bit-identical and the std is 0")
    p.add_argument("--lr-schedule", action="store_true",
                   help="enable the linear-warmup + milestone-step-decay lr "
                        "schedule (the reference defines this as "
                        "Trainer.lr_update, Trainer.py:989-1004, but ships "
                        "with the call commented out, Trainer.py:1040 — "
                        "constant lr is the parity default) "
                        "[addition over the reference flag surface]")
    p.add_argument("--lr-warmup-epochs", type=int, default=None,
                   help="lr_update warmup_steps (epochs of linear warmup); "
                        "default: the reference call site's max_epoch * 2 "
                        "(Trainer.py:1020)")
    p.add_argument("--lr-warmup-factor", type=float, default=None,
                   help="lr_update warmup_factor (initial lr multiplier); "
                        "default 0.001 (Trainer.py:1017)")
    p.add_argument("--lr-gamma", type=float, default=None,
                   help="lr_update gamma (decay per passed milestone); "
                        "default 0.5 (Trainer.py:1019)")
    p.add_argument("--lr-milestones", nargs="*", type=int, default=None,
                   help="lr_update Steps: epoch indices at which lr decays "
                        "by --lr-gamma (bisect_right semantics); default "
                        "100 150 (Trainer.py:1018)")
    p.add_argument("--lr-clamp-warmup", action="store_true",
                   help="clamp the warmup factor at 1 after warmup (the "
                        "reference formula keeps growing it linearly — "
                        "replicated by default; see train/lr.py)")
    p.add_argument("--tensorboard", action="store_true",
                   help="write TensorBoard event files under out/tensorboard "
                        "(the reference always does; opt-in here) "
                        "[addition over the reference flag surface]")
    p.add_argument("--per-step-logging", action="store_true",
                   help="emit every training iteration's scalars to "
                        "metrics.jsonl (kind=step records — the reference's "
                        "per-iteration tensorboard stream, Trainer.py:957-969) "
                        "[addition over the reference flag surface]")
    p.add_argument("--train-visualization", action="store_true",
                   help="save train image grids (ROI/attention/target/pred; "
                        "Trainer.py:927-951 parity — every "
                        "--train-viz-interval iterations under both drivers) "
                        "[addition over the reference flag surface]")
    p.add_argument("--train-viz-interval", type=int, default=30,
                   help="iterations between train image grids (reference "
                        "hardcodes 30, Trainer.py:929)")
    p.add_argument("--fast-validation", action="store_true",
                   help="device-resident validation metrics (no host "
                        "post-processing; with space_to_depth also a packed "
                        "two-stage predict) [addition over the reference]")
    p.add_argument("--nan-recovery", action="store_true",
                   help="roll back to the last finite epoch instead of "
                        "raising on NaN loss [addition over the reference]")
    p.add_argument("--dp", dest="dp", action="store_true", default=None,
                   help="force shard_map data parallelism over all visible "
                        "devices (sync-BN, grad pmean, MMD all_gather over "
                        "ICI). Default: auto — enabled whenever more than one "
                        "device is visible; note auto-DP changes the per-seed "
                        "RNG decomposition vs a single-chip run (use --no-dp "
                        "to reproduce single-device numerics) [addition over "
                        "the reference]")
    p.add_argument("--no-dp", dest="dp", action="store_false",
                   help="force single-device training even on a multi-chip "
                        "slice")
    p.add_argument("--dp-devices", type=int, default=None,
                   help="cap the data-parallel mesh at N devices (default: "
                        "all visible)")
    p.add_argument("--compile-cache",
                   default=os.path.expanduser("~/.cache/wt_pse_tpu_xla"),
                   help="persistent XLA compile-cache dir (TPU compiles are "
                        "minutes-slow over remote links; cached they are "
                        "instant). Pass an empty string to disable. "
                        "[addition over the reference flag surface]")
    return p


def _repair_left_argv(left_argv: list[str], configs: list[str]):
    """argparse's ``configs`` positional (nargs='*') steals the value of any
    unknown ``--key value`` pair, leaving a dangling ``--key`` in the leftovers
    (so ``--compute_dtype bfloat16`` silently became ``compute_dtype=True`` —
    the reference's sconf pipeline has the same trap, train.py:44/207). Re-pair
    each dangling key with the next non-file positional, in order. ``--key=value``
    never hits this.
    """
    import os as _os

    def looks_like_config(c):
        # never re-pair something the user plainly meant as a YAML overlay —
        # a typo'd path should surface as "overlay not found", not silently
        # become some flag's value
        return c.endswith((".yaml", ".yml")) or _os.path.exists(c)

    orphans = [c for c in configs if not looks_like_config(c)]
    real_configs = [c for c in configs if looks_like_config(c)]
    dangling = [j for j, tok in enumerate(left_argv)
                if tok.startswith("--") and "=" not in tok
                and (j + 1 >= len(left_argv)
                     or left_argv[j + 1].startswith("--"))]
    if orphans and len(dangling) != len(orphans):
        # ambiguous: a value-less boolean flag among the dangling keys would
        # silently steal a value (e.g. `--some-flag --compute_dtype bfloat16`
        # repairing to some_flag='bfloat16'). Refuse hard rather than guess —
        # continuing would both drop the stolen value AND let the now-valueless
        # `--key` parse as boolean true, silently inverting an explicit
        # `--key false` for the whole run.
        raise SystemExit(
            f"ambiguous hparam arguments: {len(orphans)} positional value(s) "
            f"{orphans} vs {len(dangling)} value-less flag(s) "
            f"{[left_argv[j] for j in dangling]} — cannot re-pair safely; "
            "use --key=value form for hparam overrides")
    out, oi = [], 0
    for j, tok in enumerate(left_argv):
        out.append(tok)
        if j in dangling and oi < len(orphans):
            out.append(orphans[oi])
            oi += 1
    for c in real_configs:
        if not _os.path.exists(c):
            print(f"WARNING: config overlay not found: {c}")
    return out, real_configs


def main(args=None, left_argv=None):
    parser = build_parser()
    if args is None:
        args, left_argv = parser.parse_known_args()
    elif isinstance(args, (list, tuple)):
        # argv-style programmatic invocation: main(["--label", "OD", ...]);
        # hparam leftovers parse out the same way the shell path does, and an
        # explicit left_argv= is still honoured alongside them
        args, extra = parser.parse_known_args([str(a) for a in args])
        left_argv = list(left_argv or []) + extra
    left_argv, args.configs = _repair_left_argv(
        list(left_argv or []), list(args.configs))
    if getattr(args, "compile_cache", None):
        import jax

        jax.config.update("jax_compilation_cache_dir", args.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    result = {k: [] for k in ("DSC_OC", "HD_OC", "ASD_OC", "DSC_OD", "HD_OD", "ASD_OD")}

    out_root = args.out or os.path.join(
        "runs", f"Unet2D_{args.label}_{date.today()}_target{args.datasetTest[0]}")

    for run_idx in range(args.running_times):
        print("-" * 10, f"{args.algorithm}", "-" * 10)
        hparams = default_hparams(args.algorithm, args.dataset)
        yamls = [p for p in ["config.yaml"] + list(args.configs) if os.path.exists(p)]
        hparams = load_config(hparams, yamls, left_argv or [])

        run_seed = args.seed if args.identical_reruns else args.seed + run_idx
        seed_initialization(run_seed)
        if run_idx == 0:
            import jax

            # one writer: in a multi-host run every process executes this CLI,
            # and concurrent rmtree+copytree of the shared out_root/code dir
            # race (Trainer nulls its logger on non-zero processes for the
            # same reason)
            if jax.process_index() == 0:
                from wt_pse_tpu.utils.snapshot import save_code

                save_code(out_root, hparams)

        train_domains = load_train_domains(args.data_dir, args.datasetTrain)
        val_domain = load_fundus(args.data_dir, "test", args.datasetTest,
                                 state="prediction")

        trainer = Trainer(
            hparams=hparams,
            train_domains=train_domains,
            val_domain=val_domain,
            out_dir=os.path.join(out_root, f"run{run_idx}"),
            label=args.label,
            batch_size=args.batch_size,
            max_epoch=args.max_epoch,
            stop_epoch=args.stop_epoch,
            interval_validate=args.interval_validate,
            lr_od=args.lr_od,
            lr_od_shape=args.lr_od_shape,
            lr_oc=args.lr_oc,
            lr_oc_shape=args.lr_oc_shape,
            seed=run_seed,
            resume=args.resume if run_idx == 0 else None,
            algorithm=args.algorithm,
            tensorboard=args.tensorboard,
            per_step_logging=args.per_step_logging,
            train_visualization=args.train_visualization,
            train_viz_interval=args.train_viz_interval,
            fast_validation=args.fast_validation,
            nan_recovery=args.nan_recovery,
            dp=args.dp,
            dp_devices=args.dp_devices,
            lr_schedule=(dict(warmup_steps=args.lr_warmup_epochs,
                              warmup_factor=args.lr_warmup_factor,
                              gamma=args.lr_gamma,
                              milestones=args.lr_milestones,
                              clamp_warmup=args.lr_clamp_warmup)
                         if args.lr_schedule else None),
        )
        best = trainer.train()
        for key, value in zip(result.keys(), best):
            result[key].append(value)

    for key in result:
        # ddof=1 matches the reference's np.std(..., ddof=1) (train.py:174-175)
        # but is NaN (plus a RuntimeWarning) for a single run — report 0 spread
        spread = np.std(result[key], ddof=1) if len(result[key]) > 1 else 0.0
        print(f"Domain:{args.datasetTest[0]}",
              f"{key}:{np.mean(result[key])}+_{spread}")
    return result


if __name__ == "__main__":
    main()
