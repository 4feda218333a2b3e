"""Probe: does vmap-pairing the two topologically-identical seg phases win?

The 4-phase step runs OD and OC passes sequentially (reference
Trainer.py:762-924 semantics). The OD and OC nets share one module topology
(two_step is behavior-only), so phases 1+3 (and 2+4) can in principle run as a
single vmapped pass over stacked parameter trees — better MXU occupancy IF
XLA lowers the batched (grouped) convolutions efficiently. That lowering
quality is exactly what this probe measures, before committing to a step
restructure (ROADMAP #3b).

Methodology: marginal-scan (N vs 3N) with forced fetch, same as
scripts/bench_step_breakdown.py — cancels dispatch/fetch overhead on the
tunneled chip.

Compares, in the production mode (bf16 + space_to_depth levels=2, batch 9):
  a) sequential: seg update on OD net, then seg update on OC net
  b) paired:     one vmapped seg update over the stacked (OD, OC) nets
and the same pair for the shape-distillation phase.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

import bench_common
from bench_common import scan_of  # noqa: F401

B, HW = 9, 256
N = 10

marginal_ms = functools.partial(bench_common.marginal_ms, n=N, width=42)


def tree_sum(t):
    return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(t))


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])

    from wt_pse_tpu.config import default_hparams
    from wt_pse_tpu.models.common import ModelConfig
    from wt_pse_tpu.models.shape_prior import ShapeStudent
    from wt_pse_tpu.models.wt_pse import WTPSE
    from wt_pse_tpu.ops.packed import pack
    from wt_pse_tpu.train.state import init_ensemble
    from wt_pse_tpu.train.step import StepConfig, _seg_phase, _shape_phase, bce_probs

    hp = default_hparams("WT_PSE")
    hp["compute_dtype"] = "bfloat16"
    hp["space_to_depth"] = True
    cfg_m = ModelConfig.from_hparams(hp)
    main_od, main_oc = WTPSE(cfg_m), WTPSE(cfg_m, two_step=True)
    stud_od, stud_oc = ShapeStudent(cfg_m), ShapeStudent(cfg_m)
    state, txs = init_ensemble(main_od, stud_od, main_oc, stud_oc,
                               (B, HW, HW, 3), jax.random.PRNGKey(0))
    scfg = StepConfig(hp, domain_num=3, per_domain_batch=3)

    rngn = np.random.RandomState(0)
    img = pack(jnp.asarray(rngn.rand(B, HW, HW, 3) * 2 - 1, jnp.float32))
    tgt = pack(jnp.asarray((rngn.rand(B, HW, HW, 1) > 0.5), jnp.float32))
    img2 = pack(jnp.asarray(rngn.rand(B, HW, HW, 3) * 2 - 1, jnp.float32))
    tgt2 = pack(jnp.asarray((rngn.rand(B, HW, HW, 1) > 0.5), jnp.float32))
    key = jax.random.PRNGKey(1)

    # ---- a) sequential seg phases --------------------------------------------
    def seq_body(carry):
        od, oc, k = carry
        k, k1, k2 = jax.random.split(k, 3)
        od, _, _ = _seg_phase(main_od, txs["od"], od, img, tgt, img,
                              lambda out: bce_probs(out, tgt), scfg, k1)
        oc, _, _ = _seg_phase(main_oc, txs["oc"], oc, img2, tgt2, img2,
                              lambda out: bce_probs(out, tgt2), scfg, k2)
        return od, oc, k

    marginal_ms(lambda n: scan_of(seq_body, (state.od, state.oc, key), n),
                "[s2d2 bf16] 2x sequential seg phases")

    # ---- b) paired (vmapped) seg phase ---------------------------------------
    # stack the two nets; tx is elementwise (adam), safe under vmap
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), state.od, state.oc)
    imgs = jnp.stack([img, img2])
    tgts = jnp.stack([tgt, tgt2])

    def one(net, image, target, k):
        net, _, _ = _seg_phase(main_od, txs["od"], net, image, target, image,
                               lambda out: bce_probs(out, target), scfg, k)
        return net

    vone = jax.vmap(one)

    def paired_body(carry):
        net, k = carry
        k, ks = jax.random.split(k)
        net = vone(net, imgs, tgts, jax.random.split(ks, 2))
        return net, k

    marginal_ms(lambda n: scan_of(paired_body, (stacked, key), n),
                "[s2d2 bf16] 1x paired (vmap) seg phase")

    # ---- shape-distillation phase, sequential vs paired ----------------------
    def seq_shape(carry):
        od, ods, oc, ocs, k = carry
        k, k1, k2 = jax.random.split(k, 3)
        od, ods, _ = _shape_phase(main_od, stud_od, txs["od_shape"], od, ods,
                                  img, tgt, scfg, k1)
        oc, ocs, _ = _shape_phase(main_oc, stud_oc, txs["oc_shape"], oc, ocs,
                                  img2, tgt2, scfg, k2)
        return od, ods, oc, ocs, k

    marginal_ms(lambda n: scan_of(
        seq_shape, (state.od, state.od_shape, state.oc, state.oc_shape, key), n),
        "[s2d2 bf16] 2x sequential shape phases")

    stacked_main = jax.tree.map(lambda a, b: jnp.stack([a, b]), state.od, state.oc)
    stacked_stud = jax.tree.map(lambda a, b: jnp.stack([a, b]),
                                state.od_shape, state.oc_shape)

    def one_shape(mn, sn, image, mask, k):
        mn, sn, _ = _shape_phase(main_od, stud_od, txs["od_shape"], mn, sn,
                                 image, mask, scfg, k)
        return mn, sn

    vshape = jax.vmap(one_shape)

    def paired_shape(carry):
        mn, sn, k = carry
        k, ks = jax.random.split(k)
        mn, sn = vshape(mn, sn, imgs, tgts, jax.random.split(ks, 2))
        return mn, sn, k

    marginal_ms(lambda n: scan_of(paired_shape, (stacked_main, stacked_stud, key), n),
                "[s2d2 bf16] 1x paired (vmap) shape phase")

    # ---- the extra forward the pairing costs (to form the ROI pre-update) ----
    def fwd_only(carry):
        x, k = carry
        k, k1 = jax.random.split(k)
        (out, _, _) = main_od.apply(
            {"params": state.od.params, "batch_stats": state.od.batch_stats},
            x, tgt, x, False, rngs={"sample": k1})
        return x * 0.999 + jnp.mean(out) * 1e-6, k  # out is (B,H/2,W/2,4*n_classes) packed

    marginal_ms(lambda n: scan_of(fwd_only, (img, key), n),
                "[s2d2 bf16] 1x extra OD forward (eval mode)")


if __name__ == "__main__":
    main()
