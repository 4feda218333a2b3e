"""Full fused 4-phase step at space_to_depth_levels 1/2/3 (+ unpacked base).

Decides the production default for `space_to_depth_levels`: each deeper level
trades 4x MXU/VPU lane utilization at that level against pack/unpack
transposes and folded-kernel construction. Exactness at every level is gated
by tests/test_packed.py; this script only measures.

Marginal-scan methodology (bench_step_breakdown.py): N vs 3N epoch scans,
forced value fetch, dispatch constants cancel.
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

B, HW, N = 9, 256, 10

marginal_ms = functools.partial(bench_common.marginal_ms, n=N, width=34,
                                img_per_step=B)


def main():
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    from wt_pse_tpu.config import default_hparams
    from wt_pse_tpu.data.fundus import FundusDomain
    from wt_pse_tpu.train.trainer import Trainer

    rng = np.random.RandomState(0)

    def dom(n):
        return FundusDomain(
            images=(rng.rand(n, HW, HW, 3) * 255).astype(np.uint8),
            labels=rng.choice([0, 128, 255], size=(n, HW, HW)).astype(np.uint8),
            names=[str(i) for i in range(n)])

    val = FundusDomain(
        images=(rng.rand(2, HW, HW, 3) * 255).astype(np.uint8),
        labels=[rng.choice([0, 128, 255], size=(412, 412)).astype(np.uint8)
                for _ in range(2)],
        names=["a", "b"])
    doms = [dom(12), dom(12), dom(12)]

    variants = [("s2d levels=1", dict(space_to_depth=True,
                                      space_to_depth_levels=1)),
                ("s2d levels=2", dict(space_to_depth=True,
                                      space_to_depth_levels=2)),
                ("s2d levels=3", dict(space_to_depth=True,
                                      space_to_depth_levels=3)),
                ("unpacked base", {})]
    # CLI filter: `python bench_s2d_levels.py levels=2 predict` runs only the
    # matching variants — one tunneled compile per process keeps each run far
    # inside a driver/shell timeout (the full 12-compile sweep does not fit).
    sel = [a for a in sys.argv[1:]]
    if sel:
        variants = [(l, o) for l, o in variants
                    if any(s in l for s in sel)]
    for label, over in variants:
        hp = default_hparams("WT_PSE")
        hp["compute_dtype"] = "bfloat16"
        hp.update(over)
        tr = Trainer(hparams=hp, train_domains=doms, val_domain=val,
                     out_dir="/tmp/bench_s2d_levels", label="OD",
                     batch_size=B, max_epoch=1, interval_validate=99, seed=1,
                     val_visualization=False)

        def make(n, tr=tr):
            def run():
                st, m = tr.epoch_step(
                    jax.tree.map(jnp.copy, tr.state), tr.data,
                    jax.random.PRNGKey(0), 0, n)
                return m["loss_seg"][-1]
            return run

        marginal_ms(make, label)

    # run the predict section iff no filter, or a selector matches its
    # section name (same substring semantics as the variant filter above)
    if sel and not any(s in "two-stage predict" for s in sel):
        return
    # --- two-stage predict (eval path), packed vs unpacked ------------------
    from wt_pse_tpu.config import default_hparams as dh
    from wt_pse_tpu.models.common import ModelConfig
    from wt_pse_tpu.models.shape_prior import ShapeStudent
    from wt_pse_tpu.models.wt_pse import WTPSE
    from wt_pse_tpu.train.eval import make_predict_fn

    hp = dict(dh("WT_PSE"), space_to_depth=True, space_to_depth_levels=2)
    cfg = ModelConfig.from_hparams(hp)
    nets = (WTPSE(cfg), ShapeStudent(cfg), WTPSE(cfg, two_step=True),
            ShapeStudent(cfg))
    img = jnp.zeros((B, HW, HW, 3))
    msk = jnp.zeros((B, HW, HW, 1))
    k = jax.random.PRNGKey(0)
    vs = (nets[0].init({"params": k}, img, msk, method=WTPSE.initialize),
          nets[1].init({"params": k}, img, method=ShapeStudent.initialize),
          nets[2].init({"params": k}, img, msk, method=WTPSE.initialize),
          nets[3].init({"params": k}, img, method=ShapeStudent.initialize))
    for packed in (False, True):
        pf = make_predict_fn(*nets, packed=packed)

        def make(n, pf=pf):
            @jax.jit
            def run():
                def step(c, _):
                    od, oc = pf(*vs, c)
                    # consume BOTH stages: an unused oc lets XLA dead-code-
                    # eliminate the whole OC chain and time only stage 1
                    dep = jnp.mean(od) + jnp.mean(oc)
                    return c * 0.999 + (dep * 1e-3).astype(c.dtype), None
                out, _ = jax.lax.scan(step, img, None, length=n)
                return jnp.sum(out)
            return run

        marginal_ms(make, f"two-stage predict {'packed l2' if packed else 'unpacked'}")


if __name__ == "__main__":
    main()
