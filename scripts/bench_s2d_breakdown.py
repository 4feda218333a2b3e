"""Where does the space-to-depth step's remaining 175 ms go?

Marginal-scan methodology (see bench_step_breakdown.py — N vs 3N scans, forced
value fetch; dispatch constants cancel). Variants isolate the step's phases
under ``space_to_depth=True`` so the next optimization lever is data, not
guesswork:

  full step            -> everything (the bench.py headline)
  no whitening         -> drop the 2 covariance losses + their grads
  no shape/whiten      -> drop DeepWT/teacher/student entirely (pure 2x seg)
  seg fwd packed/unpck -> one WTPSE train forward, packed vs unpacked
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

B, HW = 9, 256
N = 10

marginal_ms = functools.partial(bench_common.marginal_ms, n=N)


def main():
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)

    from wt_pse_tpu.config import default_hparams
    from wt_pse_tpu.data.fundus import FundusDomain
    from wt_pse_tpu.models.common import ModelConfig
    from wt_pse_tpu.models.wt_pse import WTPSE
    from wt_pse_tpu.ops.packed import pack
    from wt_pse_tpu.train.trainer import Trainer

    # --- single forward, packed vs unpacked --------------------------------
    for s2d in (True, False):
        hp = default_hparams("WT_PSE")
        hp["compute_dtype"] = "bfloat16"
        hp["space_to_depth"] = s2d
        cfg = ModelConfig.from_hparams(hp)
        net = WTPSE(cfg)
        img = jnp.zeros((B, HW, HW, 3))
        msk = jnp.zeros((B, HW, HW, 1))
        v = net.init({"params": jax.random.PRNGKey(0)}, img, msk,
                     method=WTPSE.initialize)
        if s2d:
            img, msk = pack(img), pack(msk)
        eps = jnp.zeros(img.shape[:3] + (1 if not s2d else 4,), img.dtype)

        def fwd(x, net=net, v=v, msk=msk, eps=eps):
            out, _, _ = net.apply(v, x, msk, x, False, eps=eps)
            return out

        def body(x, fwd=fwd):
            o = fwd(x)
            # scalar feedback keeps the scan iterations serially dependent
            # (packed out has 4 phase-channels — no broadcast against 12)
            return x * 0.999 + (jnp.mean(o) * 1e-3).astype(x.dtype)

        def make(n, body=body, img=img):
            @jax.jit
            def run():
                def step(c, _):
                    return body(c), None
                out, _ = jax.lax.scan(step, img, None, length=n)
                return jnp.sum(out.astype(jnp.float32))
            return run

        marginal_ms(make, f"seg train fwd {'packed' if s2d else 'unpacked'}")

    # --- full-step variants -------------------------------------------------
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

    variants = [
        ("s2d full step", {"space_to_depth": True}),
        ("s2d no whitening", {"space_to_depth": True, "whitening": False}),
        ("s2d seg-only (no shape/whiten)", {"space_to_depth": True,
                                            "whitening": False,
                                            "shape_prior": False}),
        ("unpacked seg-only", {"whitening": False, "shape_prior": False}),
    ]
    for label, over in variants:
        hp = default_hparams("WT_PSE")
        hp["compute_dtype"] = "bfloat16"
        hp.update(over)
        tr = Trainer(hparams=hp, train_domains=doms, val_domain=val,
                     out_dir="/tmp/bench_s2d_breakdown", label="OD",
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


if __name__ == "__main__":
    main()
