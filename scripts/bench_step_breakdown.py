"""Where does the training step's device time go? (marginal-scan methodology)

axon's ``block_until_ready`` is unreliable (it sometimes returns at enqueue),
so every timing here drives N vs 3N iterations of a ``lax.scan`` whose carry
threads the computation, then FORCES a value fetch; the marginal
``(T_3N - T_N) / 2N`` cancels dispatch/fetch overhead and measures pure
device time per iteration.

Run on the real chip: ``python scripts/bench_step_breakdown.py``.
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

marginal_ms = functools.partial(bench_common.marginal_ms, n=N, width=34)


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])

    from wt_pse_tpu.config import default_hparams
    from wt_pse_tpu.models.common import ModelConfig
    from wt_pse_tpu.models.shape_prior import ShapeStudent
    from wt_pse_tpu.models.wt_pse import WTPSE

    for dtype_name in () if sys.argv[1:] else ("bfloat16", None):
        hp = default_hparams("WT_PSE")
        if dtype_name:
            hp["compute_dtype"] = dtype_name
        cfg = ModelConfig.from_hparams(hp)
        main_net = WTPSE(cfg)
        img = jnp.zeros((B, HW, HW, 3))
        msk = jnp.zeros((B, HW, HW, 1))
        v = main_net.init({"params": jax.random.PRNGKey(0)}, img, msk,
                          method=WTPSE.initialize)
        tag = dtype_name or "f32-HIGHEST"

        # 1. one U-Net predict forward (inference path, no BN mutation)
        def fwd(x):
            return main_net.apply(v, x, method=WTPSE.predict_no_shape)

        marginal_ms(lambda n: scan_of(
            lambda x: x * 0.999 + fwd(x) * 1e-3, img, n),  # (…,1) broadcasts
            f"[{tag}] U-Net predict fwd")

        # 2. fwd + bwd (grad wrt input, params fixed)
        def fb(x):
            g = jax.grad(lambda y: jnp.sum(fwd(y)))(x)
            return x * 0.999 + g * 1e-6

        marginal_ms(lambda n: scan_of(fb, img, n), f"[{tag}] U-Net fwd+bwd")

    # 3. the full production step (bf16), via the Trainer's own scan driver
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

    variants = [
        ("full step bf16", {"compute_dtype": "bfloat16"}),
        ("full step f32", {}),
        ("no whitening bf16", {"compute_dtype": "bfloat16", "whitening": False,
                               "shape_prior": True}),
        ("seg-only bf16 (no shape/whiten)", {"compute_dtype": "bfloat16",
                                             "whitening": False,
                                             "shape_prior": False}),
        # space-to-depth (production default levels=2) ablations: the phase
        # cost structure under the packed layout, by difference
        ("full step bf16 s2d2", {"compute_dtype": "bfloat16",
                                 "space_to_depth": True}),
        ("no whitening bf16 s2d2", {"compute_dtype": "bfloat16",
                                    "space_to_depth": True,
                                    "whitening": False, "shape_prior": True}),
        ("seg-only bf16 s2d2", {"compute_dtype": "bfloat16",
                                "space_to_depth": True,
                                "whitening": False, "shape_prior": False}),
    ]
    # CLI filter: `python bench_step_breakdown.py s2d2` runs only matching
    # variants (and skips the U-Net micro section) — one tunneled compile per
    # process keeps a run inside a shell timeout.
    sel = sys.argv[1:]
    if sel:
        variants = [(l, o) for l, o in variants if any(s in l for s in sel)]
    for label, over in variants:
        hp = default_hparams("WT_PSE")
        hp.update(over)
        tr = Trainer(hparams=hp, train_domains=[dom(40), dom(40), dom(40)],
                     val_domain=val, out_dir="/tmp/bench_breakdown", label="OD",
                     batch_size=B, max_epoch=1, interval_validate=99, seed=1,
                     val_visualization=False)

        def make(n, tr=tr):
            def run():
                st, m = tr.epoch_step(
                    jax.tree.map(jnp.copy, tr.state), tr.data,
                    jax.random.PRNGKey(0), 0, n)
                # per-step metric stack (shape (n,)) since the round-3
                # per-iteration observability change; fetch the last step
                return jnp.asarray(m["loss_seg"])[-1]
            return run

        marginal_ms(make, label)


if __name__ == "__main__":
    main()
