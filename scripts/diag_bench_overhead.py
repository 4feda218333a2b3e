"""Diagnose where bench.py's pre-measurement wall-clock goes (round-3 bench work).

Stages timed separately: backend init/claim, first device op, trainer init
sub-stages, epoch_step trace (lower) vs compile, one execution.
"""
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

T0 = time.time()


def log(msg):
    print(f"[+{time.time() - T0:6.1f}s] {msg}", flush=True)


import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_explain_cache_misses", True)
log("jax imported")

devs = jax.devices()
log(f"devices: {devs}")
x = jnp_one = jax.numpy.ones(()) + 1
float(np.asarray(x))
log("first device op done")

from wt_pse_tpu.config import default_hparams  # noqa: E402
from wt_pse_tpu.data.fundus import FundusDomain  # noqa: E402

log("wt_pse_tpu imported")

hp = default_hparams("WT_PSE")
hp["compute_dtype"] = "bfloat16"
rng = np.random.RandomState(0)
B, HW = 9, 256


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

# --- trainer init sub-stages, inlined ---------------------------------------
from wt_pse_tpu.models.common import ModelConfig  # noqa: E402
from wt_pse_tpu.models.shape_prior import ShapeStudent  # noqa: E402
from wt_pse_tpu.models.wt_pse import WTPSE  # noqa: E402
from wt_pse_tpu.train.state import init_ensemble  # noqa: E402
from wt_pse_tpu.train.step import StepConfig, make_train_step  # noqa: E402
from wt_pse_tpu.train.trainer import stack_domains  # noqa: E402
from wt_pse_tpu.data.augment import make_device_batch_fn  # noqa: E402

cfg = ModelConfig.from_hparams(hp, n_classes=1)
main_od, main_oc = WTPSE(cfg), WTPSE(cfg, two_step=True)
stud_od, stud_oc = ShapeStudent(cfg), ShapeStudent(cfg)
log("models constructed")

key = jax.random.PRNGKey(1)
ik, rk = jax.random.split(key)
state, txs = init_ensemble(main_od, stud_od, main_oc, stud_oc,
                           (B, HW, HW, 3), ik, 5e-4, 5e-4, 5e-4, 5e-4)
jax.block_until_ready(state.od.params)
log("init_ensemble done")

data = stack_domains([dom(40), dom(40), dom(40)])
jax.block_until_ready(data["images"])
log("stack_domains done")

step_cfg = StepConfig(hp, 3, 3, True)
batch_fn = make_device_batch_fn(3)
train_step = make_train_step(main_od, stud_od, main_oc, stud_oc, txs, step_cfg)


def fused(st, dt, k):
    kb, ks = jax.random.split(k)
    return train_step(st, batch_fn(dt, kb), ks)


def epoch(st, dt, k, first, n):
    def body(s, i):
        return fused(s, dt, jax.random.fold_in(k, first + i))
    st, ms = jax.lax.scan(body, st, jax.numpy.arange(n))
    return st, jax.tree.map(lambda x: x.mean(0), ms)


jepoch = jax.jit(epoch, donate_argnums=(0,), static_argnums=(4,))
lowered = jepoch.lower(state, data, rk, 0, 10)
log("epoch_step LOWERED (trace)")
compiled = lowered.compile()
log("epoch_step COMPILED")
st2, m = compiled(state, data, rk, 0)
v = float(np.asarray(m["loss_seg"]))
log(f"epoch_step executed, loss={v:.4f}")
t0 = time.time()
st2, m = compiled(st2, data, rk, 10)
v = float(np.asarray(m["loss_seg"]))
log(f"second exec {time.time() - t0:.2f}s")
