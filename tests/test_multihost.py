"""Multi-host (multi-process) data parallelism: the DCN story.

Spawns a REAL 2-process JAX cluster on CPU (``jax.distributed.initialize`` via
``parallel.distributed.initialize_multihost``, 4 virtual devices per process,
8 global) and runs the full 4-phase DP train step over the process-spanning
mesh — the same code path a multi-host TPU pod would run, with the gradient
pmean / sync-BN / MMD all_gather crossing the process boundary.

The DP design is multihost-friendly by construction (parallel/dp.py): every
input is replicated (state, HBM dataset, key), each device derives its local
batch from ``axis_index``, and out-specs are replicated — so both processes
must finish with identical metrics.

Caveat discovered here and encoded in the worker: the axon PJRT register hook
(PYTHONPATH=/root/.axon_site in the session env) hangs ``jax.distributed``'s
coordinator handshake — multi-process runs must strip it (a TPU pod would use
the real TPU plugin, not the tunnel shim).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # 2 subprocesses x whole-step compile (~2 min)

_WORKER = r"""
import os, sys
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

from wt_pse_tpu.parallel.distributed import initialize_multihost
assert initialize_multihost(f"localhost:{port}", nproc, pid)

import jax, numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from wt_pse_tpu.config import default_hparams
from wt_pse_tpu.models.common import ModelConfig
from wt_pse_tpu.models.shape_prior import ShapeStudent
from wt_pse_tpu.models.wt_pse import WTPSE
from wt_pse_tpu.parallel.dp import make_dp_train_step
from wt_pse_tpu.parallel.mesh import data_mesh
from wt_pse_tpu.train.state import init_ensemble

hw, domain_num, pdb_global = 32, 3, 8
hp = default_hparams("WT_PSE")
cfg = ModelConfig.from_hparams(hp, bn_axis_name="data")
nets = (WTPSE(cfg), ShapeStudent(cfg), WTPSE(cfg, two_step=True), ShapeStudent(cfg))
state, txs = init_ensemble(*nets, (domain_num * pdb_global, hw, hw, 3),
                           jax.random.PRNGKey(0))
mesh = data_mesh(len(jax.devices()))
rep = NamedSharding(mesh, P())

def to_global(x):
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, rep, lambda idx: x[idx])

state = jax.tree.map(to_global, state)
rng = np.random.RandomState(1)  # same seed in every process -> identical inputs
data = {"images": to_global((rng.rand(domain_num, 4, hw, hw, 3) * 255)
                            .astype(np.uint8)),
        "labels": to_global(rng.choice([0, 128, 255],
                                       size=(domain_num, 4, hw, hw))
                            .astype(np.uint8)),
        "sizes": to_global(np.asarray([4, 4, 4], np.int32))}
key = to_global(np.asarray(jax.random.PRNGKey(5)))

with mesh:
    dp_step = make_dp_train_step(*nets, txs, hp, mesh, domain_num, pdb_global)
    new_state, m = dp_step(state, data, key)
vals = {k: float(np.asarray(jax.device_get(v))) for k, v in sorted(m.items())}
assert all(np.isfinite(v) for v in vals.values()), vals
print(f"MH_OK {pid} " + " ".join(f"{k}={v:.6f}" for k, v in vals.items()),
      flush=True)
"""


_TRAINER_WORKER = r"""
import os, sys
pid, nproc, port, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

from wt_pse_tpu.parallel.distributed import initialize_multihost
assert initialize_multihost(f"localhost:{port}", nproc, pid)

import jax, numpy as np
from wt_pse_tpu.config import default_hparams
from wt_pse_tpu.data.fundus import FundusDomain
from wt_pse_tpu.train.trainer import Trainer

hw = 32

def dom(seed, n=8):
    r = np.random.RandomState(seed)  # same seed every process -> same data
    return FundusDomain(
        images=(r.rand(n, hw, hw, 3) * 255).astype(np.uint8),
        labels=r.choice([0, 128, 255], size=(n, hw, hw)).astype(np.uint8),
        names=[str(i) for i in range(n)])

val = dom(9, n=2)
val = FundusDomain(images=val.images, labels=[l for l in val.labels],
                   names=val.names)

trainer = Trainer(
    hparams=default_hparams("WT_PSE"), train_domains=[dom(s) for s in (1, 2, 3)],
    val_domain=val, out_dir=out, label="OD",
    batch_size=3 * 8,           # pdb 8 over the 8 global devices
    max_epoch=1, interval_validate=99, seed=3, image_size=hw,
    eval_batch_size=2, val_visualization=False, dp=True)
assert trainer.n_dev == 8 and jax.process_count() == 2
assert trainer.is_main_process == (pid == 0)
trainer.train()
m = trainer.validate()
vals = {k: float(v) for k, v in sorted(m.items())}
assert all(np.isfinite(v) for v in vals.values()), vals
# EVERY process calls the orbax save (primary host writes, all barrier —
# a process-0-only call deadlocks; probed and encoded in Trainer.train)
from wt_pse_tpu.io.checkpoint import save_ensemble
save_ensemble(os.path.join(out, "ck"), trainer.state)
print(f"MH_TRAINER_OK {pid} " + " ".join(f"{k}={v:.6f}" for k, v in vals.items()),
      flush=True)
"""


def test_two_process_trainer(tmp_path):
    """The PRODUCT multi-host path: Trainer(dp=True) under a real 2-process
    cluster — state/data lifted to global replicated arrays, the scan-epoch DP
    driver crossing the process boundary, validation computed identically on
    every process, and run-dir artifacts owned by process 0 alone."""
    worker = tmp_path / "worker_trainer.py"
    worker.write_text(_TRAINER_WORKER)
    port = 12000 + ((os.getpid() + 7) % 5000)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "PYTHONPATH": root}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    outs_dirs = [str(tmp_path / f"run{i}") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), "2", str(port), outs_dirs[i]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()
    lines = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        ok = [l for l in out.splitlines() if l.startswith("MH_TRAINER_OK")]
        assert p.returncode == 0 and ok, f"worker {i} failed:\n{out[-3000:]}"
        lines.append(ok[0].split(" ", 2)[2])
    # identical replicated metrics on both processes
    assert lines[0] == lines[1]
    # process 0 owns the artifacts; process 1's logger was null and the orbax
    # primary-host logic wrote only process 0's checkpoint
    assert os.path.exists(os.path.join(outs_dirs[0], "log.csv"))
    assert not os.path.exists(os.path.join(outs_dirs[1], "log.csv"))
    assert os.path.isdir(os.path.join(outs_dirs[0], "ck"))


def test_two_process_dp_step(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = 12000 + (os.getpid() % 5000)  # unique per test process
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "PYTHONPATH": root}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), "2", str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()
    lines = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        ok = [l for l in out.splitlines() if l.startswith("MH_OK")]
        assert p.returncode == 0 and ok, f"worker {i} failed:\n{out[-2000:]}"
        lines.append(ok[0].split(" ", 2)[2])  # metrics, pid stripped
    # replicated out-specs: both processes computed identical global metrics
    assert lines[0] == lines[1]
