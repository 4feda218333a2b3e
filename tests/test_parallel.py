"""shard_map DP: the dryrun path plus single-vs-multi-device equivalence."""


import pytest
import numpy as np

import jax
import jax.numpy as jnp

from wt_pse_tpu.config import default_hparams
from wt_pse_tpu.data.augment import make_device_batch_fn
from wt_pse_tpu.models.common import ModelConfig
from wt_pse_tpu.models.shape_prior import ShapeStudent
from wt_pse_tpu.models.wt_pse import WTPSE
from wt_pse_tpu.parallel.dp import make_dp_train_step
from wt_pse_tpu.parallel.mesh import data_mesh
from wt_pse_tpu.train.state import init_ensemble
from wt_pse_tpu.train.step import StepConfig, make_train_step

pytestmark = pytest.mark.slow  # compile-heavy; scripts/test.sh default skips


def test_devices_available():
    assert len(jax.devices()) == 8  # conftest virtual CPU mesh


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def _trainer_domains(hw=32):
    from wt_pse_tpu.data.fundus import FundusDomain

    def dom(seed, n=6):
        r = np.random.RandomState(seed)
        return FundusDomain(
            images=(r.rand(n, hw, hw, 3) * 255).astype(np.uint8),
            labels=r.choice([0, 128, 255], size=(n, hw, hw)).astype(np.uint8),
            names=[str(i) for i in range(n)])

    val = dom(9, n=2)
    from wt_pse_tpu.data.fundus import FundusDomain as FD
    val = FD(images=val.images, labels=[l for l in val.labels], names=val.names)
    return [dom(s) for s in (1, 2, 3)], val


def test_trainer_dp_product_path_matches_single_device(tmp_path):
    """The PRODUCT DP path (Trainer(dp=True) — what ``cli.train --dp``
    builds): on a 1-device mesh the shard_map plumbing (sync-BN pmean, MMD
    all_gather, grad pmean, per-device sampling) is the identity, so the same
    seed consumes the SAME batches and RNG stream as the plain single-device
    Trainer. Equality is semantic, not bitwise: shard_map compiles a different
    program than the plain step, so f32 fusion rounding differs, and with
    Adam's first steps being ~±lr*sign(grad) the noise-level gradient elements
    walk apart at lr scale over a trajectory (same phenomenon, same bounds as
    tests/test_reference_parity.py::test_full_iteration_matches_reference).
    So: tight single-step check + lr-scale-bounded 2-epoch trajectory check."""
    from wt_pse_tpu.train.trainer import Trainer

    hw = 32
    domains, val = _trainer_domains(hw)
    kw = dict(hparams=default_hparams("WT_PSE"), val_domain=val, label="OD",
              batch_size=3, max_epoch=2, interval_validate=99, seed=5,
              image_size=hw, val_visualization=False)
    t_dp = Trainer(train_domains=domains, out_dir=str(tmp_path / "dp"),
                   dp=True, dp_devices=1, **kw)
    assert t_dp.dp and t_dp.n_dev == 1
    t_1 = Trainer(train_domains=domains, out_dir=str(tmp_path / "sd"),
                  dp=False, **kw)

    # --- one step, identical init: same batch + same eps draws -> every loss
    # agrees to f32 fusion noise (fused_step donates; feed copies)
    key = jax.random.fold_in(t_dp.run_key, 0)
    _, m_dp = t_dp.fused_step(jax.tree.map(jnp.copy, t_dp.state), t_dp.data, key)
    _, m_1 = t_1.fused_step(jax.tree.map(jnp.copy, t_1.state), t_1.data, key)
    assert set(m_dp) == set(m_1)
    for k in m_dp:
        np.testing.assert_allclose(float(m_dp[k]), float(m_1[k]), rtol=2e-3,
                                   atol=1e-5, err_msg=k)

    # --- full 2-epoch product trajectories: lr-scale random-walk bound
    t_dp.train()
    t_1.train()
    lr = 5e-4
    for net in ("od", "od_shape", "oc", "oc_shape"):
        diffs = [np.abs(np.asarray(a) - np.asarray(b)).ravel()
                 for a, b in zip(
                     jax.tree.leaves(getattr(t_dp.state, net).params),
                     jax.tree.leaves(getattr(t_1.state, net).params))]
        flat = np.concatenate(diffs)
        # 12 Adam steps; each element bounded by a full sign-flip walk. On this
        # synthetic random-noise data nearly every gradient element sits at f32
        # noise level, so sign flips between the two compilations are maximal
        # and the bulk wanders at lr scale too (measured mean 8.8e-4 ~ 1.8*lr).
        # The *semantic* identity is pinned by the tight single-step metric
        # check above; this trajectory bound only rules out divergence beyond
        # the random-walk scale (blow-up, wrong batch streams).
        assert flat.max() <= 12 * 2 * lr, net
        assert flat.mean() <= 6 * lr, net


def test_trainer_auto_dp_degrades_and_explicit_dp_is_strict(tmp_path):
    """dp=None (auto) picks the largest mesh the per-domain batch divides —
    down to plain single-device for pdb=1 (so every pre-DP Trainer call is
    untouched on a multi-device host) — while an explicit dp=True with an
    indivisible batch raises."""
    import pytest as _pytest

    from wt_pse_tpu.train.trainer import Trainer

    hw = 32
    domains, val = _trainer_domains(hw)
    kw = dict(hparams=default_hparams("WT_PSE"), train_domains=domains,
              val_domain=val, label="OD", max_epoch=1, interval_validate=99,
              seed=1, image_size=hw, val_visualization=False)
    # auto + pdb=1: degrade all the way to the plain path
    t = Trainer(out_dir=str(tmp_path / "a"), batch_size=3, **kw)
    assert t.dp is False and t.n_dev == 1 and t.mesh is None
    # auto + pdb=3 on 8 devices: largest divisor mesh = 3
    t3 = Trainer(out_dir=str(tmp_path / "b"), batch_size=9, **kw)
    assert t3.dp is True and t3.n_dev == 3
    # explicit dp with an indivisible batch refuses
    with _pytest.raises(ValueError, match="divisible"):
        Trainer(out_dir=str(tmp_path / "c"), batch_size=3, dp=True,
                dp_devices=2, **kw)


def test_trainer_dp_multidevice_trains_and_validates(tmp_path):
    """Trainer(dp=True) on a real multi-device mesh: 2 scan-driven epochs with
    per-device sampling + sync-BN, then a batch-sharded validation; finite
    metrics and a device-count-independent (replicated) state that feeds the
    normal checkpoint writer."""
    from wt_pse_tpu.io.checkpoint import restore_ensemble, save_ensemble
    from wt_pse_tpu.train.trainer import Trainer

    hw, n_dev = 32, 4
    domains, val = _trainer_domains(hw)
    t = Trainer(hparams=default_hparams("WT_PSE"), train_domains=domains,
                val_domain=val, out_dir=str(tmp_path / "r"), label="OD",
                batch_size=3 * n_dev, max_epoch=2, interval_validate=99,
                seed=2, image_size=hw, eval_batch_size=n_dev,
                val_visualization=False, dp=True, dp_devices=n_dev)
    assert t.n_dev == n_dev
    t.train()
    m = t.validate()
    assert all(np.isfinite(v) for v in m.values())
    # replicated state round-trips through the ordinary checkpoint path
    save_ensemble(str(tmp_path / "ck"), t.state)
    restored = restore_ensemble(str(tmp_path / "ck"), t.state)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.od.params)[0]),
        np.asarray(jax.tree.leaves(t.state.od.params)[0]))


def test_dp_matches_single_device_semantics():
    """One DP step on 2 devices == one single-device step on the same global
    batch (same params, deterministic batch; sync-BN axis makes stats global)."""
    hw, domain_num, n_dev = 32, 3, 2
    pdb_global = 2
    batch_global = domain_num * pdb_global

    hp = dict(default_hparams("WT_PSE"))
    cfg_dp = ModelConfig.from_hparams(hp, bn_axis_name="data")
    cfg_1 = ModelConfig.from_hparams(hp)

    def build(cfg):
        return (WTPSE(cfg), ShapeStudent(cfg), WTPSE(cfg, two_step=True),
                ShapeStudent(cfg))

    nets_dp = build(cfg_dp)
    nets_1 = build(cfg_1)
    state_dp, txs_dp = init_ensemble(*nets_dp, (batch_global, hw, hw, 3),
                                     jax.random.PRNGKey(0))
    state_1, txs_1 = init_ensemble(*nets_1, (batch_global, hw, hw, 3),
                                   jax.random.PRNGKey(0))
    # identical params regardless of bn axis
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(state_dp.od.params)[0]),
        np.asarray(jax.tree.leaves(state_1.od.params)[0]))

    rng = np.random.RandomState(0)
    imgs = (rng.rand(domain_num, 4, hw, hw, 3) * 255).astype(np.uint8)
    labs = rng.choice([0, 128, 255], size=(domain_num, 4, hw, hw)).astype(np.uint8)
    data = {"images": jnp.asarray(imgs), "labels": jnp.asarray(labs),
            "sizes": jnp.asarray([4, 4, 4], jnp.int32)}

    mesh = data_mesh(n_dev)
    with mesh:
        dp_step = make_dp_train_step(*nets_dp, txs_dp, hp, mesh, domain_num,
                                     pdb_global)
        new_dp, m_dp = dp_step(state_dp, data, jax.random.PRNGKey(7))

    # single-device run over the SAME global batch: reproduce the per-device
    # sampling (fold_in axis_index) and concatenate domain blocks in gather order
    pdb_local = pdb_global // n_dev
    batch_fn = make_device_batch_fn(pdb_local)
    parts = []
    for dev in range(n_dev):
        key = jax.random.fold_in(jax.random.PRNGKey(7), dev)
        kb, ks = jax.random.split(key)
        parts.append((batch_fn(data, kb), ks))
    # interleave: global domain-contiguous layout = for each domain, dev0 then dev1
    def interleave(field):
        chunks = []
        for d in range(domain_num):
            for dev in range(n_dev):
                arr = parts[dev][0][field]
                chunks.append(arr[d * pdb_local : (d + 1) * pdb_local])
        return jnp.concatenate(chunks)

    batch = {k: interleave(k) for k in ("image", "target_od", "target_oc")}

    # NOTE: the RNG draws inside the step (teacher/student eps) differ between the
    # two runs (per-device streams vs one stream), so we compare only the
    # RNG-independent phase-1 segmentation loss and the updated seg params'
    # gradient direction via the loss value itself.
    step_1 = make_train_step(*nets_1, txs_1,
                             StepConfig(hp, domain_num, pdb_global))
    new_1, m_1 = jax.jit(step_1)(state_1, batch, jax.random.PRNGKey(7))

    # Sync-BN computes mean-of-means / pmean'd E[x^2]; vs the single-device direct
    # global reduction that's a different f32 summation order, and the rounding
    # compounds through ~24 BN layers — equivalence here is semantic (same math),
    # bounded at ~1e-3 relative, not bitwise.
    np.testing.assert_allclose(float(m_dp["loss_seg"]), float(m_1["loss_seg"]),
                               rtol=2e-3)
    np.testing.assert_allclose(float(m_dp["loss_ins_wt"]), float(m_1["loss_ins_wt"]),
                               rtol=5e-3)
    np.testing.assert_allclose(float(m_dp["loss_dom_wt"]), float(m_1["loss_dom_wt"]),
                               rtol=5e-3, atol=1e-5)
    # phase-1 param update must agree to Adam-step scale (grads RNG-independent)
    a = np.asarray(jax.tree.leaves(new_dp.od.params)[0])
    b = np.asarray(jax.tree.leaves(new_1.od.params)[0])
    np.testing.assert_allclose(a, b, rtol=1e-2, atol=5e-5)


def test_dp_s2d_whitening_matches_single_device():
    """Packed whitening under shard_map: whitening_loss_single(packed=True) on 2
    devices (MMD vectors all_gathered + re-interleaved) == unpacked single-device
    loss on the same global batch — the covariance is layout-invariant and the
    gather must preserve domain-contiguity either way."""
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from wt_pse_tpu.ops.packed import pack
    from wt_pse_tpu.ops.whitening import whitening_loss_single

    domain_num, pdb_global, hw, c, n_dev = 3, 2, 16, 16, 2
    rng = np.random.RandomState(3)
    z = jnp.asarray(rng.randn(domain_num * pdb_global, hw, hw, c)
                    .astype(np.float32))

    ref = whitening_loss_single(z, domain_num, pdb_global, margin=0.1)

    mesh = data_mesh(n_dev)
    # device-local layout: each device holds pdb_local items of EVERY domain
    # (the DP sampler's layout) -> global batch = interleave(domain, device)
    pdb_local = pdb_global // n_dev
    local = z.reshape(domain_num, pdb_global, hw, hw, c)
    dev_batches = [
        pack(jnp.concatenate([local[d, dev * pdb_local:(dev + 1) * pdb_local]
                              for d in range(domain_num)]))
        for dev in range(n_dev)
    ]
    stacked = jnp.stack(dev_batches)  # (n_dev, local_b, hw/2, hw/2, 4c)

    @partial(shard_map, mesh=mesh, in_specs=P("data"), out_specs=P("data"))
    def run(zp):
        zp = zp[0]  # shard_map keeps the leading stacked axis locally
        off, diag, dom = whitening_loss_single(
            zp, domain_num, pdb_local, margin=0.1, axis_name="data",
            axis_size=n_dev, packed=True)
        return jnp.stack([off, diag, dom])[None]

    with mesh:
        got = np.asarray(run(stacked))  # (n_dev, 3) per-device values
    # instance terms are device-local means over equal shards: their average
    # equals the global-batch value (that's what the gradient pmean realizes)
    np.testing.assert_allclose(got[:, 0].mean(), float(ref[0]), rtol=1e-5)
    np.testing.assert_allclose(got[:, 1].mean(), float(ref[1]), rtol=1e-5)
    # the domain MMD is computed on the all_gathered global set: identical on
    # every device and equal to the single-device value
    np.testing.assert_allclose(got[:, 2], float(ref[2]), rtol=1e-5)


@pytest.mark.parametrize("levels", [1, 2])
def test_dp_s2d_full_step_runs_and_is_finite(levels):
    """Full 4-phase DP step with space_to_depth=True on 2 devices: the packed
    layout must compose with sync-BN pmean (phase-grouped statistics), the
    pos-weight psum and the MMD gather; metrics finite, state updated.
    ``levels=2`` also runs the second U-Net level folded under shard_map."""
    hw, domain_num, n_dev, pdb_global = 32, 3, 2, 2
    hp = dict(default_hparams("WT_PSE"), space_to_depth=True,
              space_to_depth_levels=levels)
    cfg = ModelConfig.from_hparams(hp, bn_axis_name="data")
    nets = (WTPSE(cfg), ShapeStudent(cfg), WTPSE(cfg, two_step=True),
            ShapeStudent(cfg))
    state, txs = init_ensemble(*nets, (domain_num * pdb_global, hw, hw, 3),
                               jax.random.PRNGKey(0))

    rng = np.random.RandomState(1)
    data = {"images": jnp.asarray((rng.rand(domain_num, 4, hw, hw, 3) * 255)
                                  .astype(np.uint8)),
            "labels": jnp.asarray(rng.choice([0, 128, 255],
                                             size=(domain_num, 4, hw, hw))
                                  .astype(np.uint8)),
            "sizes": jnp.asarray([4, 4, 4], jnp.int32)}

    before = np.asarray(jax.tree.leaves(state.od.params)[0]).copy()
    mesh = data_mesh(n_dev)
    with mesh:
        dp_step = make_dp_train_step(*nets, txs, hp, mesh, domain_num,
                                     pdb_global)
        new_state, m = dp_step(state, data, jax.random.PRNGKey(5))  # donates state

    for k, v in m.items():
        assert np.isfinite(float(v)), k
    after = np.asarray(jax.tree.leaves(new_state.od.params)[0])
    assert not np.allclose(before, after)


def test_dp_step_rejects_unsynced_batchnorm():
    """make_dp_train_step must refuse nets built without sync-BN: per-device
    batch_stats would diverge while the replicated out-spec (check_vma=False)
    silently ships an arbitrary device's stats."""
    import pytest

    from wt_pse_tpu.config import default_hparams
    from wt_pse_tpu.models.common import ModelConfig
    from wt_pse_tpu.models.shape_prior import ShapeStudent
    from wt_pse_tpu.models.wt_pse import WTPSE
    from wt_pse_tpu.parallel.dp import make_dp_train_step
    from wt_pse_tpu.parallel.mesh import data_mesh

    hp = default_hparams("WT_PSE")
    cfg = ModelConfig.from_hparams(hp)  # bn_axis_name=None: NOT sync-BN
    nets = (WTPSE(cfg), ShapeStudent(cfg), WTPSE(cfg, two_step=True),
            ShapeStudent(cfg))
    with pytest.raises(ValueError, match="bn_axis_name"):
        make_dp_train_step(*nets, txs=None, hparams=hp, mesh=data_mesh(4),
                           domain_num=3, per_domain_batch_global=8)
