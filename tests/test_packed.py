"""Exactness tests for space-to-depth ("packed") execution (ops/packed.py).

Every packed op must compute the *same math* as its unpacked counterpart —
the repack is a pure layout change (channel-major 2x2 phases) plus apply-time
kernel folding. These tests compare each op, the full model forward (with
injected eps), its gradients, and a whole 4-phase train step against the
unpacked path on identical parameters and data.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wt_pse_tpu.config import default_hparams
from wt_pse_tpu.models.common import ModelConfig
from wt_pse_tpu.models.layers import BatchNorm, max_pool_2x2, upsample2x_bilinear
from wt_pse_tpu.models.shape_prior import ShapeStudent
from wt_pse_tpu.models.wt_pse import WTPSE
from wt_pse_tpu.ops.packed import (
    fold1x1,
    fold3x3,
    pack,
    pbroadcast_mul,
    phase_max_unpool,
    unpack,
    upsample2x_packed,
)
from wt_pse_tpu.ops.whitening import feature_covariance


def _conv(x, kernel, bias):
    pad = kernel.shape[0] // 2
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    return y if bias is None else y + bias


def test_pack_unpack_roundtrip(rng):
    x = jnp.asarray(rng.rand(2, 8, 12, 5).astype(np.float32))
    assert np.array_equal(unpack(pack(x)), x)
    # channel-major: concatenating packed tensors along C == packing the concat
    y = jnp.asarray(rng.rand(2, 8, 12, 3).astype(np.float32))
    cat = jnp.concatenate([pack(x), pack(y)], axis=-1)
    assert np.array_equal(cat, pack(jnp.concatenate([x, y], axis=-1)))


def test_fold3x3_exact(rng):
    x = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 7).astype(np.float32))
    b = jnp.asarray(rng.randn(7).astype(np.float32))
    ref = _conv(x, k, b)
    kp, bp = fold3x3(k, b)
    got = unpack(_conv(pack(x), kp, bp))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_fold1x1_exact(rng):
    x = jnp.asarray(rng.rand(2, 16, 16, 6).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 1, 6, 4).astype(np.float32))
    b = jnp.asarray(rng.randn(4).astype(np.float32))
    ref = _conv(x, k, b)
    kp, bp = fold1x1(k, b)
    got = unpack(_conv(pack(x), kp, bp))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_phase_max_unpool_is_maxpool(rng):
    x = jnp.asarray(rng.randn(2, 16, 16, 5).astype(np.float32))
    np.testing.assert_array_equal(phase_max_unpool(pack(x)), max_pool_2x2(x))


def test_upsample2x_packed_matches_bilinear(rng):
    x = jnp.asarray(rng.randn(2, 8, 12, 5).astype(np.float32))
    ref = upsample2x_bilinear(x)
    got = unpack(upsample2x_packed(x))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_pbroadcast_mul(rng):
    a = jnp.asarray(rng.randn(2, 8, 8, 6).astype(np.float32))  # 6 channels
    g = jnp.asarray(rng.randn(2, 8, 8, 1).astype(np.float32))  # 1-channel gate
    ref = a * g
    got = unpack(pbroadcast_mul(pack(a), pack(g)))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
    # same-width case degenerates to elementwise
    np.testing.assert_allclose(
        unpack(pbroadcast_mul(pack(a), pack(a))), a * a, rtol=1e-6, atol=1e-6)


def test_batchnorm_packed_parity(rng):
    x = jnp.asarray(rng.randn(4, 16, 16, 5).astype(np.float32))
    bn = BatchNorm(5)
    vs = bn.init(jax.random.PRNGKey(0), x, True)
    # give scale/bias/stats non-trivial values
    vs = jax.tree.map(lambda a: a + 0.3, vs)
    ref, mut = bn.apply(vs, x, True, mutable=["batch_stats"])
    got, mutp = bn.apply(vs, pack(x), True, True, mutable=["batch_stats"])
    np.testing.assert_allclose(unpack(got), ref, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(mut), jax.tree.leaves(mutp)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
    # eval mode (running stats) too
    ref_e = bn.apply(vs, x, False)
    got_e = bn.apply(vs, pack(x), False, True)
    np.testing.assert_allclose(unpack(got_e), ref_e, rtol=1e-6, atol=1e-6)


def test_feature_covariance_packed(rng):
    z = jnp.asarray(rng.randn(3, 16, 16, 8).astype(np.float32))
    ref = feature_covariance(z)
    got = feature_covariance(pack(z), packed=True)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# whole-model / whole-step parity
# ---------------------------------------------------------------------------


def _mk_inputs(rng, b=2, hw=32):
    img = rng.rand(b, hw, hw, 3).astype(np.float32) * 2 - 1
    yy, xx = np.mgrid[0:hw, 0:hw]
    od = ((yy - hw / 2) ** 2 + (xx - hw / 2) ** 2 < (hw / 3) ** 2).astype(np.float32)
    mask = np.tile(od[None, :, :, None], (b, 1, 1, 1))
    eps = rng.randn(b, hw, hw, 1).astype(np.float32)
    return jnp.asarray(img), jnp.asarray(mask), jnp.asarray(eps)


@pytest.mark.slow  # whole-net fwd+grad compile x2 (~1 min); scripts/test.sh --slow
@pytest.mark.parametrize("levels", [1, 2, 3])
def test_wtpse_forward_and_grad_parity(rng, levels):
    """Full WTPSE train forward (prior sampling + attention fusion + whitening
    features) and its parameter gradients: packed == unpacked on the same
    params. eps is injected as pack(eps) so the per-pixel draw corresponds.
    ``levels=2`` also folds the second U-Net level (s2d_levels)."""
    hp = default_hparams("WT_PSE")
    cfg_u = ModelConfig.from_hparams(hp)
    cfg_p = ModelConfig.from_hparams(
        dict(hp, space_to_depth=True, space_to_depth_levels=levels))
    assert cfg_p.s2d and cfg_p.s2d_levels == levels and not cfg_u.s2d
    img, mask, eps = _mk_inputs(rng)

    m_u, m_p = WTPSE(cfg_u), WTPSE(cfg_p)
    vs = m_u.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
                  img, mask, method=WTPSE.initialize)
    # identical param trees regardless of layout
    vs_p = m_p.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
                    img, mask, method=WTPSE.initialize)
    assert jax.tree.structure(vs) == jax.tree.structure(vs_p)
    for a, b in zip(jax.tree.leaves(vs), jax.tree.leaves(vs_p)):
        assert a.shape == b.shape

    def fwd(model, variables, x, m, e, train=True):
        return model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            x, m, x, train, eps=e, mutable=["batch_stats"])

    (out_u, att_u, wt_u), mut_u = fwd(m_u, vs, img, mask, eps)
    (out_p, att_p, wt_p), mut_p = fwd(m_p, vs, pack(img), pack(mask), pack(eps))

    np.testing.assert_allclose(unpack(out_p), out_u, rtol=1e-4, atol=5e-5)
    np.testing.assert_allclose(unpack(att_p), att_u, rtol=1e-4, atol=5e-5)
    for zu, zp in zip(wt_u, wt_p):
        np.testing.assert_allclose(unpack(zp), zu, rtol=1e-4, atol=5e-5)
    for a, b in zip(jax.tree.leaves(mut_u), jax.tree.leaves(mut_p)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)

    # gradient parity through a seg-style loss + whitening covariance
    def loss(model, variables, x, m, e, packed):
        (out, _att, wt), _ = fwd(model, variables, x, m, e)
        cov = feature_covariance(wt[0], packed=packed)
        return jnp.mean(jax.nn.sigmoid(out)) + 1e-3 * jnp.sum(jnp.square(cov))

    g_u = jax.grad(lambda p: loss(m_u, {**vs, "params": p}, img, mask, eps, False))(
        vs["params"])
    g_p = jax.grad(lambda p: loss(m_p, {**vs, "params": p}, pack(img), pack(mask),
                                  pack(eps), True))(vs["params"])
    # Tolerance note: the forwards agree to ~2e-5 at BOTH levels (equal math,
    # different f32 reassociation), so gradient deltas are roundoff amplified
    # through the BN/attention chains — measured max ~1.8e-4 abs / ~0.6% rel at
    # levels=2 (one more folded level ≈ 2-3x the levels=1 noise). A layout
    # wiring bug would be O(1). The sharp functional gate is the whole-step
    # metrics parity below (rtol 2e-4, test_train_step_parity_no_sampling).
    rtol, atol = (2e-3, 1e-5) if levels == 1 else (1e-2, 3e-4)
    for a, b in zip(jax.tree.leaves(g_u), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(a, b, rtol=rtol, atol=atol)


@pytest.mark.parametrize("levels", [1, 2, 3])
def test_student_update_forward_parity(rng, levels):
    hp = default_hparams("WT_PSE")
    cfg_u = ModelConfig.from_hparams(hp)
    cfg_p = ModelConfig.from_hparams(
        dict(hp, space_to_depth=True, space_to_depth_levels=levels))
    img, _mask, eps = _mk_inputs(rng)

    s_u, s_p = ShapeStudent(cfg_u), ShapeStudent(cfg_p)
    vs = s_u.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
                  img, method=ShapeStudent.initialize)

    (z_u, mu_u, wt_u), mut_u = s_u.apply(
        vs, img, True, eps, mutable=["batch_stats"],
        method=ShapeStudent.update_forward)
    (z_p, mu_p, wt_p), mut_p = s_p.apply(
        vs, pack(img), True, pack(eps), mutable=["batch_stats"],
        method=ShapeStudent.update_forward)
    np.testing.assert_allclose(unpack(z_p), z_u, rtol=1e-4, atol=5e-5)
    np.testing.assert_allclose(unpack(mu_p), mu_u, rtol=1e-4, atol=5e-5)
    for zu, zp in zip(wt_u, wt_p):
        np.testing.assert_allclose(unpack(zp), zu, rtol=1e-4, atol=5e-5)
    for a, b in zip(jax.tree.leaves(mut_u), jax.tree.leaves(mut_p)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


@pytest.mark.slow  # ~80s: compiles the whole step twice (both layouts)
def test_train_step_parity_no_sampling(rng):
    """Whole 4-phase step, s2d vs unpacked, exact-identical params/batch/rng.

    shape_prior=False removes the only stochastic draw (the reparam eps), so
    the two layouts must produce near-identical metrics and updated params —
    this covers the step-level wiring: pack-once, packed ROI broadcast-mul,
    pos-weight sums, dice metrics, Adam updates."""
    from wt_pse_tpu.train.state import init_ensemble
    from wt_pse_tpu.train.step import StepConfig, jit_train_step

    base = dict(default_hparams("WT_PSE"), shape_prior=False, whitening=False,
                shape_attention=False)
    img, mask, _ = _mk_inputs(rng, b=4)
    batch = {"image": img, "target_od": mask,
             "target_oc": jnp.asarray(np.roll(np.array(mask), 2, axis=1))}
    key = jax.random.PRNGKey(7)

    results = []
    for s2d, levels in ((False, 1), (True, 1), (True, 2), (True, 3)):
        hp = dict(base, space_to_depth=s2d, space_to_depth_levels=levels)
        cfg = ModelConfig.from_hparams(hp)
        main_od, stud_od = WTPSE(cfg), ShapeStudent(cfg)
        main_oc, stud_oc = WTPSE(cfg, two_step=True), ShapeStudent(cfg)
        state, txs = init_ensemble(main_od, stud_od, main_oc, stud_oc,
                                   (4, 32, 32, 3), jax.random.PRNGKey(0))
        step = jit_train_step(main_od, stud_od, main_oc, stud_oc, txs,
                              StepConfig(hp, domain_num=2, per_domain_batch=2),
                              donate=False)
        results.append(step(state, batch, key))

    (st_u, m_u), *packed_results = results
    for stp, mp in packed_results:
        assert set(m_u) == set(mp)
        for k in m_u:
            np.testing.assert_allclose(m_u[k], mp[k], rtol=2e-4, atol=1e-6, err_msg=k)
        # params after ONE Adam step: update = lr*m/(sqrt(v)+eps) ~= lr*sign(g)
        # for roundoff-scale grads, so layout-induced reassociation noise flips
        # whole tiny-grad params by +-lr (5e-4). Bound by a couple of lr quanta;
        # the metrics check above (rtol 2e-4) is the sharp layout-correctness
        # assertion.
        for name in ["od", "oc"]:
            for a, b in zip(jax.tree.leaves(getattr(st_u, name).params),
                            jax.tree.leaves(getattr(stp, name).params)):
                np.testing.assert_allclose(a, b, rtol=2e-3, atol=1.5e-3)


@pytest.mark.slow  # two jitted two-stage predicts per level (~2 min)
@pytest.mark.parametrize("levels", [1, 2])
def test_packed_two_stage_predict_parity(rng, levels):
    """The packed eval path (make_predict_fn(packed=True) — fast-validation
    under s2d) must match the unpacked checkpoint-parity path: logits to
    reassociation level, thresholded masks at margin."""
    from wt_pse_tpu.train.eval import make_predict_fn

    hp = dict(default_hparams("WT_PSE"), space_to_depth=True,
              space_to_depth_levels=levels)
    cfg = ModelConfig.from_hparams(hp)
    main_od, stud_od = WTPSE(cfg), ShapeStudent(cfg)
    main_oc, stud_oc = WTPSE(cfg, two_step=True), ShapeStudent(cfg)
    img, mask, _ = _mk_inputs(rng)
    k = jax.random.PRNGKey(0)
    v_od = main_od.init({"params": k}, img, mask, method=WTPSE.initialize)
    v_od_shape = stud_od.init({"params": k}, img, method=ShapeStudent.initialize)
    v_oc = main_oc.init({"params": jax.random.PRNGKey(1)}, img, mask,
                        method=WTPSE.initialize)
    v_oc_shape = stud_oc.init({"params": jax.random.PRNGKey(1)}, img,
                              method=ShapeStudent.initialize)
    args = (v_od, v_od_shape, v_oc, v_oc_shape, img)

    p_u = make_predict_fn(main_od, stud_od, main_oc, stud_oc, packed=False)
    p_p = make_predict_fn(main_od, stud_od, main_oc, stud_oc, packed=True)
    od_u, oc_u = p_u(*args)
    od_p, oc_p = p_p(*args)
    np.testing.assert_allclose(od_p, od_u, rtol=1e-4, atol=5e-5)
    # stage 2 sees a thresholded stage-1 mask: a reassociation flip of one
    # borderline pixel changes the ROI, so compare where the mask agrees
    agree = np.asarray(jax.nn.sigmoid(od_u) > 0.75) == np.asarray(
        jax.nn.sigmoid(od_p) > 0.75)
    assert agree.mean() > 0.999
    np.testing.assert_allclose(np.where(agree, np.asarray(oc_p), 0.0),
                               np.where(agree, np.asarray(oc_u), 0.0),
                               rtol=1e-4, atol=5e-5)


@pytest.mark.slow  # two jitted two-stage predicts (~1 min)
def test_packed_joint_predict_parity(rng):
    """Joint-variant packed predict matches the unpacked parity path."""
    from wt_pse_tpu.models.joint import JointShapeReg
    from wt_pse_tpu.train.eval import make_predict_fn_joint

    hp = dict(default_hparams("Unet_nips2023_joint_shape_regularization"),
              space_to_depth=True, space_to_depth_levels=2)
    cfg = ModelConfig.from_hparams(hp)
    m_od, m_oc = JointShapeReg(cfg), JointShapeReg(cfg)
    img, mask, _ = _mk_inputs(rng)
    v_od = m_od.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(9)},
                     img, mask, method=JointShapeReg.initialize)
    v_oc = m_oc.init({"params": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(9)},
                     img, mask, method=JointShapeReg.initialize)
    args = (v_od, None, v_oc, None, img)
    od_u, oc_u = make_predict_fn_joint(m_od, m_oc, packed=False)(*args)
    od_p, oc_p = make_predict_fn_joint(m_od, m_oc, packed=True)(*args)
    np.testing.assert_allclose(od_p, od_u, rtol=1e-4, atol=5e-5)
    agree = np.asarray(jax.nn.sigmoid(od_u) > 0.75) == np.asarray(
        jax.nn.sigmoid(od_p) > 0.75)
    assert agree.mean() > 0.999
    np.testing.assert_allclose(np.where(agree, np.asarray(oc_p), 0.0),
                               np.where(agree, np.asarray(oc_u), 0.0),
                               rtol=1e-4, atol=5e-5)
