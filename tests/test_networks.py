"""Whole-network torch parity through the checkpoint importer — the exact path the
released ``.pth.tar`` takes. Eval-mode forwards must match torch to f32 tolerance."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from wt_pse_tpu.io.torch_import import convert_state_dict, load_into_variables
from wt_pse_tpu.models.common import ModelConfig
from wt_pse_tpu.models.shape_prior import ShapeStudent, TeacherShapePrior
from wt_pse_tpu.models.wt_pse import WTPSE

import torch_ref

CFG = ModelConfig()


def nchw(x):
    return np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2)))


def nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def _load(jmod, tmod, init_fn):
    variables = init_fn(jmod)
    variables, matched = load_into_variables(variables, convert_state_dict(tmod.state_dict()))
    assert len(matched) > 50
    return variables


def test_teacher_parity(rng):
    feats = rng.randn(2, 32, 32, 16).astype(np.float32)
    mask = (rng.rand(2, 32, 32, 1) > 0.5).astype(np.float32)
    eps = rng.randn(2, 32, 32, 1).astype(np.float32)

    tmod = torch_ref.Teacher(16).eval()
    jmod = TeacherShapePrior(CFG)
    variables = _load(
        jmod, tmod,
        lambda m: m.init({"params": jax.random.PRNGKey(0)},
                         jnp.asarray(feats), jnp.asarray(mask),
                         method=TeacherShapePrior.initialize),
    )
    with torch.no_grad():
        tz, tmu = tmod(torch.from_numpy(nchw(feats)), torch.from_numpy(nchw(mask)),
                       torch.from_numpy(nchw(eps)))
    jz, jmu = jmod.apply(variables, jnp.asarray(feats), jnp.asarray(mask),
                         False, True, jnp.asarray(eps))
    np.testing.assert_allclose(np.asarray(jmu), nhwc(tmu.numpy()), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jz), nhwc(tz.numpy()), rtol=1e-4, atol=1e-4)


def test_student_parity(rng):
    img = rng.randn(2, 32, 32, 3).astype(np.float32)
    eps = rng.randn(2, 32, 32, 1).astype(np.float32)

    tmod = torch_ref.Student(16).eval()
    jmod = ShapeStudent(CFG)
    variables = _load(
        jmod, tmod,
        lambda m: m.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(img),
                         method=ShapeStudent.initialize),
    )
    with torch.no_grad():
        tfeats = tmod.wt_model(torch.from_numpy(nchw(img)))
        tz, tmu = tmod(tfeats[-1], torch.from_numpy(nchw(eps)))
        tmu_only = tmod(tfeats[-1])
    jfeats = jmod.apply(variables, jnp.asarray(img), method=ShapeStudent.wt_forward)
    np.testing.assert_allclose(np.asarray(jfeats[-1]), nhwc(tfeats[-1].numpy()),
                               rtol=1e-4, atol=1e-4)
    jz, jmu = jmod.apply(variables, jfeats[-1], False, True, jnp.asarray(eps))
    np.testing.assert_allclose(np.asarray(jmu), nhwc(tmu.numpy()), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jz), nhwc(tz.numpy()), rtol=1e-4, atol=1e-4)
    jmu2 = jmod.apply(variables, jfeats[-1], False, False)
    np.testing.assert_allclose(np.asarray(jmu2), nhwc(tmu_only.numpy()), rtol=1e-4, atol=1e-4)


def test_wtpse_full_forward_parity(rng):
    img = rng.randn(2, 32, 32, 3).astype(np.float32)
    mask = (rng.rand(2, 32, 32, 1) > 0.5).astype(np.float32)
    eps = rng.randn(2, 32, 32, 1).astype(np.float32)

    tmod = torch_ref.WTPSE(16).eval()
    jmod = WTPSE(CFG)
    variables = _load(
        jmod, tmod,
        lambda m: m.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(img),
                         jnp.asarray(mask), method=WTPSE.initialize),
    )
    with torch.no_grad():
        tout, tatt_mask, tfeats = tmod(torch.from_numpy(nchw(img)),
                                       torch.from_numpy(nchw(mask)),
                                       torch.from_numpy(nchw(img)),
                                       torch.from_numpy(nchw(eps)))
    jout, jatt_mask, jfeats = jmod.apply(
        variables, jnp.asarray(img), jnp.asarray(mask), jnp.asarray(img), False,
        jnp.asarray(eps))
    for jf, tf in zip(jfeats, tfeats):
        np.testing.assert_allclose(np.asarray(jf), nhwc(tf.numpy()), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jout), nhwc(tout.numpy()), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jatt_mask), nhwc(tatt_mask.numpy()),
                               rtol=0, atol=0)


def test_wtpse_predict_with_student_shape_parity(rng):
    """The two-network eval path: student supplies z, main net fuses (predict())."""
    img = rng.randn(2, 32, 32, 3).astype(np.float32)

    tmain = torch_ref.WTPSE(16).eval()
    tstud = torch_ref.Student(16).eval()
    jmain = WTPSE(CFG)
    jstud = ShapeStudent(CFG)
    vmain = _load(
        jmain, tmain,
        lambda m: m.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(img),
                         jnp.zeros((2, 32, 32, 1)), method=WTPSE.initialize),
    )
    vstud = _load(
        jstud, tstud,
        lambda m: m.init({"params": jax.random.PRNGKey(1)}, jnp.asarray(img),
                         method=ShapeStudent.initialize),
    )
    with torch.no_grad():
        tfeats = tstud.wt_model(torch.from_numpy(nchw(img)))
        tz = tstud(tfeats[-1])  # mu, eval path
        tout, _ = tmain.fuse_out(tmain.embed(torch.from_numpy(nchw(img))), tz)
    jz = jstud.apply(vstud, jnp.asarray(img), False,
                     method=ShapeStudent.sample_from_image)
    jout = jmain.apply(vmain, jnp.asarray(img), jz, method=WTPSE.predict_with_shape)
    np.testing.assert_allclose(np.asarray(jout), nhwc(tout.numpy()), rtol=1e-3, atol=1e-4)
