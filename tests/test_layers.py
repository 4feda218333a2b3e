"""Layer-level torch parity: BatchNorm semantics, bilinear resize, ConvD/ConvU blocks
(via the state_dict importer, i.e. the released-checkpoint path)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from wt_pse_tpu.io.torch_import import convert_state_dict, load_into_variables
from wt_pse_tpu.models import layers as L

import torch_ref


def nchw(x_nhwc):
    return np.ascontiguousarray(np.transpose(x_nhwc, (0, 3, 1, 2)))


def nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def test_batchnorm_matches_torch_train_and_eval(rng):
    c = 6
    tbn = torch.nn.BatchNorm2d(c)
    jbn = L.BatchNorm(c)
    variables = jbn.init(jax.random.PRNGKey(0), jnp.zeros((2, 4, 4, c)), True)
    # two train steps with different batches, then an eval step
    for i in range(2):
        x = rng.randn(3, 5, 5, c).astype(np.float32) * (i + 1) + i
        with torch.no_grad():
            ty = tbn(torch.from_numpy(nchw(x)))
        jy, mut = jbn.apply(variables, jnp.asarray(x), True, mutable=["batch_stats"])
        variables = {"params": variables["params"], **mut}
        np.testing.assert_allclose(np.asarray(jy), nhwc(ty.numpy()), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["mean"]),
        tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["var"]),
        tbn.running_var.numpy(), rtol=1e-5, atol=1e-6)
    tbn.eval()
    x = rng.randn(2, 4, 4, c).astype(np.float32)
    with torch.no_grad():
        ty = tbn(torch.from_numpy(nchw(x)))
    jy = jbn.apply(variables, jnp.asarray(x), False)
    np.testing.assert_allclose(np.asarray(jy), nhwc(ty.numpy()), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((8, 8), (16, 16)), ((7, 5), (256, 199)),
                                          ((16, 16), (8, 8)), ((10, 10), (10, 10))])
def test_resize_bilinear_matches_torch(rng, in_hw, out_hw):
    x = rng.randn(2, *in_hw, 3).astype(np.float32)
    ty = torch.nn.functional.interpolate(
        torch.from_numpy(nchw(x)), size=out_hw, mode="bilinear", align_corners=False)
    jy = L.resize_bilinear(jnp.asarray(x), out_hw)
    np.testing.assert_allclose(np.asarray(jy), nhwc(ty.numpy()), rtol=1e-4, atol=1e-5)


def test_upsample2x_matches_torch(rng):
    x = rng.randn(1, 9, 9, 4).astype(np.float32)
    ty = torch.nn.functional.interpolate(
        torch.from_numpy(nchw(x)), scale_factor=2, mode="bilinear", align_corners=False)
    jy = L.upsample2x_bilinear(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jy), nhwc(ty.numpy()), rtol=1e-4, atol=1e-5)


def _import_and_compare(tmod, jmod, xs_nhwc, apply_args=()):
    """Export torch weights -> import into flax -> compare eval-mode forwards."""
    converted = convert_state_dict(tmod.state_dict())
    init_args = [jnp.asarray(x) for x in xs_nhwc]
    variables = jmod.init(jax.random.PRNGKey(0), *init_args, *apply_args)
    variables, matched = load_into_variables(variables, converted)
    assert matched, "importer matched no parameters"
    tmod.eval()
    with torch.no_grad():
        ty = tmod(*[torch.from_numpy(nchw(x)) for x in xs_nhwc])
    jy = jmod.apply(variables, *init_args, *apply_args)
    np.testing.assert_allclose(np.asarray(jy), nhwc(ty.numpy()), rtol=1e-4, atol=1e-4)
    return len(matched)


def test_convd_block_parity(rng):
    x = rng.randn(2, 16, 16, 3).astype(np.float32)
    n = _import_and_compare(torch_ref.ConvD(3, 8, first=True), L.ConvD(8, first=True),
                            [x], apply_args=(False,))
    assert n == 6 + 12  # 3 convs (k+b) + 3 BNs (scale,bias,mean,var)


def test_convd_nonfirst_pools(rng):
    x = rng.randn(2, 16, 16, 4).astype(np.float32)
    _import_and_compare(torch_ref.ConvD(4, 8), L.ConvD(8), [x], apply_args=(False,))


def test_convu_block_parity(rng):
    # up2-style block (not first): input 2*planes, conv1 reduces, then upsample+concat
    x = rng.randn(2, 8, 8, 16).astype(np.float32)
    prev = rng.randn(2, 16, 16, 4).astype(np.float32)
    _import_and_compare(torch_ref.ConvU(8), L.ConvU(8), [x, prev], apply_args=(False,))


def test_doubleconv_and_wt_parity(rng):
    x = rng.randn(2, 12, 12, 3).astype(np.float32)
    _import_and_compare(torch_ref.DoubleConv(3, 8), L.DoubleConv(8), [x],
                        apply_args=(False,))
    _import_and_compare(torch_ref.DoubleConvWT(3, 8), L.DoubleConvWT(8), [x])
