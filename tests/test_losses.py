"""Auxiliary losses vs torch/scipy oracles."""

import numpy as np
import scipy.ndimage as ndi
import torch

import jax.numpy as jnp

from wt_pse_tpu.ops import losses as L


def test_dice_loss_matches_torch(rng):
    p = rng.rand(2, 8, 8).astype(np.float32)
    t = (rng.rand(2, 8, 8) > 0.5).astype(np.float32)
    got = float(L.dice_loss_flat(jnp.asarray(p), jnp.asarray(t)))
    i, tt = torch.from_numpy(p).reshape(-1), torch.from_numpy(t).reshape(-1)
    want = float(1 - (2 * (i * tt).sum() + 1) / (i.sum() + tt.sum() + 1))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_balanced_dice_loss(rng):
    x = rng.randn(2, 8, 8, 2).astype(np.float32)
    t = (rng.rand(2, 8, 8, 2) > 0.5).astype(np.float32)
    got = float(L.balanced_dice_loss(jnp.asarray(x), jnp.asarray(t)))
    p = torch.sigmoid(torch.from_numpy(x))

    def dl(i, tt):
        i, tt = i.reshape(-1), tt.reshape(-1)
        return 1 - (2 * (i * tt).sum() + 1) / (i.sum() + tt.sum() + 1)

    tt = torch.from_numpy(t)
    want = float(0.5 * (dl(p[..., 0], tt[..., 0]) + dl(p[..., 1], tt[..., 1])))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_distance_transform_matches_scipy(rng):
    mask = np.zeros((2, 24, 24), bool)
    mask[0, 5, 7] = True
    mask[0, 20, 3] = True
    mask[1, 10:14, 10:14] = True
    got = np.asarray(L.distance_transform(jnp.asarray(mask)))
    for b in range(2):
        want = ndi.distance_transform_edt(~mask[b])
        np.testing.assert_allclose(got[b], want, rtol=1e-5, atol=1e-5)


def test_watershed_cross_entropy_matches_torch_formula(rng):
    x = rng.randn(2, 16, 16, 2).astype(np.float32)
    yy, xx = np.mgrid[0:16, 0:16]
    disc = (((yy - 8) ** 2 + (xx - 8) ** 2) < 25).astype(np.float32)
    cup = (((yy - 8) ** 2 + (xx - 8) ** 2) < 9).astype(np.float32)
    t = np.stack([np.stack([disc, cup], -1)] * 2)
    got = float(L.watershed_cross_entropy(jnp.asarray(x), jnp.asarray(t)))

    # independent torch formula with scipy EDT
    bce = torch.nn.BCEWithLogitsLoss(reduction="none")
    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    tt = torch.from_numpy(np.transpose(t, (0, 3, 1, 2)))
    disc_dt = np.stack([ndi.distance_transform_edt(~(disc > 0))] * 2)
    cup_dt = np.stack([ndi.distance_transform_edt(~(cup > 0))] * 2)
    disc_w = torch.from_numpy(disc * (1 - disc_dt / disc_dt.max()) + 1).float()
    cup_w = torch.from_numpy(cup * (1 - cup_dt / cup_dt.max()) + 1).float()
    ce = bce(tx, tt)
    want = float(torch.mean(disc_w * ce[:, 0] + cup_w * ce[:, 1]))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_watershed_cross_entropy_finite_on_degenerate_masks(rng):
    """Empty and all-true mask channels: the reference formula NaNs
    (max(DT)=inf resp. 0/0); the algebraic form stays finite (losses.py)."""
    x = rng.randn(1, 8, 8, 2).astype(np.float32)
    for fill in (0.0, 1.0):
        t = np.full((1, 8, 8, 2), fill, np.float32)
        v = float(L.watershed_cross_entropy(jnp.asarray(x), jnp.asarray(t)))
        assert np.isfinite(v)


def test_cross_entropy2d_matches_torch(rng):
    x = rng.randn(2, 6, 6, 3).astype(np.float32)
    t = rng.randint(0, 3, size=(2, 6, 6))
    t[0, 0, :3] = -1  # ignored pixels
    got = float(L.cross_entropy2d(jnp.asarray(x), jnp.asarray(t)))
    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    tt = torch.from_numpy(t)
    logp = torch.nn.functional.log_softmax(tx, 1).permute(0, 2, 3, 1).reshape(-1, 3)
    valid = tt.reshape(-1) >= 0
    want = float(torch.nn.functional.nll_loss(logp[valid], tt.reshape(-1)[valid]))
    np.testing.assert_allclose(got, want, rtol=1e-5)
