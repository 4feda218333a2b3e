"""Golden-tensor tests for the whitening/covariance losses and the cross-domain MMD.

The torch oracle below implements the *formulas* documented in SURVEY.md §2.1 #8
(covariance at ``/root/reference/algorithms.py:1277-1283``, hinge terms at
1289-1301, MMD at 59-121) independently, including the two reference quirks.
"""

import numpy as np
import torch

import jax.numpy as jnp

from wt_pse_tpu.ops import whitening as W


# ----- torch oracle ---------------------------------------------------------


def t_cov(z):  # z: (B, C, H, W)
    b, c, h, w = z.shape
    f = z.reshape(b, c, -1)
    cov = torch.bmm(f, f.transpose(1, 2)) / (h * w - 1)
    return cov + 1e-5 * torch.eye(c)


def t_terms(cov, margin=0.0):
    b, c, _ = cov.shape
    upper = torch.triu(torch.ones(c, c), diagonal=1)
    off = torch.clamp(
        (torch.sum(torch.abs(cov * upper), dim=(1, 2)) - margin) / (c * (c - 1) / 2),
        min=0,
    ).mean()
    eye = torch.eye(c)
    diag = torch.clamp(
        (torch.sum(torch.abs(cov * eye - eye), dim=(1, 2)) - margin) / c, min=0
    ).mean()
    return off, diag


def t_mmd(x, y):
    def k(a, b):
        d = torch.cdist(a, b) ** 2
        return torch.exp(-torch.clamp(d, min=1e-30)).mean()

    return k(x, x) + k(y, y) - 2 * k(x, y)


def t_domain_mmd(vec, nd, bs):
    blocks = [vec[i * bs : (i + 1) * bs] for i in range(nd)]
    pen = sum(t_mmd(blocks[i], blocks[j]) for i in range(nd) for j in range(i + 1, nd))
    return pen / (nd * (nd - 1) / 2)


def t_upper_vec(cov):
    c = cov.shape[1]
    iu = torch.triu_indices(c, c, 1)
    return (cov * torch.triu(torch.ones(c, c), 1))[:, iu[0], iu[1]]


# ----- tests ----------------------------------------------------------------


def _feats(rng, b=9, c=16, h=12, w=12):
    return rng.randn(b, h, w, c).astype(np.float32)


def test_covariance_matches_torch(rng):
    z = _feats(rng)
    jcov = np.asarray(W.feature_covariance(jnp.asarray(z)))
    tcov = t_cov(torch.from_numpy(z.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(jcov, tcov, rtol=1e-5, atol=1e-6)


def test_instance_terms_match_torch(rng):
    z = _feats(rng)
    for margin in (0.0, 0.5):
        off_j, diag_j = W.instance_whitening_terms(
            W.feature_covariance(jnp.asarray(z)), margin)
        off_t, diag_t = t_terms(t_cov(torch.from_numpy(z.transpose(0, 3, 1, 2))), margin)
        np.testing.assert_allclose(float(off_j), float(off_t), rtol=1e-5)
        np.testing.assert_allclose(float(diag_j), float(diag_t), rtol=1e-5)


def test_upper_triangle_order_matches_torch(rng):
    z = _feats(rng, b=4)
    jv = np.asarray(W.upper_triangle_vectors(W.feature_covariance(jnp.asarray(z))))
    tv = t_upper_vec(t_cov(torch.from_numpy(z.transpose(0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(jv, tv, rtol=1e-5, atol=1e-6)


def test_domain_mmd_matches_torch(rng):
    vec = rng.randn(9, 120).astype(np.float32) * 0.3
    jm = float(W.domain_mmd(jnp.asarray(vec), 3, 3))
    tm = float(t_domain_mmd(torch.from_numpy(vec), 3, 3))
    np.testing.assert_allclose(jm, tm, rtol=1e-4)


def test_domain_mmd_single_domain_is_zero(rng):
    vec = rng.randn(3, 120).astype(np.float32)
    assert float(W.domain_mmd(jnp.asarray(vec), 1, 3)) == 0.0


def test_main_whitening_loss_quirk_division(rng):
    """Sums 2 maps, divides by 3 (algorithms.py:1259-1267)."""
    feats = [jnp.asarray(_feats(rng)) for _ in range(2)]
    feats.append(jnp.maximum(feats[-1], 0))  # relu'd third map, not in the loss
    inst, dom = W.main_whitening_loss(feats, 3, 3)
    terms = [W.whitening_loss_single(f, 3, 3) for f in feats[:2]]
    exp_inst = sum(t[0] + t[1] for t in terms) / 3
    exp_dom = sum(t[2] for t in terms) / 3
    np.testing.assert_allclose(float(inst), float(exp_inst), rtol=1e-6)
    np.testing.assert_allclose(float(dom), float(exp_dom), rtol=1e-6)
    # quirk off: divide by number of summed maps
    inst2, dom2 = W.main_whitening_loss(feats, 3, 3, replicate_ref_quirks=False)
    np.testing.assert_allclose(float(inst2), float(exp_inst) * 3 / 2, rtol=1e-6)


def test_student_whitening_quirk(rng):
    """inst_diag = 2 * diag(last map) / 3 under the reference accumulator clobber
    (shape_networks.py:545-552)."""
    feats = [jnp.asarray(_feats(rng)) for _ in range(2)]
    feats.append(jnp.maximum(feats[-1], 0))
    total, off, diag, dom = W.student_whitening_loss(feats, 3, 3)
    t0 = W.whitening_loss_single(feats[0], 3, 3)
    t1 = W.whitening_loss_single(feats[1], 3, 3)
    np.testing.assert_allclose(float(off), float(t0[0] + t1[0]) / 3, rtol=1e-6)
    np.testing.assert_allclose(float(diag), 2 * float(t1[1]) / 3, rtol=1e-6)
    np.testing.assert_allclose(float(total), float(off) + float(diag), rtol=1e-6)
    np.testing.assert_allclose(float(dom), float(t0[2] + t1[2]) / 3, rtol=1e-6)
    # fixed variant sums both diag terms and divides by the number of summed maps
    _, _, diag_fixed, _ = W.student_whitening_loss(feats, 3, 3, replicate_ref_quirks=False)
    np.testing.assert_allclose(float(diag_fixed), float(t0[1] + t1[1]) / 2, rtol=1e-6)
