"""On-device augmentation front-end: PIL-equivalence of the crop-resize math,
threshold encoding, and per-domain sampling layout."""

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from wt_pse_tpu.data import augment as A
from wt_pse_tpu.data.fundus import encode_masks


def test_axis_matrices_identity_when_unscaled():
    mb, mn = A._axis_matrices(jnp.asarray(256.0), jnp.asarray(0.0), 256)
    np.testing.assert_allclose(np.asarray(mb), np.eye(256), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mn), np.eye(256), atol=1e-6)


def test_bilinear_crop_matches_pil_resize_then_crop(rng):
    """Fixed draw: scale 256->320 (PIL BILINEAR), crop 256 at (x1,y1)=(37,12).
    Our per-axis matrices must reproduce PIL's upscale-then-crop values."""
    size, w, h, x1, y1 = 256, 320, 300, 37, 12
    img = (rng.rand(size, size) * 255).astype(np.uint8)
    pil = Image.fromarray(img).resize((w, h), Image.BILINEAR).crop(
        (x1, y1, x1 + size, y1 + size))
    want = np.asarray(pil, np.float32)

    mh, _ = A._axis_matrices(jnp.asarray(float(h)), jnp.asarray(float(y1)), size)
    mw, _ = A._axis_matrices(jnp.asarray(float(w)), jnp.asarray(float(x1)), size)
    got = np.asarray(mh) @ img.astype(np.float32) @ np.asarray(mw).T
    # PIL runs H and W passes with a uint8 intermediate (quantization between
    # passes); our single float pipeline is the *more* accurate one. Allow 2 gray
    # levels worst-case, sub-0.5 on average.
    assert np.abs(got - want).max() <= 2.0
    assert np.abs(got - want).mean() < 0.5


def test_nearest_crop_matches_pil(rng):
    # 383 (not 384): at exact rational scale factors like 1.5 the source centers
    # hit integer boundaries where PIL's own double rounding is arbitrary
    size, w, h, x1, y1 = 256, 383, 270, 100, 3
    lab = rng.choice([0, 128, 255], size=(size, size)).astype(np.uint8)
    pil = Image.fromarray(lab).resize((w, h), Image.NEAREST).crop(
        (x1, y1, x1 + size, y1 + size))
    want = np.asarray(pil, np.float32)
    _, mh = A._axis_matrices(jnp.asarray(float(h)), jnp.asarray(float(y1)), size)
    _, mw = A._axis_matrices(jnp.asarray(float(w)), jnp.asarray(float(x1)), size)
    got = np.asarray(mh) @ lab.astype(np.float32) @ np.asarray(mw).T
    # Disagreements can only occur where the source center is an exact integer
    # (PIL double-rounding arbitrariness); for generic scales that's ~no pixels.
    mismatch = (got != want).mean()
    assert mismatch < 0.01, f"nearest mismatch rate {mismatch}"
    assert set(np.unique(got)).issubset({0.0, 128.0, 255.0})


def test_normalize_tf_encoding():
    lab = jnp.asarray([[0.0, 50.0, 51.0, 128.0, 200.0, 201.0, 255.0]])
    img = jnp.zeros((1, 7, 3))
    im, od, oc = A.normalize_tf(img, lab)
    np.testing.assert_allclose(np.asarray(od)[0, :, 0], [1, 1, 1, 1, 1, 0, 0])
    np.testing.assert_allclose(np.asarray(oc)[0, :, 0], [1, 1, 0, 0, 0, 0, 0])
    np.testing.assert_allclose(np.asarray(im), -1.0)
    # cross-check against the host encoder used for eval labels
    od_h, oc_h = encode_masks(np.asarray(lab[0], np.uint8))
    np.testing.assert_allclose(np.asarray(od)[0, :, 0], od_h)
    np.testing.assert_allclose(np.asarray(oc)[0, :, 0], oc_h)


def test_augment_batch_shapes_and_ranges(rng):
    imgs = (rng.rand(4, 256, 256, 3) * 255).astype(np.uint8)
    labs = rng.choice([0, 128, 255], size=(4, 256, 256)).astype(np.uint8)
    out = jax.jit(A.augment_batch)(jax.random.PRNGKey(0), jnp.asarray(imgs),
                                   jnp.asarray(labs))
    assert out["image"].shape == (4, 256, 256, 3)
    assert out["target_od"].shape == (4, 256, 256, 1)
    assert float(out["image"].min()) >= -1.0 and float(out["image"].max()) <= 1.0
    assert set(np.unique(np.asarray(out["target_od"]))).issubset({0.0, 1.0})


def test_sample_domain_batch_layout(rng):
    d, nmax, pdb = 3, 5, 2
    imgs = np.zeros((d, nmax, 8, 8, 3), np.uint8)
    for i in range(d):
        imgs[i] = (i + 1) * 10  # domain fingerprint
    labs = np.zeros((d, nmax, 8, 8), np.uint8)
    sizes = jnp.asarray([5, 2, 3])
    bi, bl = A.sample_domain_batch(jax.random.PRNGKey(0), jnp.asarray(imgs),
                                   jnp.asarray(labs), sizes, pdb)
    assert bi.shape == (6, 8, 8, 3)
    vals = np.asarray(bi)[:, 0, 0, 0]
    np.testing.assert_array_equal(vals, [10, 10, 20, 20, 30, 30])  # domain-contiguous


def test_sampling_respects_pool_sizes(rng):
    d, nmax = 2, 10
    imgs = np.zeros((d, nmax, 4, 4, 3), np.uint8)
    # mark padded (invalid) region with sentinel 99
    imgs[0, 3:] = 99
    imgs[1, 7:] = 99
    labs = np.zeros((d, nmax, 4, 4), np.uint8)
    sizes = jnp.asarray([3, 7])
    for seed in range(5):
        bi, _ = A.sample_domain_batch(jax.random.PRNGKey(seed), jnp.asarray(imgs),
                                      jnp.asarray(labs), sizes, 4)
        assert not (np.asarray(bi) == 99).any()
