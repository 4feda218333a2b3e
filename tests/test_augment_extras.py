"""Extended augmentation ops: behavioral invariants + oracle cross-checks."""

import numpy as np
import scipy.ndimage as ndi

import jax
import jax.numpy as jnp

from wt_pse_tpu.data import augment_extras as X


def test_salt_pepper_modes(rng):
    img = jnp.full((32, 32, 3), 0.5)
    # scan keys until we observe each mode
    saw = set()
    for s in range(40):
        out = np.asarray(X.salt_pepper_noise(jax.random.PRNGKey(s), img))
        if (out == 1.0).any():
            saw.add("salt")
        elif (out == 0.0).any():
            saw.add("pepper")
        elif (out == 0.5).all():
            saw.add("none")
    assert saw == {"salt", "pepper", "none"}


def test_adjust_light_gamma_range(rng):
    img = jnp.asarray(rng.rand(16, 16, 3).astype(np.float32) * 255)
    changed = 0
    for s in range(20):
        out = np.asarray(X.adjust_light(jax.random.PRNGKey(s), img))
        assert out.min() >= 0 and out.max() <= 255
        if not np.allclose(out, np.asarray(img)):
            changed += 1
    assert 0 < changed < 20  # p=0.5 gate


def test_eraser_rectangle(rng):
    img = jnp.asarray(rng.rand(64, 64, 3).astype(np.float32) * 255)
    for s in range(20):
        out = np.asarray(X.random_eraser(jax.random.PRNGKey(s), img))
        diff = (out != np.asarray(img)).any(-1)
        if diff.any():
            ys, xs = np.where(diff)
            # erased area is one filled rectangle with a constant value
            assert diff[ys.min():ys.max()+1, xs.min():xs.max()+1].all()
            assert np.unique(out[diff]).size == 1
            return
    raise AssertionError("eraser never applied in 20 draws")


def test_gaussian_blur_matches_scipy(rng):
    x = rng.rand(24, 24).astype(np.float32)
    got = np.asarray(X._gaussian_blur_2d(jnp.asarray(x), sigma=2.0))
    want = ndi.gaussian_filter(x, 2.0, mode="constant")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_elastic_transform_identity_and_warp(rng):
    img = jnp.asarray(rng.rand(32, 32, 3).astype(np.float32))
    mask = jnp.asarray((rng.rand(32, 32) > 0.5).astype(np.float32))
    applied = unchanged = 0
    for s in range(10):
        out, om = X.elastic_transform(jax.random.PRNGKey(s), img, mask)
        if np.allclose(np.asarray(out), np.asarray(img)):
            unchanged += 1
        else:
            applied += 1
            assert om.shape == mask.shape
    assert applied and unchanged


def test_random_flip_and_rotate(rng):
    img = jnp.asarray(np.arange(16 * 16 * 3, dtype=np.float32).reshape(16, 16, 3))
    out, _ = X.random_flip(jax.random.PRNGKey(0), img, None)
    assert np.allclose(np.asarray(out), np.asarray(img)) or np.allclose(
        np.asarray(out), np.asarray(img)[:, ::-1])
    mask = jnp.asarray((np.arange(256).reshape(16, 16) % 2).astype(np.float32))
    rot, rm = X.random_rotate(jax.random.PRNGKey(3), img, mask, degree=15)
    assert rot.shape == img.shape and rm.shape == mask.shape
    assert set(np.unique(np.asarray(rm))).issubset({0.0, 1.0})  # nearest for mask


def test_center_crop():
    img = jnp.asarray(np.arange(100, dtype=np.float32).reshape(10, 10, 1))
    out = X.center_crop(img, 4)
    assert out.shape == (4, 4, 1)
    assert float(out[0, 0, 0]) == 33.0


def test_random_sized_crop(rng):
    img = jnp.asarray(rng.rand(64, 64, 3).astype(np.float32))
    mask = jnp.asarray((rng.rand(64, 64) > 0.5).astype(np.float32))
    shapes_differ = 0
    for s in range(8):
        out, om = X.random_sized_crop(jax.random.PRNGKey(s), img, mask, 32)
        assert out.shape == (32, 32, 3) and om.shape == (32, 32)
        assert set(np.unique(np.asarray(om))).issubset({0.0, 1.0})  # nearest
        assert float(out.min()) >= float(img.min()) - 1e-6
        assert float(out.max()) <= float(img.max()) + 1e-6
        if not np.allclose(np.asarray(out), np.asarray(img)[::2, ::2]):
            shapes_differ += 1
    assert shapes_differ  # crops actually vary


def test_get_boundary_matches_scipy(rng):
    m = np.zeros((40, 40, 2), np.float32)
    m[10:30, 10:30, 1] = 1  # disc
    m[15:25, 15:25, 0] = 1  # cup
    got = np.asarray(X.get_boundary(jnp.asarray(m), width=5))
    bands = []
    for c in range(2):
        d = ndi.binary_dilation(m[..., c], iterations=5)
        e = ndi.binary_erosion(m[..., c], iterations=5)
        s = d.astype(np.uint8) + e.astype(np.uint8)
        s[s == 2] = 0
        bands.append(s)
    want = ((bands[0] + bands[1]) > 0).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_normalize_single_label_encoding():
    # raw grays: 250 bg-ish, 100 disc-ish, 10 cup-ish (re-thresholded inside)
    m = np.array([[250, 100], [10, 255]], np.uint8)
    img = np.full((2, 2, 3), 127.5, np.float32)
    im_od, od = X.normalize_single_label(jnp.asarray(img), jnp.asarray(m), "OD")
    _, oc = X.normalize_single_label(jnp.asarray(img), jnp.asarray(m), "OC")
    # 1-ulp tolerance: XLA may canonicalize x/127.5 - 1 into fma(x, 1/127.5, -1),
    # whose rounding differs from true division by 2^-24 at x=127.5.
    np.testing.assert_allclose(np.asarray(im_od), 0.0, atol=1.3e-7)
    # OD = disc ∪ cup (everything below 255 after re-threshold)
    np.testing.assert_array_equal(np.asarray(od)[..., 0], [[0, 1], [1, 0]])
    # OC = cup only
    np.testing.assert_array_equal(np.asarray(oc)[..., 0], [[0, 0], [1, 0]])
