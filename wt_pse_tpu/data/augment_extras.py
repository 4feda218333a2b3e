"""Extended augmentation library (device-side, jit-able).

The reference ships a larger transform library than its active pipeline uses
(SURVEY.md §2.1 #6, ``/root/reference/custom_transforms.py``): salt&pepper noise
(22-43), gamma ``adjust_light`` (45-55), random ``eraser`` (58-85),
``elastic_transform`` [Simard2003] (87-132), flips/rotations/crops/resizes
(179-327, 357-372). They are provided here as batched JAX ops over NHWC float
images (and HW masks where applicable) so pipelines built on the reference's full
surface can be expressed — each op takes an explicit PRNG key instead of mutating
global ``random`` state.

All ops keep the reference's probability gates (e.g. apply-with-p=0.5) inside the
op, so composing them reproduces the reference pipeline's distribution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def salt_pepper_noise(key: jax.Array, img: jax.Array, amount: float = 0.004,
                      salt_vs_pepper: float = 0.2) -> jax.Array:
    """custom_transforms.py:22-43: with p=0.25 salt (set to 1), p=0.25 pepper
    (set to 0), p=0.5 unchanged. ``img`` is (H, W, C) in [0, 255] or [0,1] —
    values written are the reference's literal 1/0."""
    kmode, kcoord = jax.random.split(key)
    seed = jax.random.uniform(kmode)
    h, w, _ = img.shape
    frac_salt = amount * salt_vs_pepper * 3  # .size includes channels in the ref
    frac_pepper = amount * (1 - salt_vs_pepper) * 3
    u = jax.random.uniform(kcoord, (h, w))
    salted = jnp.where((u < frac_salt)[..., None], 1.0, img)
    peppered = jnp.where((u < frac_pepper)[..., None], 0.0, img)
    return jnp.where(seed > 0.75, salted, jnp.where(seed > 0.5, peppered, img))


def adjust_light(key: jax.Array, img_255: jax.Array) -> jax.Array:
    """custom_transforms.py:45-55: with p=0.5 apply gamma in [0.5, 3.5]
    (uint8 LUT in the reference == pointwise power curve here)."""
    kseed, kgamma = jax.random.split(key)
    seed = jax.random.uniform(kseed)
    gamma = jax.random.uniform(kgamma) * 3 + 0.5
    out = ((img_255 / 255.0) ** (1.0 / gamma)) * 255.0
    out = jnp.floor(out)  # uint8 LUT truncation
    return jnp.where(seed > 0.5, out, img_255)


def random_eraser(key: jax.Array, img: jax.Array, s_l=0.02, s_h=0.06,
                  r_1=0.3, r_2=0.6, v_l=0.0, v_h=255.0) -> jax.Array:
    """custom_transforms.py:58-85: with p=0.5 erase one random rectangle with a
    random constant. The reference rejection-samples until the box fits; here the
    box is clamped to fit (same marginal up to boundary effects)."""
    kg, ks, kr, kl, kt, kv = jax.random.split(key, 6)
    h, w, _ = img.shape
    apply = jax.random.uniform(kg) > 0.5
    s = jax.random.uniform(ks, minval=s_l, maxval=s_h) * h * w
    r = jax.random.uniform(kr, minval=r_1, maxval=r_2)
    bw = jnp.sqrt(s / r).astype(jnp.int32)
    bh = jnp.sqrt(s * r).astype(jnp.int32)
    left = jax.random.randint(kl, (), 0, w)
    top = jax.random.randint(kt, (), 0, h)
    left = jnp.minimum(left, w - bw)
    top = jnp.minimum(top, h - bh)
    v = jax.random.uniform(kv, minval=v_l, maxval=v_h)
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    inside = ((yy >= top) & (yy < top + bh) & (xx >= left) & (xx < left + bw))
    out = jnp.where(inside[..., None], v, img)
    return jnp.where(apply, out, img)


def _gaussian_blur_2d(x: jax.Array, sigma: float, truncate: float = 4.0):
    """Separable Gaussian filter, 'constant' boundary (scipy parity)."""
    radius = int(truncate * sigma + 0.5)
    t = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (t / sigma) ** 2)
    k = k / k.sum()

    def conv1d(a, axis):
        a = jnp.moveaxis(a, axis, -1)
        pad = [(0, 0)] * (a.ndim - 1) + [(radius, radius)]
        ap = jnp.pad(a, pad)
        # precision: this backend's default convolution precision is bf16-level;
        # scipy parity needs true f32 accumulation
        out = jax.vmap(lambda row: jnp.convolve(
            row, k, mode="valid", precision=jax.lax.Precision.HIGHEST))(
            ap.reshape(-1, ap.shape[-1]))
        return jnp.moveaxis(out.reshape(a.shape), -1, axis)

    return conv1d(conv1d(x, 0), 1)


def elastic_transform(key: jax.Array, img: jax.Array, mask: jax.Array | None,
                      alpha: float | None = None, sigma: float | None = None):
    """Simard-2003 elastic deformation (custom_transforms.py:87-132): p=0.5;
    displacement = gaussian_filter(U(-1,1)) * alpha with alpha=2*H, sigma=0.08*H;
    bilinear image resampling, nearest-edge mask resampling."""
    h, w = img.shape[:2]
    alpha = float(2 * h) if alpha is None else alpha
    sigma = float(0.08 * h) if sigma is None else sigma
    kg, kx, ky = jax.random.split(key, 3)
    apply = jax.random.uniform(kg) > 0.5
    dx = _gaussian_blur_2d(jax.random.uniform(kx, (h, w)) * 2 - 1, sigma) * alpha
    dy = _gaussian_blur_2d(jax.random.uniform(ky, (h, w)) * 2 - 1, sigma) * alpha
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    coords = [yy + dx, xx + dy]  # the reference displaces axis0 by dx (rand_x)

    from jax.scipy.ndimage import map_coordinates

    warped = jnp.stack([
        map_coordinates(img[..., c], coords, order=1, mode="constant")
        for c in range(img.shape[-1])], axis=-1)
    out_img = jnp.where(apply, warped, img)
    if mask is None:
        return out_img, None
    warped_m = map_coordinates(mask, coords, order=1, mode="nearest")
    return out_img, jnp.where(apply, warped_m, mask)


def random_flip(key: jax.Array, img: jax.Array, mask: jax.Array | None = None,
                horizontal: bool = True, p: float = 0.5):
    """RandomFlip (custom_transforms.py:179-204 family)."""
    axis = 1 if horizontal else 0
    apply = jax.random.uniform(key) < p
    f = lambda a: jnp.where(apply, jnp.flip(a, axis=axis), a)
    return (f(img), None if mask is None else f(mask))


def random_rotate(key: jax.Array, img: jax.Array, mask: jax.Array | None,
                  degree: float = 15.0):
    """RandomRotate: uniform angle in [-degree, degree], bilinear image /
    nearest mask, constant fill (custom_transforms.py RandomRotate)."""
    from jax.scipy.ndimage import map_coordinates

    h, w = img.shape[:2]
    theta = jax.random.uniform(key, minval=-degree, maxval=degree) * jnp.pi / 180
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    ys = cy + (yy - cy) * jnp.cos(theta) - (xx - cx) * jnp.sin(theta)
    xs = cx + (yy - cy) * jnp.sin(theta) + (xx - cx) * jnp.cos(theta)
    coords = [ys, xs]
    out = jnp.stack([
        map_coordinates(img[..., c], coords, order=1, mode="constant")
        for c in range(img.shape[-1])], axis=-1)
    if mask is None:
        return out, None
    return out, map_coordinates(mask, coords, order=0, mode="constant")


def random_sized_crop(key: jax.Array, img: jax.Array, mask: jax.Array | None,
                      size: int):
    """RandomSizedCrop (custom_transforms.py:267-327): crop a random box with
    area in [0.45, 1]x the image and aspect ratio in [0.5, 2] (sides swapped
    with p=0.5), then resize to ``size`` (bilinear image / nearest mask).

    The reference rejection-samples the box up to 10 times and falls back to
    Scale+CenterCrop; under jit the box is clamped to fit instead (same
    marginal distribution up to boundary effects, like ``random_eraser``).
    """
    from jax.scipy.ndimage import map_coordinates

    ka, kr, ks, kx, ky = jax.random.split(key, 5)
    h, w = img.shape[:2]
    area = h * w
    target_area = jax.random.uniform(ka, minval=0.45, maxval=1.0) * area
    aspect = jax.random.uniform(kr, minval=0.5, maxval=2.0)
    bw = jnp.round(jnp.sqrt(target_area * aspect))
    bh = jnp.round(jnp.sqrt(target_area / aspect))
    swap = jax.random.uniform(ks) < 0.5
    bw, bh = jnp.where(swap, bh, bw), jnp.where(swap, bw, bh)
    bw = jnp.clip(bw, 1, w)
    bh = jnp.clip(bh, 1, h)
    x1 = jnp.floor(jax.random.uniform(kx) * (w - bw + 1))
    y1 = jnp.floor(jax.random.uniform(ky) * (h - bh + 1))

    # PIL resize of the (bh, bw) crop to (size, size): src = (i+0.5)*scale-0.5.
    # PIL resizes the *crop*, so edge samples clamp to the box (not the full
    # image) — clip in box coordinates first, then translate.
    def src(out_n, box_len, box_off, in_len):
        s = (jnp.arange(out_n, dtype=jnp.float32) + 0.5) * (box_len / out_n) - 0.5
        s = jnp.clip(s, 0.0, box_len - 1.0)
        return jnp.clip(s + box_off, 0.0, in_len - 1.0)

    ys = src(size, bh, y1, h)
    xs = src(size, bw, x1, w)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    coords = [yy, xx]
    out = jnp.stack([
        map_coordinates(img[..., c], coords, order=1, mode="nearest")
        for c in range(img.shape[-1])], axis=-1)
    if mask is None:
        return out, None
    return out, map_coordinates(mask, coords, order=0, mode="nearest")


def _binary_morph_cross(m: jax.Array, iterations: int, dilate: bool) -> jax.Array:
    """scipy binary_dilation/erosion with the default 4-connectivity cross
    structure, iterated; zero border."""
    m = m > 0.5
    for _ in range(iterations):
        pad = jnp.pad(m, 1, constant_values=False)
        n = (pad[:-2, 1:-1], pad[2:, 1:-1], pad[1:-1, :-2], pad[1:-1, 2:])
        if dilate:
            m = m | n[0] | n[1] | n[2] | n[3]
        else:
            m = m & n[0] & n[1] & n[2] & n[3]
    return m


def get_boundary(mask_2ch: jax.Array, width: int = 5) -> jax.Array:
    """GetBoundary (custom_transforms.py:435-452, constructed by the Normalize
    transforms but never invoked in the active pipeline — provided for the full
    reference surface): per-class boundary band = dilation(w) XOR erosion(w) on
    the (H,W,2) [cup, disc] mask; returns uint8 union."""
    cup, disc = mask_2ch[..., 0], mask_2ch[..., 1]
    bands = []
    for m in (cup, disc):
        d = _binary_morph_cross(m, width, dilate=True)
        e = _binary_morph_cross(m, width, dilate=False)
        bands.append(d ^ e)  # dila+eros with 2->0 is exactly XOR
    return (bands[0] | bands[1]).astype(jnp.uint8)


def normalize_single_label(img_255: jax.Array, mask_u8: jax.Array,
                           label: str | None = None):
    """Normalize_single_label (custom_transforms.py:501-538): image /127.5 - 1;
    the mask is re-thresholded into the 255/128/0 gray encoding
    (>200 -> 255 bg, 50<v<201 -> 128 disc, else 0 cup) and binarized by
    ``label``: OC -> cup only, OD -> disc∪cup. Returns (img, (H,W,1) mask)."""
    img = img_255 / 127.5 - 1.0
    m = jnp.asarray(mask_u8)
    enc = jnp.where(m > 200, 255, jnp.where((m > 50) & (m < 201), 128, 0))
    if label == "OC":
        out = (enc == 0).astype(jnp.float32)
    elif label == "OD":
        out = (enc < 255).astype(jnp.float32)
    else:
        # reference parity: with label=None both rebinarization branches are
        # skipped and the RAW mask values pass through (custom_transforms.py:
        # 523-530 only touch __mask under the OC/OD branches)
        out = m.astype(jnp.float32)
    return img, out[..., None]


def center_crop(img: jax.Array, size: int) -> jax.Array:
    """CenterCrop (custom_transforms.py:179-204)."""
    h, w = img.shape[:2]
    top = (h - size) // 2
    left = (w - size) // 2
    return img[top : top + size, left : left + size]


# ---------------------------------------------------------------------------
# Vestigial label/domain-code helpers (reference inventory completeness)
# ---------------------------------------------------------------------------


def to_multilabel(pre_mask, classes: int = 2):
    """fundus_dataloader.py:10-14: 1 -> [0,1] (disc only), 2 -> [1,1] (cup+disc)."""
    import numpy as np

    mask = np.zeros((pre_mask.shape[0], pre_mask.shape[1], classes))
    mask[pre_mask == 1] = [0, 1]
    mask[pre_mask == 2] = [1, 1]
    return mask


def domain_code_one_hot(dc: int, num: int = 3):
    """custom_transforms.ToMultiLabel (559-564)."""
    import numpy as np

    out = np.zeros([num])
    out[dc] = 1
    return out


def soft_label(key, label):
    """custom_transforms.SoftLable (566-579): jitter the one-hot domain code into
    a random soft distribution with the hot entry in [0.8, 1.0]. Device-side
    equivalent with an explicit key; used only by the (vestigial) domain-code
    pathway."""
    k1, k2 = jax.random.split(key)
    label = jnp.asarray(label, jnp.float32)
    hot = jnp.argmax(label)
    main = 0.8 + jax.random.uniform(k1) * 0.2
    rest = jax.random.uniform(k2, label.shape)
    rest = rest * (label == 0)
    rest = rest / jnp.maximum(rest.sum(), 1e-9) * (1.0 - main)
    return rest.at[hot].set(main)


def fixed_resize(img: jax.Array, size: int) -> jax.Array:
    """FixedResize/Scale/ResizeImg family: plain bilinear square resize."""
    from wt_pse_tpu.models.layers import resize_bilinear

    return resize_bilinear(img[None], (size, size))[0]


def normalize_mean_std(img: jax.Array, mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0)):
    """custom_transforms.Normalize (413-432): /255, -mean, /std."""
    return (img / 255.0 - jnp.asarray(mean)) / jnp.asarray(std)


def normalize_cityscapes(img: jax.Array, mean=(0.0, 0.0, 0.0)):
    """custom_transforms.Normalize_cityscapes (540-557): -mean, /255."""
    return (img - jnp.asarray(mean)) / 255.0
