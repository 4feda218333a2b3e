"""On-device augmentation + normalization front-end (jit-compiled, batched).

TPU-first re-design of the reference's per-sample PIL transform chain
(``/root/reference/custom_transforms.py``: Resize:375-391, RandomScaleCrop:330-354,
RandomCrop:139-176, Normalize_tf:455-499, ToTensor:581-599):

reference (host, per item):  scale up (1-1.5x, PIL BILINEAR img / NEAREST mask)
                             -> random 256-crop -> threshold-encode -> to tensor
here (device, whole batch):  equivalent crop-window sampling expressed as two
                             per-sample interpolation matrices (H and W), applied
                             as batched matmuls on the MXU — upscale-then-crop of
                             factor s == cropping a 256/s window and resizing it
                             back to 256; offsets map 1:1.

Masks ride the same matrices built with one-hot rows (exact nearest-neighbor
values), so the 255/128/0 gray encoding survives interpolation and the threshold
encode (OD = gray<=200, OC = gray<=50) runs after, as in the reference.

The whole batch (uint8) is gathered from HBM-resident dataset arrays, augmented,
and normalized inside the same XLA program as the train step — zero host work per
iteration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SIZE = 256  # the reference pipeline is fixed at 256 (train.py:59-67)


def _axis_matrices(scaled: jax.Array, offset: jax.Array, size: int):
    """Interpolation matrices for one axis.

    The reference resizes the 256-image to ``scaled`` (int in [256, 384)) pixels
    and crops at integer ``offset``. Output pixel j therefore samples the scaled
    image at (offset + j), i.e. the original image at
    ``src = (offset + j + 0.5) * size/scaled - 0.5`` (half-pixel convention of
    PIL's bilinear upscaling). Nearest (masks) uses PIL NEAREST's
    ``floor((offset + j + 0.5) * size/scaled)``.
    """
    j = jnp.arange(size, dtype=jnp.float32)
    ratio = size / scaled.astype(jnp.float32)
    src = (offset.astype(jnp.float32) + j + 0.5) * ratio - 0.5
    src = jnp.clip(src, 0.0, size - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, size - 1)
    w_hi = src - lo.astype(jnp.float32)
    cols = jnp.arange(size)
    m_bilin = ((cols[None, :] == lo[:, None]) * (1.0 - w_hi)[:, None]
               + (cols[None, :] == hi[:, None]) * w_hi[:, None])
    # PIL NEAREST truncates (j+0.5)*double(in/out). Multiply-first keeps the
    # quotient exact in f32 wherever it is exactly representable; PIL and this
    # disagree only when the source center is an exact integer (where PIL's own
    # double rounding picks an arbitrary neighbor) — measure-zero over the
    # random scale draw.
    near = jnp.clip(
        jnp.floor((offset.astype(jnp.float32) + j + 0.5) * size
                  / scaled.astype(jnp.float32)).astype(jnp.int32),
        0, size - 1)
    m_near = (cols[None, :] == near[:, None]).astype(jnp.float32)
    return m_bilin, m_near


def _sample_params(key: jax.Array, size: int):
    """Draw the reference's RandomScaleCrop randomness for one sample
    (custom_transforms.py:344-348, 167-168): apply ~ Bern(0.5); per-axis scaled
    dims ``int(U(1,1.5)*size)``; crop offsets ``randint(0, dim-size)``."""
    ka, kw, kh, kx, ky = jax.random.split(key, 5)
    apply = jax.random.bernoulli(ka)
    sw = jnp.floor(jax.random.uniform(kw, (), minval=1.0, maxval=1.5) * size)
    sh = jnp.floor(jax.random.uniform(kh, (), minval=1.0, maxval=1.5) * size)
    sw = jnp.where(apply, sw, float(size))
    sh = jnp.where(apply, sh, float(size))
    ox = jnp.floor(jax.random.uniform(kx) * (sw - size + 1))
    oy = jnp.floor(jax.random.uniform(ky) * (sh - size + 1))
    return sh, sw, oy, ox


def _augment_one(key: jax.Array, img_u8: jax.Array, lab_u8: jax.Array):
    """(256,256,3) u8 image + (256,256) u8 gray label -> augmented (f32 img,
    f32 gray label). Identity when the Bernoulli draw says no (scaled == size
    gives exact identity matrices)."""
    size = img_u8.shape[0]
    sh, sw, oy, ox = _sample_params(key, size)
    mh_b, mh_n = _axis_matrices(sh, oy, size)
    mw_b, mw_n = _axis_matrices(sw, ox, size)
    img = img_u8.astype(jnp.float32)
    lab = lab_u8.astype(jnp.float32)
    # H then W contraction; matmuls hit the MXU
    img = jnp.einsum("ph,hwc->pwc", mh_b, img, precision=jax.lax.Precision.HIGHEST)
    img = jnp.einsum("qw,pwc->pqc", mw_b, img, precision=jax.lax.Precision.HIGHEST)
    lab = jnp.einsum("ph,hw->pw", mh_n, lab, precision=jax.lax.Precision.HIGHEST)
    lab = jnp.einsum("qw,pw->pq", mw_n, lab, precision=jax.lax.Precision.HIGHEST)
    return img, lab


def normalize_tf(img_f32: jax.Array, lab_gray_f32: jax.Array):
    """Normalize_tf parity: image /127.5 - 1; gray label -> (od, oc) binary masks
    (OD = gray<=200, OC = gray<=50; custom_transforms.py:466-497)."""
    img = img_f32 / 127.5 - 1.0
    od = (lab_gray_f32 <= 200.0).astype(jnp.float32)[..., None]
    oc = (lab_gray_f32 <= 50.0).astype(jnp.float32)[..., None]
    return img, od, oc


def augment_batch(key: jax.Array, images_u8: jax.Array, labels_u8: jax.Array,
                  train: bool = True):
    """Batched augmentation + normalization.

    Args: images (B,256,256,3) uint8, labels (B,256,256) uint8 grayscale.
    Returns dict(image (B,256,256,3) f32 in [-1,1], target_od/target_oc
    (B,256,256,1) f32).
    """
    if train:
        keys = jax.random.split(key, images_u8.shape[0])
        img, lab = jax.vmap(_augment_one)(keys, images_u8, labels_u8)
    else:
        img = images_u8.astype(jnp.float32)
        lab = labels_u8.astype(jnp.float32)
    img, od, oc = normalize_tf(img, lab)
    return {"image": img, "target_od": od, "target_oc": oc}


def sample_domain_batch(key: jax.Array, images_u8: jax.Array, labels_u8: jax.Array,
                        sizes: jax.Array, per_domain_batch: int):
    """Uniform-with-replacement per-domain sampling, fully on device.

    Args: images (D, Nmax, 256, 256, 3) u8 (domains padded to Nmax), labels
    (D, Nmax, 256, 256) u8, sizes (D,) true pool sizes.
    Returns (B=D*pdb, ...) arrays laid out domain-contiguously (required by the
    MMD slicing — Trainer.py:1013).

    Reference semantics: each train draw picks a uniformly random item per domain
    pool (fundus_dataloader.py:91, Trainer.py:29-55). Two documented deviations:
    the draw is over the *flattened* per-domain pools (see data/fundus.py module
    docstring — identical for the shipped single-pool domains), and the
    ``randint(0, 2^31-1) % size`` mapping carries a modulo bias of ~size/2^31
    (≲1e-7 for any real pool; a rejection loop would cost a data-dependent
    while_loop inside the jit for no measurable change in the draw).
    """
    d = images_u8.shape[0]
    idx = jax.random.randint(key, (d, per_domain_batch), 0, 2**31 - 1)
    idx = idx % sizes[:, None]
    imgs = jax.vmap(lambda im, ix: im[ix])(images_u8, idx)
    labs = jax.vmap(lambda lb, ix: lb[ix])(labels_u8, idx)
    b = d * per_domain_batch
    return (imgs.reshape((b,) + imgs.shape[2:]), labs.reshape((b,) + labs.shape[2:]))


def make_device_batch_fn(per_domain_batch: int):
    """Returns ``fn(data, key) -> batch`` combining sampling + augmentation +
    normalization; ``data`` = dict(images, labels, sizes) resident in HBM."""

    def fn(data, key):
        k1, k2 = jax.random.split(key)
        imgs, labs = sample_domain_batch(
            k1, data["images"], data["labels"], data["sizes"], per_domain_batch)
        return augment_batch(k2, imgs, labs, train=True)

    return fn
