"""On-device post-processing vs the scipy host oracle."""

import numpy as np
import scipy.ndimage as ndi

import jax.numpy as jnp

from wt_pse_tpu.ops.postprocess import largest_component_fill_holes
from wt_pse_tpu.ops.postprocess_device import (
    fill_holes, label_components, largest_component, postprocess_logits_device)


def _random_blobs(rng, b=3, hw=48, n_blobs=4):
    masks = np.zeros((b, hw, hw), bool)
    for i in range(b):
        for _ in range(n_blobs):
            cy, cx = rng.randint(5, hw - 5, 2)
            r = rng.randint(2, 8)
            yy, xx = np.mgrid[0:hw, 0:hw]
            masks[i] |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
    return masks


def test_label_components_count_matches_scipy(rng):
    masks = _random_blobs(rng)
    ids = np.asarray(label_components(jnp.asarray(masks)))
    for b in range(masks.shape[0]):
        _, n_scipy = ndi.label(masks[b], structure=np.ones((3, 3)))
        n_dev = len(np.unique(ids[b])) - (1 if (ids[b] == 0).any() else 0)
        assert n_dev == n_scipy
        # same partition: pixels share a device id iff they share a scipy id
        lab, _ = ndi.label(masks[b], structure=np.ones((3, 3)))
        for d in np.unique(ids[b]):
            if d == 0:
                continue
            sl = lab[ids[b] == d]
            assert (sl == sl[0]).all()


def test_largest_component_matches_scipy(rng):
    masks = _random_blobs(rng)
    got = np.asarray(largest_component(jnp.asarray(masks)))
    for b in range(masks.shape[0]):
        lab, n = ndi.label(masks[b], structure=np.ones((3, 3)))
        areas = np.bincount(lab.ravel())[1:]
        # compare areas (label choice on exact ties may differ)
        assert got[b].sum() == areas.max()
        keep = np.argmax(areas) + 1
        if (areas == areas.max()).sum() == 1:
            np.testing.assert_array_equal(got[b], lab == keep)


def test_fill_holes_matches_scipy(rng):
    m = np.zeros((2, 32, 32), bool)
    m[0, 5:20, 5:20] = True
    m[0, 9:12, 9:12] = False        # hole
    m[1, 2:30, 2:30] = True
    m[1, 10:15, 10:15] = False      # hole
    m[1, 0, 0] = True               # touching border
    got = np.asarray(fill_holes(jnp.asarray(m)))
    for b in range(2):
        want = ndi.binary_fill_holes(m[b])
        np.testing.assert_array_equal(got[b], want)


def test_device_pipeline_matches_host(rng):
    logits = rng.randn(2, 40, 40).astype(np.float32) * 3
    yy, xx = np.mgrid[0:40, 0:40]
    logits[0][(yy - 20) ** 2 + (xx - 20) ** 2 < 64] = 8.0
    got = np.asarray(postprocess_logits_device(jnp.asarray(logits)))
    for b in range(2):
        want = largest_component_fill_holes(
            (1 / (1 + np.exp(-logits[b].astype(np.float64))) > 0.75).astype(np.uint8))
        np.testing.assert_array_equal(got[b], want)
