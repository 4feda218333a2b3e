"""Native C++ eval operators vs the scipy oracles (skipped without a toolchain)."""

import numpy as np
import pytest
import scipy.ndimage as ndi

from wt_pse_tpu import native
from wt_pse_tpu.ops.metrics import surface_distances_scipy as scipy_surface_distances
from wt_pse_tpu.ops.postprocess import largest_component_fill_holes_scipy as largest_component_fill_holes

pytestmark = pytest.mark.skipif(not native.AVAILABLE,
                                reason="no C++ toolchain available")


def _blobs(rng, hw=96, n=5):
    m = np.zeros((hw, hw), bool)
    for _ in range(n):
        cy, cx = rng.randint(8, hw - 8, 2)
        r = rng.randint(3, 14)
        yy, xx = np.mgrid[0:hw, 0:hw]
        m |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
    return m


def test_lcc_fill_matches_scipy(rng):
    for _ in range(5):
        m = _blobs(rng)
        # punch holes
        m[40:43, 40:43] = False
        got = native.largest_component_fill_holes_native(m)
        want = largest_component_fill_holes(m.astype(np.uint8).copy())
        np.testing.assert_array_equal(got, want)


def test_edt_matches_scipy(rng):
    for _ in range(5):
        m = _blobs(rng, hw=64, n=3)
        got = native.edt_native(m)
        want = ndi.distance_transform_edt(~m)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_edt_empty_mask_is_inf(rng):
    m = np.zeros((16, 16), bool)
    got = native.edt_native(m)
    assert np.isinf(got).all()


def test_surface_distances_match_scipy(rng):
    for _ in range(5):
        a = _blobs(rng, hw=72, n=2)
        b = np.roll(_blobs(rng, hw=72, n=2), 3, axis=1)
        if not a.any() or not b.any():
            continue
        got = np.sort(native.surface_distances_native(a, b))
        want = np.sort(scipy_surface_distances(a, b))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
    with pytest.raises(ValueError):
        native.surface_distances_native(np.zeros((8, 8)), a[:8, :8])


def test_native_speedup_sanity(rng):
    """Native path should not be slower than scipy on a large mask (smoke)."""
    import time

    m = _blobs(rng, hw=1024, n=12)
    t0 = time.time()
    native.largest_component_fill_holes_native(m)
    native.edt_native(m)
    t_native = time.time() - t0
    t0 = time.time()
    largest_component_fill_holes(m.astype(np.uint8).copy())
    ndi.distance_transform_edt(~m)
    t_scipy = time.time() - t0
    print(f"native {t_native*1e3:.1f}ms vs scipy {t_scipy*1e3:.1f}ms")
    assert t_native < t_scipy * 3  # sanity only; not a strict perf gate
