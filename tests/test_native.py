"""Native C++ host ops vs numpy/device oracles."""

import numpy as np
import pytest

from gpsat_tpu import native


@pytest.fixture(scope="module")
def lib_available():
    if native._load() is None:
        pytest.skip("native hostops library unavailable")
    return True


def test_native_max_dist_bool(lib_available):
    rng = np.random.default_rng(0)
    locs = rng.uniform(-10, 10, (5000, 3))
    ref = np.array([1.0, -2.0, 0.5])
    got = native.max_dist_bool(locs, ref, 4.0)
    want = np.sum((locs - ref) ** 2, axis=1) < 16.0
    np.testing.assert_array_equal(got, want)


def test_native_gaussian_2d_weight(lib_available):
    rng = np.random.default_rng(1)
    n = 200
    x = rng.uniform(-5, 5, n)
    y = rng.uniform(-5, 5, n)
    vals = rng.standard_normal(n)
    vals[::17] = np.nan
    got = native.gaussian_2d_weight(x, y, x, y, 2.0, 3.0, vals)
    ok = ~np.isnan(vals)
    want = np.empty(n)
    for i in range(n):
        w = np.exp(-0.5 * (((x - x[i]) / 2.0) ** 2 + ((y - y[i]) / 3.0) ** 2))
        want[i] = np.sum(w[ok] * vals[ok]) / np.sum(w[ok])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_native_weighted_merge(lib_available):
    rng = np.random.default_rng(2)
    n, g = 1000, 50
    group = rng.integers(0, g, n)
    d2 = rng.uniform(0, 9, n)
    v = rng.standard_normal(n)
    ls = 1.5
    sw, swv = native.weighted_merge_accumulate(group, d2, v, ls, g)
    w = np.exp(-d2 / (2 * ls**2))
    np.testing.assert_allclose(sw, np.bincount(group, w, g), atol=1e-12)
    np.testing.assert_allclose(swv, np.bincount(group, w * v, g), atol=1e-12)


def test_prediction_locations_uses_native():
    from gpsat_tpu.prediction_locations import max_dist_bool
    rng = np.random.default_rng(3)
    locs = rng.uniform(-10, 10, (150_000, 2))
    got = max_dist_bool(locs, np.zeros(2), 5.0)
    want = np.hypot(locs[:, 0], locs[:, 1]) < 5.0
    np.testing.assert_array_equal(got, want)
