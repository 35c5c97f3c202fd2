"""Unit tests for gpsat_tpu.utils.

Mirrors the reference test strategy (tests/test_utils.py in the reference):
round-trip projection checks, transform inverses, config_func behaviour,
weighted-values semantics, array<->DataFrame conversions.
"""

import numpy as np
import pandas as pd
import pytest

from gpsat_tpu.utils import (
    WGS84toEASE2, EASE2toWGS84, softplus, inverse_softplus, sigmoid,
    inverse_sigmoid, grid_2d_flatten, config_func, match, to_array,
    get_weighted_values, array_to_dataframe, dataframe_to_array,
    dict_of_array_to_dict_of_dataframe, pandas_to_dict, json_serializable,
    nested_dict_literal_eval, rmse, nll, expand_dict_by_vals,
)


# ---------------------------------------------------------------------------
# projections — oracle values produced by pyproj in the reference docstrings
# (reference: GPSat/utils.py:565 & 617 examples)
# ---------------------------------------------------------------------------

def test_wgs84_to_ease2_matches_pyproj_oracle():
    x, y = WGS84toEASE2(-105.01621, 39.57422)
    assert np.isclose(x, -5254767.014984061, atol=0.5)
    assert np.isclose(y, 1409604.1043472202, atol=0.5)


def test_ease2_to_wgs84_matches_pyproj_oracle():
    lon, lat = EASE2toWGS84(1000000, 2000000)
    assert np.isclose(lon, 153.434948822922, atol=1e-6)
    assert np.isclose(lat, 69.86894542225777, atol=1e-6)


@pytest.mark.parametrize("lat_0,lon_0", [(90, 0), (-90, 0), (90, 45), (60, 10), (0, 0)])
def test_projection_round_trip(lat_0, lon_0):
    rng = np.random.default_rng(42)
    lons = rng.uniform(-179, 179, 50)
    if lat_0 > 0:
        lats = rng.uniform(30, 89.5, 50)
    elif lat_0 < 0:
        lats = rng.uniform(-89.5, -30, 50)
    else:
        lats = rng.uniform(-45, 45, 50)
    x, y = WGS84toEASE2(lons, lats, lat_0=lat_0, lon_0=lon_0)
    lons2, lats2 = EASE2toWGS84(x, y, lat_0=lat_0, lon_0=lon_0)
    np.testing.assert_allclose(lons2, lons, atol=1e-8)
    np.testing.assert_allclose(lats2, lats, atol=1e-8)


def test_projection_scalar_vs_array():
    xs, ys = WGS84toEASE2(10.0, 75.0)
    xa, ya = WGS84toEASE2(np.array([10.0]), np.array([75.0]))
    assert isinstance(xs, float)
    np.testing.assert_allclose([xs, ys], [xa[0], ya[0]])


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------

def test_softplus_inverse_round_trip():
    x = np.linspace(-20, 20, 101)
    np.testing.assert_allclose(inverse_softplus(softplus(x)), x, atol=1e-9)


def test_softplus_shift():
    x = np.array([0.5, 2.0])
    y = softplus(x, shift=0.1)
    np.testing.assert_allclose(inverse_softplus(y, shift=0.1), x, atol=1e-9)
    assert inverse_softplus(0.05, shift=0.1) == -np.inf


def test_sigmoid_inverse_round_trip():
    x = np.linspace(-10, 10, 51)
    y = sigmoid(x, low=0.3, high=0.5)
    assert np.all((y > 0.3) & (y < 0.5))
    np.testing.assert_allclose(inverse_sigmoid(y, low=0.3, high=0.5), x, atol=1e-7)
    assert inverse_sigmoid(0.25, low=0.3, high=0.5) == -np.inf
    assert inverse_sigmoid(0.55, low=0.3, high=0.5) == np.inf


# ---------------------------------------------------------------------------
# grid
# ---------------------------------------------------------------------------

def test_grid_2d_flatten_centers():
    out = grid_2d_flatten([0, 4], [0, 4], step_size=2)
    # 2x2 cells, centers at 1, 3; x-major (meshgrid xy) ordering
    expected = np.array([[1., 1.], [3., 1.], [1., 3.], [3., 3.]])
    np.testing.assert_allclose(out, expected)


def test_grid_2d_flatten_num_step():
    out = grid_2d_flatten([0, 1], [0, 1], num_step=3, center=False)
    assert out.shape == (9, 2)
    assert out[:, 0].min() == 0 and out[:, 0].max() == 1


# ---------------------------------------------------------------------------
# config_func
# ---------------------------------------------------------------------------

def test_config_func_operator():
    assert config_func(func="==", args=[1, 1])
    assert config_func(func="+", args=[1, 2]) == 3


def test_config_func_lambda_str():
    assert config_func(func="lambda x, y: x + y", args=[1, 1]) == 2


def test_config_func_df_cols():
    df = pd.DataFrame({"A": [1, 2, 3], "B": [4, 5, 6]})
    out = config_func(func="lambda x, y: x + y", df=df, col_args=["A", "B"])
    np.testing.assert_array_equal(out, np.array([5, 7, 9]))
    out = config_func(func="<=", col_args=["A", "B"], df=df)
    assert out.all()


def test_config_func_source_import():
    df = pd.DataFrame({"A": [1, 2, 3], "B": [4, 5, 6]})
    out = config_func(func="cumprod", source="numpy", df=df,
                      kwargs={"axis": 0}, col_args=[["A", "B"]])
    np.testing.assert_array_equal(out, np.array([[1, 4], [2, 20], [6, 120]]))


def test_config_func_dotted_path():
    out = config_func(func="np.abs", args=[-2.0])
    assert out == 2.0


def test_config_func_eval_disabled(monkeypatch):
    monkeypatch.setenv("GPSAT_TPU_ALLOW_EVAL", "0")
    with pytest.raises(ValueError):
        config_func(func="lambda x: x", args=[1])
    # registry / operators still work
    assert config_func(func="==", args=[2, 2])


# ---------------------------------------------------------------------------
# match / to_array
# ---------------------------------------------------------------------------

def test_match_exact():
    np.testing.assert_array_equal(match([3, 1], [1, 2, 3]), np.array([2, 0]))


def test_match_missing_raises():
    with pytest.raises(AssertionError):
        match([5], [1, 2, 3])


def test_to_array_types():
    a, b, c = to_array(1, [1.0, 2.0], np.array([3]))
    assert all(isinstance(v, np.ndarray) for v in (a, b, c))


# ---------------------------------------------------------------------------
# get_weighted_values — semantics from reference tests/test_utils.py:1030
# ---------------------------------------------------------------------------

def test_weighted_values_zero_distance_identity():
    # when ref and dist cols coincide the weights are all 1 -> plain mean per group
    df = pd.DataFrame({
        "px": [0.0, 0.0, 1.0], "py": [0.0, 0.0, 1.0],
        "x": [0.0, 0.0, 1.0], "y": [0.0, 0.0, 1.0],
        "v": [1.0, 3.0, 5.0],
    })
    out = get_weighted_values(df, ref_col=["px", "py"], dist_to_col=["x", "y"],
                              val_cols="v", lengthscale=1.0)
    out = out.sort_values("px").reset_index(drop=True)
    np.testing.assert_allclose(out["v"].values, [2.0, 5.0])


def test_weighted_values_gaussian_weighting():
    # one prediction location covered by two experts at different distances
    df = pd.DataFrame({
        "px": [0.0, 0.0], "x": [0.0, 1.0],
        "v": [10.0, 20.0],
    })
    out = get_weighted_values(df, ref_col="px", dist_to_col="x",
                              val_cols=["v"], lengthscale=1.0)
    w = np.array([1.0, np.exp(-0.5)])
    expected = (w * np.array([10.0, 20.0])).sum() / w.sum()
    np.testing.assert_allclose(out["v"].values, [expected])


def test_weighted_values_requires_lengthscale():
    df = pd.DataFrame({"px": [0.0], "x": [0.0], "v": [1.0]})
    with pytest.raises(AssertionError):
        get_weighted_values(df, ref_col="px", dist_to_col="x", val_cols="v")


def test_weighted_values_shape_mismatch():
    df = pd.DataFrame({"px": [0.0], "py": [0.0], "x": [0.0], "v": [1.0]})
    with pytest.raises(AssertionError):
        get_weighted_values(df, ref_col=["px", "py"], dist_to_col=["x"],
                            val_cols="v", lengthscale=1.0)


# ---------------------------------------------------------------------------
# array <-> DataFrame
# ---------------------------------------------------------------------------

def test_array_to_dataframe_2d():
    x = np.array([[1, 2], [3, 4]])
    df = array_to_dataframe(x, "data")
    assert list(df.index.names) == ["_dim_0", "_dim_1"]
    np.testing.assert_array_equal(df["data"].values, [1, 2, 3, 4])


def test_dataframe_to_array_round_trip():
    x = np.arange(12).reshape(3, 4).astype(float)
    df = array_to_dataframe(x, "v")
    back = dataframe_to_array(df, "v")
    np.testing.assert_array_equal(back, x)


def test_dict_of_array_concat_groups_by_ndim():
    d = {"a": np.array([1, 2, 3]), "b": np.array([[1, 2], [3, 4]]),
         "c": np.array([1.1, 2.2, 3.3])}
    out = dict_of_array_to_dict_of_dataframe(d, concat=True)
    assert set(out.keys()) == {1, 2}
    assert list(out[1].columns) == ["a", "c"]
    assert list(out[2].columns) == ["b"]


def test_dict_of_array_scalar():
    out = dict_of_array_to_dict_of_dataframe({"s": 2.5}, concat=True, reset_index=True)
    assert out[1]["s"].iloc[0] == 2.5
    assert "_dim_0" in out[1].columns


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------

def test_pandas_to_dict():
    df = pd.DataFrame({"x": [1.0], "y": [2.0]})
    assert pandas_to_dict(df) == {"x": 1.0, "y": 2.0}
    assert pandas_to_dict(df.iloc[0]) == {"x": 1.0, "y": 2.0}
    assert pandas_to_dict({"x": 1}) == {"x": 1}


def test_json_serializable_handles_numpy():
    d = {"a": np.float64(1.5), "b": np.array([1, 2]), ("x", "y"): 3}
    out = json_serializable(d)
    import json
    json.dumps(out)  # must not raise
    assert out["a"] == 1.5


def test_nested_dict_literal_eval():
    d = {"('a', 'b')": {"x": 1}, "c": 2}
    out = nested_dict_literal_eval(d)
    assert ("a", "b") in out


def test_rmse_nll():
    y = np.array([1.0, 2.0])
    mu = np.array([1.0, 2.0])
    assert rmse(y, mu) == 0
    out = nll(y, mu, np.array([1.0, 1.0]), return_tot=False)
    np.testing.assert_allclose(out, np.log(np.sqrt(2 * np.pi)))


def test_expand_dict_by_vals():
    out = expand_dict_by_vals({"a": [1, 2], "b": "x"})
    assert len(out) == 2
    assert all(o["b"] == "x" for o in out)


def test_guess_track_num():
    from gpsat_tpu.utils import guess_track_num
    t = np.array([0, 1, 2, 100, 101, 300])
    np.testing.assert_array_equal(guess_track_num(t, thresh=50),
                                  [0, 0, 0, 1, 1, 2])
    np.testing.assert_array_equal(guess_track_num(t, thresh=50, start_track=5),
                                  [5, 5, 5, 6, 6, 7])


def test_compare_dataframes():
    from gpsat_tpu.utils import compare_dataframes
    df1 = pd.DataFrame({"x": [1, 2], "v": [1.0, 2.0]})
    df2 = pd.DataFrame({"x": [1, 2], "v": [1.0, 2.0 + 1e-12]})
    out = compare_dataframes(df1, df2, key_cols=["x"], tol=1e-9)
    assert out["within_tol"]
    df3 = pd.DataFrame({"x": [1, 2], "v": [1.0, 3.0]})
    out = compare_dataframes(df1, df3, key_cols=["x"], tol=1e-9)
    assert not out["within_tol"]
    assert np.isclose(out["v"], 1.0)
