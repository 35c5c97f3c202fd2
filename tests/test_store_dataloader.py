"""Tests for the h5py results store and the host data plane
(mirrors reference tests/test_dataloader.py + store behaviour exercised by
tests/integration.py)."""

import numpy as np
import pandas as pd
import pytest

from gpsat_tpu.store import ResultsStore
from gpsat_tpu.dataloader import DataLoader
from gpsat_tpu.dataprepper import DataPrep
from gpsat_tpu.prediction_locations import PredictionLocations, max_dist_bool
from gpsat_tpu.utils import grid_2d_flatten


@pytest.fixture
def sample_df():
    rng = np.random.default_rng(0)
    return pd.DataFrame({
        "x": rng.uniform(-3, 3, 100),
        "y": rng.uniform(-3, 3, 100),
        "t": rng.integers(0, 5, 100).astype(float),
        "z": rng.standard_normal(100),
        "source": rng.choice(["A", "B"], 100),
    })


# ---------------------------------------------------------------------------
# ResultsStore
# ---------------------------------------------------------------------------

def test_store_append_select_round_trip(tmp_path, sample_df):
    path = str(tmp_path / "t.h5")
    with ResultsStore(path) as s:
        s.append("data", sample_df)
    with ResultsStore(path, "r") as s:
        back = s.select("data")
    pd.testing.assert_frame_equal(back.reset_index(drop=True), sample_df,
                                  check_dtype=False)


def test_store_multiindex(tmp_path, sample_df):
    path = str(tmp_path / "t.h5")
    df = sample_df.set_index(["x", "y"])
    with ResultsStore(path) as s:
        s.append("data", df)
    with ResultsStore(path, "r") as s:
        back = s.select("data")
        assert list(back.index.names) == ["x", "y"]
        assert s.index_cols("data") == ["x", "y"]


def test_store_append_twice(tmp_path, sample_df):
    path = str(tmp_path / "t.h5")
    with ResultsStore(path) as s:
        s.append("data", sample_df)
        s.append("data", sample_df)
        assert s.nrows("data") == 200


def test_store_where_select(tmp_path, sample_df):
    path = str(tmp_path / "t.h5")
    with ResultsStore(path) as s:
        s.append("data", sample_df)
        sel = s.select("data", where={"col": "t", "comp": "==", "val": 2.0})
        assert (sel["t"] == 2.0).all()
        # string wheres like the reference's param loading path
        sel2 = s.select("data", where=["t == 2.0"])
        assert len(sel2) == len(sel)
        # multiple conditions AND
        sel3 = s.select("data", where=[{"col": "t", "comp": ">=", "val": 1.0},
                                       {"col": "t", "comp": "<=", "val": 2.0}])
        assert sel3["t"].between(1, 2).all()


def test_store_attrs(tmp_path, sample_df):
    path = str(tmp_path / "t.h5")
    cfg = {"a": 1, "nested": {"b": [1, 2]}}
    with ResultsStore(path) as s:
        s.append("data", sample_df)
        s.set_attr("data", "config", cfg)
    with ResultsStore(path, "r") as s:
        assert s.get_attr("data", "config") == cfg


def test_store_put_replaces(tmp_path, sample_df):
    path = str(tmp_path / "t.h5")
    with ResultsStore(path) as s:
        s.append("data", sample_df)
        s.put("data", sample_df.head(10))
        assert s.nrows("data") == 10


def test_store_string_columns(tmp_path):
    path = str(tmp_path / "t.h5")
    df = pd.DataFrame({"model": ["GPRModel"] * 3, "v": [1.0, 2.0, 3.0]})
    with ResultsStore(path) as s:
        s.append("run_details", df)
        back = s.select("run_details")
    assert list(back["model"]) == ["GPRModel"] * 3


# ---------------------------------------------------------------------------
# DataLoader
# ---------------------------------------------------------------------------

def test_load_where_on_dataframe(sample_df):
    out = DataLoader.load(source=sample_df,
                          where={"col": "t", "comp": ">=", "val": 2})
    assert (out["t"] >= 2).all()


def test_load_where_datetime_string():
    # date-string conditions against datetime64 columns (the canonical
    # GPSat global_select date window; reference gets str->datetime
    # coercion free from pandas where-string eval, dataloader.py:1161)
    df = pd.DataFrame({
        "date": pd.date_range("2020-01-01", periods=10, freq="D"),
        "v": np.arange(10.0)})
    out = DataLoader.load(source=df, where=[
        {"col": "date", "comp": ">=", "val": "2020-01-03"},
        {"col": "date", "comp": "<", "val": "2020-01-06"}])
    assert list(out["v"]) == [2.0, 3.0, 4.0]


def test_load_row_select_negate(sample_df):
    rs = {"col": "source", "comp": "==", "val": "A"}
    a = DataLoader.load(source=sample_df, row_select=[rs])
    not_a = DataLoader.load(source=sample_df, row_select=[{**rs, "negate": True}])
    assert len(a) + len(not_a) == len(sample_df)
    assert (a["source"] == "A").all()
    assert (not_a["source"] == "B").all()


def test_load_col_funcs_and_select(sample_df):
    out = DataLoader.load(source=sample_df,
                          col_funcs={"r2": {"func": "lambda a, b: a**2 + b**2",
                                            "col_args": ["x", "y"]}},
                          col_select=["x", "y", "r2"])
    assert list(out.columns) == ["x", "y", "r2"]
    np.testing.assert_allclose(out["r2"], out["x"]**2 + out["y"]**2)


def test_load_from_h5(tmp_path, sample_df):
    path = str(tmp_path / "t.h5")
    DataLoader.write_to_hdf(sample_df, path, table="data",
                            config={"src": "test"})
    out = DataLoader.load(source=path, table="data",
                          where={"col": "t", "comp": "<=", "val": 1.0})
    assert (out["t"] <= 1.0).all()
    assert DataLoader.get_attribute_from_table(path, "data", "config") == {"src": "test"}


def test_local_data_select_radius(sample_df):
    ref = {"x": 0.0, "y": 0.0, "t": 2.0}
    ls = [{"col": "t", "comp": "<=", "val": 1},
          {"col": "t", "comp": ">=", "val": -1},
          {"col": ["x", "y"], "comp": "<", "val": 1.5}]
    out = DataLoader.local_data_select(sample_df, ref, ls, verbose=False)
    assert (np.hypot(out["x"], out["y"]) < 1.5).all()
    assert out["t"].between(1, 3).all()


def test_get_where_list_dynamic():
    gs = [{"col": "z", "comp": ">", "val": 0},
          {"loc_col": "t", "src_col": "date", "func": "lambda x, y: x + y"}]
    ls = [{"col": "t", "comp": "<=", "val": 4}, {"col": "t", "comp": ">=", "val": -4}]
    out = DataLoader.get_where_list(gs, local_select=ls, ref_loc={"t": 10.0})
    assert out[0] == gs[0]
    assert out[1] == {"col": "date", "comp": "<=", "val": 14.0}
    assert out[2] == {"col": "date", "comp": ">=", "val": 6.0}


def test_read_flat_files(tmp_path, sample_df):
    d = tmp_path / "raw"
    d.mkdir()
    sample_df.head(50).to_csv(d / "A_RAW.csv", index=False)
    sample_df.tail(50).to_csv(d / "B_RAW.csv", index=False)
    import os, re
    out = DataLoader.read_flat_files(
        file_dirs=str(d), file_regex=r"_RAW\.csv$",
        col_funcs={"file_source": {
            "func": lambda fp: re.sub("_RAW.*$", "", os.path.basename(fp)),
            "filename_as_arg": True}})
    assert len(out) == 100
    assert set(out["file_source"]) == {"A", "B"}


def test_generate_local_expert_locations():
    out = DataLoader.generate_local_expert_locations(
        {"x": np.arange(3), "y": np.arange(2), "t": 1.0})
    assert len(out) == 6
    assert list(out.columns) == ["x", "y", "t"]


# ---------------------------------------------------------------------------
# DataPrep binning (mirrors reference tests/test_dataprepper.py)
# ---------------------------------------------------------------------------

def test_bin_data_2d_shapes(sample_df):
    b, (xc, yc) = DataPrep.bin_data(sample_df, x_range=[-4, 4], y_range=[-4, 4],
                                    grid_res=1.0, val_col="z")
    assert b.shape == (8, 8)
    assert len(xc) == 8 and len(yc) == 8
    # centers, not edges
    np.testing.assert_allclose(xc, np.arange(-3.5, 4, 1.0))


def test_bin_data_count_non_negative(sample_df):
    b, _ = DataPrep.bin_data(sample_df, x_range=[-4, 4], y_range=[-4, 4],
                             grid_res=1.0, val_col="z", bin_statistic="count")
    assert np.nanmin(b) >= 0
    assert np.nansum(b) == len(sample_df)


def test_bin_data_by_groups(sample_df):
    ds = DataPrep.bin_data_by(df=sample_df, by_cols=["source"], val_col="z",
                              x_range=[-4, 4], y_range=[-4, 4], grid_res=2.0)
    df = ds.to_dataframe().dropna().reset_index()
    assert set(df["source"]) <= {"A", "B"}
    assert {"x", "y", "z", "source"} <= set(df.columns)
    # binned mean of a constant field is that constant
    cdf = sample_df.copy()
    cdf["z"] = 5.0
    ds2 = DataPrep.bin_data_by(df=cdf, by_cols=["source"], val_col="z",
                               x_range=[-4, 4], y_range=[-4, 4], grid_res=2.0)
    df2 = ds2.to_dataframe().dropna().reset_index()
    np.testing.assert_allclose(df2["z"], 5.0)


def test_bin_data_1d(sample_df):
    b, xc = DataPrep.bin_data(sample_df, x_range=[-4, 4], grid_res=1.0,
                              val_col="z", bin_2d=False)
    assert b.shape == (8,)


# ---------------------------------------------------------------------------
# PredictionLocations (mirrors reference prediction_locations.py __main__)
# ---------------------------------------------------------------------------

def test_pred_loc_expert_loc_default():
    xprt = pd.DataFrame({"x": [0.0], "y": [2.0], "t": [3.0]})
    ploc = PredictionLocations(coords_col=["x", "y", "t"], expert_loc=xprt)
    assert isinstance(ploc.expert_loc, np.ndarray)
    np.testing.assert_array_equal(ploc(), ploc.expert_loc)


def test_pred_loc_setter_equivalence():
    xprt = pd.DataFrame({"x": [0.0], "y": [2.0], "t": [3.0]})
    ploc = PredictionLocations(coords_col=["x", "y", "t"])
    els = []
    for v in [xprt, xprt.iloc[0, :], xprt.iloc[0, :].values,
              xprt.iloc[0, :].values.tolist()]:
        ploc.expert_loc = v
        els.append(ploc.expert_loc)
    for e in els[1:]:
        np.testing.assert_array_equal(els[0], e)


def test_pred_loc_shift_arrays_count():
    shifts = {"x": np.arange(3), "y": np.linspace(-2, 3, 4)}
    ploc = PredictionLocations(method="shift_arrays", **shifts)
    ploc.coords_col = ["x", "y", "t"]
    ploc.expert_loc = pd.DataFrame({"x": [0.0], "y": [2.0], "t": [3.0]})
    out = ploc()
    assert out.shape == (12, 3)
    # t column filled with expert t (zero shift)
    np.testing.assert_allclose(out[:, 2], 3.0)


def test_pred_loc_from_dataframe_max_dist():
    from scipy.spatial.distance import cdist
    X = grid_2d_flatten([-500_000, 500_000], [-500_000, 500_000], step_size=50_000)
    df = pd.DataFrame(X, columns=["x", "y"])
    xprt = pd.DataFrame({"x": [0.0], "y": [0.0], "t": [3.0]})
    ploc = PredictionLocations(method="from_dataframe", df=df, max_dist=200_000,
                               coords_col=["x", "y", "t"], expert_loc=xprt)
    out = ploc()
    assert out.shape[1] == 3
    r = cdist(out[:, :2], np.array([[0.0, 0.0]]))
    assert r.max() < 200_000
    np.testing.assert_allclose(out[:, 2], 3.0)  # filled from expert


def test_pred_loc_t_out_of_range_empty():
    df = pd.DataFrame({"x": [0.0], "y": [0.0], "t": [1e9]})
    xprt = pd.DataFrame({"x": [0.0], "y": [0.0], "t": [3.0]})
    ploc = PredictionLocations(method="from_dataframe", df=df, max_dist=100.0,
                               coords_col=["x", "y", "t"], expert_loc=xprt)
    assert len(ploc()) == 0


def test_max_dist_bool_chunked():
    rng = np.random.default_rng(0)
    locs = rng.uniform(-10, 10, (1000, 2))
    mask = max_dist_bool(locs, np.zeros(2), 5.0, chunk=100)
    want = np.hypot(locs[:, 0], locs[:, 1]) < 5.0
    np.testing.assert_array_equal(mask, want)


def test_bin_data_chunked_batch_mode(tmp_path, sample_df):
    """BinData batch=True: chunked loads per unique load_by value
    (reference: GPSat/bin_data.py:280)."""
    from gpsat_tpu.bin_data import BinData
    path = str(tmp_path / "raw.h5")
    DataLoader.write_to_hdf(sample_df, path, table="data")
    bd = BinData(input={"source": path, "table": "data"},
                 bin_config={"by_cols": ["source"], "val_col": "z",
                             "x_range": [-4, 4], "y_range": [-4, 4],
                             "grid_res": 2.0},
                 output={"file": str(tmp_path / "binned.h5"), "table": "data"})
    binned_batch, _ = bd.bin_data(batch=True, load_by="source")
    binned_once, _ = bd.bin_data(batch=False)
    a = binned_batch.sort_values(["source", "y", "x"]).reset_index(drop=True)
    b = binned_once.sort_values(["source", "y", "x"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["x", "y", "z"]], b[["x", "y", "z"]])
    bd.write_dataframe_to_table(binned_batch)
    with ResultsStore(str(tmp_path / "binned.h5"), "r") as s:
        assert s.nrows("data") == len(binned_batch)
        assert s.get_attr("data", "config") is not None


def test_bin_data_batch_probe_is_out_of_core(tmp_path, sample_df,
                                             monkeypatch):
    """batch=True never materialises the full table: the unique-value probe
    reads only the load_by column subset through the store's pushdown
    reader (reference iterates the HDF store in chunks for the same reason,
    GPSat/bin_data.py:418-440)."""
    from gpsat_tpu.bin_data import BinData
    path = str(tmp_path / "raw.h5")
    DataLoader.write_to_hdf(sample_df, path, table="data")
    calls = []
    orig = ResultsStore.select

    def spy(self, table, where=None, columns=None, set_index=True):
        calls.append({"where": where, "columns": columns})
        return orig(self, table, where=where, columns=columns,
                    set_index=set_index)

    monkeypatch.setattr(ResultsStore, "select", spy)
    bd = BinData(input={"source": path, "table": "data"},
                 bin_config={"by_cols": ["source"], "val_col": "z",
                             "x_range": [-4, 4], "y_range": [-4, 4],
                             "grid_res": 2.0})
    bd.bin_data(batch=True, load_by="source")
    # probe read: column subset only; chunk reads: where-pushdown on load_by
    assert calls[0]["columns"] == ["source"]
    assert all(c["where"] for c in calls[1:])
    assert all(c["columns"] is None for c in calls[1:])


def test_get_masks_for_expert_loc_had_obs():
    """'had_obs' keeps only grid cells with any non-NaN obs across dates
    (reference: GPSat/dataloader.py:2716-2791)."""
    from gpsat_tpu.dataloader import DataLoader
    xs, ys = np.meshgrid([0.0, 1.0, 2.0], [10.0, 20.0], indexing="ij")
    ref = pd.DataFrame({
        "x": np.tile(xs.ravel(), 2), "y": np.tile(ys.ravel(), 2),
        "date": np.repeat(["2020-01-01", "2020-01-02"], xs.size),
        "obs": np.nan})
    # only cells (0, 10) and (2, 20) ever have data
    ref.loc[(ref.x == 0) & (ref.y == 10) & (ref.date == "2020-01-01"),
            "obs"] = 1.0
    ref.loc[(ref.x == 2) & (ref.y == 20) & (ref.date == "2020-01-02"),
            "obs"] = 2.0
    masks = DataLoader.get_masks_for_expert_loc(ref, el_masks=["had_obs"],
                                                obs_col="obs")
    assert len(masks) == 1
    got = set(map(tuple, masks[0][["x", "y"]].values))
    assert got == {(0.0, 10.0), (2.0, 20.0)}

    locs = DataLoader.generate_local_expert_locations(
        {"x": [0.0, 1.0, 2.0], "y": [10.0, 20.0]}, masks=masks)
    assert set(map(tuple, locs[["x", "y"]].values)) == got


def test_get_masks_for_expert_loc_grid_space():
    """grid_space coarsens the expert grid by a regular stride."""
    from gpsat_tpu.dataloader import DataLoader
    ref = pd.DataFrame({"x": np.repeat(np.arange(6.0), 6),
                        "y": np.tile(np.arange(6.0), 6), "obs": 1.0})
    masks = DataLoader.get_masks_for_expert_loc(
        ref, el_masks=[{"grid_space": 2, "dims": ["x", "y"]}])
    assert len(masks) == 1
    m = masks[0]
    assert set(m["x"]) == {0.0, 2.0, 4.0} and set(m["y"]) == {0.0, 2.0, 4.0}

    locs = DataLoader.generate_local_expert_locations(
        {"x": np.arange(6.0), "y": np.arange(6.0)}, masks=masks)
    assert len(locs) == 9


def test_get_masks_passthrough_where_dict():
    from gpsat_tpu.dataloader import DataLoader
    where = {"col": "x", "comp": ">=", "val": 3}
    masks = DataLoader.get_masks_for_expert_loc(None, el_masks=[where])
    assert masks == [where]
    locs = DataLoader.generate_local_expert_locations(
        {"x": np.arange(6.0), "y": [0.0]}, masks=masks)
    assert set(locs["x"]) == {3.0, 4.0, 5.0}

def test_get_masks_for_expert_loc_xarray_like():
    """The reference passes an xarray object (GPSat/dataloader.py:2786-2805);
    our duck-typed path reads .coords for grid_space and .to_dataframe for
    had_obs. xarray is absent from the image, so fake the minimal surface."""
    from gpsat_tpu.dataloader import DataLoader

    xs = np.arange(6.0)
    ys = np.arange(4.0)
    dates = np.array(["2020-01-01", "2020-01-02"])
    vals = np.full((2, 6, 4), np.nan)
    vals[0, 0, 1] = 1.0
    vals[1, 5, 3] = 2.0

    class FakeCoord:
        def __init__(self, v):
            self.values = np.asarray(v)

    class FakeDataArray:
        name = "obs"
        coords = {"x": FakeCoord(xs), "y": FakeCoord(ys),
                  "date": FakeCoord(dates)}

        def rename(self, name):
            return self

        def to_dataframe(self):
            d, xg, yg = np.meshgrid(dates, xs, ys, indexing="ij")
            return pd.DataFrame({"date": d.ravel(), "x": xg.ravel(),
                                 "y": yg.ravel(), "obs": vals.ravel()}
                                ).set_index(["date", "x", "y"])

    masks = DataLoader.get_masks_for_expert_loc(
        FakeDataArray(), el_masks=["had_obs",
                                   {"grid_space": 2, "dims": ["x", "y"]}],
        obs_col="obs")
    assert len(masks) == 2
    got = set(map(tuple, masks[0][["x", "y"]].values))
    assert got == {(0.0, 1.0), (5.0, 3.0)}
    assert set(masks[1]["x"]) == {0.0, 2.0, 4.0}
    assert set(masks[1]["y"]) == {0.0, 2.0}
