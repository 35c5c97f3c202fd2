"""Native satellite-data readers (gpsat_tpu.satdata) against synthetic
netCDF files written with the in-house ncio — the reference's extra_funcs.py
ingestion surface (along-track preprocess, IS2SITMOGR4 gridded reader, SIC
pseudo-observations, bin-to-grid)."""

import numpy as np
import pandas as pd
import pytest

from gpsat_tpu.ncio import NcDataset, NcVariable, write_netcdf
from gpsat_tpu.satdata import (along_track_preprocess, bin_to_is2,
                               load_sic_pseudo_obs_for_date,
                               read_is2sitmogr4, sic_pseudo_obs)
from gpsat_tpu.utils import EASE2toWGS84

KM = 1000.0


def _write_track(path, n=200, seed=0):
    rng = np.random.default_rng(seed)
    x = np.linspace(-500 * KM, 500 * KM, n)
    y = np.linspace(-300 * KM, 400 * KM, n)
    lon, lat = EASE2toWGS84(x, y, lat_0=90, lon_0=-45)
    gps = 1.2e9 + np.arange(n, dtype=float)
    thick = 2.0 + 0.5 * np.sin(x / (200 * KM)) \
        + 0.05 * rng.standard_normal(n)
    thick[5] = np.nan
    ds = NcDataset(
        coords={"along_track_distance_section": np.arange(n, dtype=float)},
        data_vars={
            "latitude": NcVariable(("along_track_distance_section",), lat),
            "longitude": NcVariable(("along_track_distance_section",), lon),
            "gps_seconds": NcVariable(("along_track_distance_section",), gps),
            "ice_thickness": NcVariable(("along_track_distance_section",),
                                        thick)})
    write_netcdf(ds, path)
    return x, y, gps, thick


def test_along_track_preprocess_roundtrip(tmp_path):
    p = str(tmp_path / "track.nc")
    x, y, gps, thick = _write_track(p)
    df = along_track_preprocess(p, "ice_thickness")
    assert list(df.columns) == ["x", "y", "time", "ice_thickness"]
    assert len(df) == np.isfinite(thick).sum()      # NaN rows dropped
    fin = np.isfinite(thick)
    # projection round-trip: EASE2 -> WGS84 (writer) -> EASE2 (reader)
    np.testing.assert_allclose(df["x"].values, x[fin], rtol=1e-6, atol=1.0)
    np.testing.assert_allclose(df["y"].values, y[fin], rtol=1e-6, atol=1.0)
    want_t = (np.datetime64("1980-01-06T00:00:00")
              + gps[fin].astype("timedelta64[s]"))
    assert (df["time"].values == want_t).all()


def _write_monthly_grid(path, month, seed):
    rng = np.random.default_rng(seed)
    x = np.arange(-500 * KM, 500 * KM + 1, 25 * KM)
    y = np.arange(-400 * KM, 400 * KM + 1, 25 * KM)
    th = 1.5 + 0.3 * rng.standard_normal((len(y), len(x)))
    th[:4, :] = np.nan   # open-ocean cells
    ds = NcDataset(coords={"x": x, "y": y},
                   data_vars={"ice_thickness": NcVariable(("y", "x"), th)})
    write_netcdf(ds, path)
    return th


def test_read_is2sitmogr4_local(tmp_path):
    th1 = _write_monthly_grid(str(tmp_path / "IS2SITMOGR4_201901.nc"),
                              "2019-01", 1)
    th2 = _write_monthly_grid(str(tmp_path / "IS2SITMOGR4_201902.nc"),
                              "2019-02", 2)
    df = read_is2sitmogr4(str(tmp_path))
    assert set(df.columns) == {"x", "y", "ice_thickness", "time"}
    assert len(df) == np.isfinite(th1).sum() + np.isfinite(th2).sum()
    assert set(pd.to_datetime(df["time"]).dt.strftime("%Y-%m")) \
        == {"2019-01", "2019-02"}

    with pytest.raises(ImportError, match="s3fs"):
        read_is2sitmogr4(str(tmp_path), data_type="zarr-s3")


def test_sic_pseudo_obs_and_date_lookup(tmp_path):
    x = np.arange(-500 * KM, 500 * KM + 1, 25 * KM)
    y = np.arange(-400 * KM, 400 * KM + 1, 25 * KM)
    conc = np.ones((len(y), len(x)))
    conc[:, :8] = 0.05                      # open water strip
    conc[3, 10] = np.nan
    ds = NcDataset(coords={"x": x, "y": y},
                   data_vars={"cdr_seaice_conc": NcVariable(("y", "x"),
                                                            conc)})
    out = sic_pseudo_obs(ds, sic_cutoff=0.15, coarsen_factor=1,
                         val_col="ice_thickness", time=np.datetime64("2019-01-15"))
    assert (out["ice_thickness"] == 0.0).all()
    assert len(out) == (conc < 0.15).sum()
    assert (out["x"] <= x[7]).all()         # zeros only in the open strip

    # coarsening reduces the count ~4x
    out2 = sic_pseudo_obs(ds, coarsen_factor=2, val_col="ice_thickness")
    assert 0 < len(out2) < len(out)

    # date-based file lookup (reference directory layout: <base>/<year>/)
    ydir = tmp_path / "2019"
    ydir.mkdir()
    write_netcdf(ds, str(ydir / "seaice_conc_daily_nh_20190115_f17.nc"))
    got = load_sic_pseudo_obs_for_date("2019-01-15", str(tmp_path),
                                       coarsen_factor=1)
    assert len(got) == len(out)
    assert (pd.to_datetime(got["time"]) == pd.Timestamp("2019-01-15")).all()
    empty = load_sic_pseudo_obs_for_date("2019-02-01", str(tmp_path))
    assert empty.empty


def test_bin_to_is2_grid_alignment():
    rng = np.random.default_rng(3)
    x_grid = np.arange(-200 * KM, 200 * KM + 1, 25 * KM)
    y_grid = np.arange(-200 * KM, 200 * KM + 1, 25 * KM)
    n = 5000
    df = pd.DataFrame({
        "x": rng.uniform(-200 * KM, 200 * KM, n),
        "y": rng.uniform(-200 * KM, 200 * KM, n),
        "ice_thickness": 2.0 + rng.standard_normal(n) * 0.1,
        "time": np.datetime64("2019-01-15")})
    ds = bin_to_is2(df, x_grid, y_grid, val_col="ice_thickness")
    bdf = ds.to_dataframe().reset_index()
    vals = bdf["ice_thickness"].values
    assert np.isfinite(vals).mean() > 0.9
    assert abs(np.nanmean(vals) - 2.0) < 0.05
    # bins are centred on the 25 km grid
    assert set(np.unique(bdf["x"].values)) <= set(
        np.arange(-212.5 * KM + 25 * KM / 2, 213 * KM, 25 * KM))
