"""Native satellite-data readers (gpsat_tpu.satdata) against synthetic
netCDF files written with the in-house ncio — the reference's extra_funcs.py
ingestion surface (along-track preprocess, IS2SITMOGR4 gridded reader, SIC
pseudo-observations, bin-to-grid)."""

import os

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


def _write_smap(path, seed=7):
    """SMAP/SMOS Bremen mix product shape: 2-d combined_thickness in CM on
    an x/y grid (reference: IS2_SMAP_GPSat_train.py:142-350)."""
    rng = np.random.default_rng(seed)
    x = np.arange(-500 * KM, 500 * KM + 1, 12.5 * KM)
    y = np.arange(-400 * KM, 400 * KM + 1, 12.5 * KM)
    thick_cm = rng.uniform(0.0, 40.0, (len(y), len(x)))   # 0 - 0.4 m
    thick_cm[0, :] = 120.0          # thick ice: filtered (> 0.5 m)
    thick_cm[1, :] = np.nan         # missing
    ds = NcDataset(
        coords={"x": x, "y": y},
        data_vars={"combined_thickness": NcVariable(("y", "x"), thick_cm),
                   "smap_thickness": NcVariable(("y", "x"), thick_cm * 0.9)})
    write_netcdf(ds, path)
    return x, y, thick_cm


def test_smap_cache_and_availability(tmp_path):
    from gpsat_tpu.satdata import (cache_smap_date_range,
                                   check_and_cache_smap_date,
                                   smap_cache_path, smap_url)
    cache = str(tmp_path / "smap")
    assert smap_url("2019-01-15").endswith(
        "north/2019/20190115_north_mix_sit_v300.nc")
    # pre-seed one day -> cached; rest of the range -> missing (fetcher
    # that raises simulates the zero-egress environment)
    _write_smap(smap_cache_path("2019-01-15", cache) if os.path.isdir(cache)
                else (os.makedirs(cache) or
                      smap_cache_path("2019-01-15", cache)))

    def no_net(url, dest):
        raise OSError("no egress")

    r = check_and_cache_smap_date("2019-01-15", cache, fetcher=no_net)
    assert r["success"] and r["cached"]
    rep = cache_smap_date_range("2019-01-14", "2019-01-16", cache,
                                fetcher=no_net,
                                report_csv=str(tmp_path / "avail.csv"))
    assert list(rep["missing"]) == [True, False, True]
    assert pd.read_csv(str(tmp_path / "avail.csv")).shape[0] == 3
    # a failed download never leaves a partial file behind
    def partial(url, dest):
        with open(dest, "wb") as f:
            f.write(b"junk")
        raise OSError("interrupted")
    r2 = check_and_cache_smap_date("2019-01-20", cache, fetcher=partial)
    assert r2["missing"]
    assert not os.path.exists(smap_cache_path("2019-01-20", cache))


def test_load_smap_data_for_date(tmp_path):
    from gpsat_tpu.satdata import load_smap_data_for_date, smap_cache_path
    cache = str(tmp_path / "smap")
    os.makedirs(cache)
    x, y, thick_cm = _write_smap(smap_cache_path("2019-01-15", cache))
    df = load_smap_data_for_date("2019-01-15", cache,
                                 fetcher=lambda u, d: (_ for _ in ()).throw(
                                     OSError("no egress")))
    # cm -> m, [0, 0.5] filter applied, thick/missing rows dropped
    assert len(df) == np.isfinite(thick_cm[2:]).sum()
    assert df["ice_thickness"].max() <= 0.5
    np.testing.assert_allclose(
        sorted(df["ice_thickness"])[-1],
        np.nanmax(thick_cm[2:]) / 100.0)
    assert (pd.to_datetime(df["time"]) == pd.Timestamp("2019-01-15")).all()
    # coarsening strides the grid
    df2 = load_smap_data_for_date("2019-01-15", cache, coarsen_factor=2)
    assert set(np.unique(df2["x"])) <= set(x[::2])
    # region exclusion drops points whose nearest region cell is excluded
    rx = np.array([-500 * KM, 500 * KM])
    ry = np.array([-400 * KM, 400 * KM])
    rmask = np.array([[1.0, 2.0], [1.0, 2.0]])   # region 2 = east half
    df3 = load_smap_data_for_date("2019-01-15", cache, exclude_regions=[2],
                                  region_grid=(rx, ry, rmask))
    assert df3["x"].max() <= 0.0
    assert len(df3) < len(df)
    # missing day -> empty frame with the contract columns
    miss = load_smap_data_for_date("2019-02-01", cache,
                                   fetcher=lambda u, d: (_ for _ in ()).throw(
                                       OSError("no egress")))
    assert miss.empty and list(miss.columns) == ["x", "y", "ice_thickness",
                                                 "time"]
    # gridded companion output
    gx = np.arange(-500 * KM, 500 * KM + 1, 25 * KM)
    gy = np.arange(-400 * KM, 400 * KM + 1, 25 * KM)
    df4, gridded = load_smap_data_for_date("2019-01-15", cache,
                                           is2_grid=(gx, gy))
    assert gridded is not None
    assert np.isfinite(
        gridded.to_dataframe()["ice_thickness"].values).mean() > 0.5


@pytest.mark.slow
def test_smap_driver_end_to_end(tmp_path):
    """The production-style driver runs end-to-end with the real SMAP
    reader as the secondary instrument source (reference flow:
    IS2_SMAP_GPSat_train.py — cache lookup, cm->m + thin-ice filter,
    fusion into the training set, SGPR OI, smooth, re-predict, merge)."""
    from gpsat_tpu.satdata import smap_cache_path
    from examples.sea_ice_freeboard_driver import main as driver_main

    KM2 = 1000.0
    cache = str(tmp_path / "smap")
    os.makedirs(cache)
    rng = np.random.default_rng(1)
    gx = np.arange(-1000 * KM2, 1000 * KM2 + 1, 50 * KM2)
    gy = np.arange(-1000 * KM2, 1000 * KM2 + 1, 50 * KM2)
    ds = NcDataset(
        coords={"x": gx, "y": gy},
        data_vars={"combined_thickness": NcVariable(
            ("y", "x"), rng.uniform(0, 45, (len(gy), len(gx))))})
    write_netcdf(ds, smap_cache_path("2020-01-15", cache))

    store = str(tmp_path / "smap_driver.h5")
    driver_main(["--num-experts", "2", "--plus-secondary",
                 "--secondary-smap-dir", cache,
                 "--secondary-smap-date", "2020-01-15",
                 "--store", store])
    from gpsat_tpu.local_experts import get_results_from_h5file
    dfs, _ = get_results_from_h5file(store, verbose=False)
    assert "preds_SMOOTHED" in dfs
    assert np.isfinite(dfs["preds_SMOOTHED"]["f*"].values).all()
