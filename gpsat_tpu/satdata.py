"""Production satellite-data readers — native equivalents of the reference's
`extra_funcs.py` ingestion surface (reference: /root/reference/extra_funcs.py:
along_track_preprocess at 68, bin_to_IS2 at 31, load_sic_data_for_date at
149-195, read_IS2SITMOGR4 at 201), built on the in-house netCDF IO
(gpsat_tpu.ncio) and the in-house EASE2 projection (gpsat_tpu.utils) instead
of xarray/pyproj/s3fs (absent in minimal images; remote S3 access is gated
with a clear error).

Data model conventions (matching the reference's products):
- ICESat-2 along-track sections: netCDF with a 1-d `along_track_distance_
  section` dimension carrying `latitude`, `longitude`, `gps_seconds` (GPS
  epoch 1980-01-06) and value variables (ice_thickness / total_freeboard /
  snow_depth).
- IS2SITMOGR4 monthly gridded thickness: one netCDF per month on a 25 km
  north-polar EASE2 x/y grid.
- NOAA CDR sea-ice concentration: daily netCDF on the same style of grid,
  concentration variable named cdr_seaice_conc / sea_ice_conc / sic / ...
"""

import glob
import os
import re

import numpy as np
import pandas as pd

from gpsat_tpu.dataprepper import DataPrep
from gpsat_tpu.ncio import read_netcdf
from gpsat_tpu.utils import WGS84toEASE2

__all__ = ["along_track_preprocess", "read_is2sitmogr4",
           "sic_pseudo_obs", "load_sic_pseudo_obs_for_date", "bin_to_is2"]

GPS_EPOCH = np.datetime64("1980-01-06T00:00:00")
_CONC_NAMES = ("cdr_seaice_conc", "cdr_seaice_conc_monthly", "sea_ice_conc",
               "seaice_conc_cdr", "concentration", "sic")


def along_track_preprocess(ds_or_path, data_variable="ice_thickness",
                           lat_0=90, lon_0=-45):
    """Along-track sections -> tidy DataFrame with (x, y, time, value).

    Reference behaviour (extra_funcs.py:68-97): rename latitude/longitude/
    gps_seconds, convert GPS seconds to datetimes, project lon/lat to EASE2
    (lat_0=90, lon_0=-45 north-polar), attach x/y. Returns a DataFrame (the
    tabular form the binning step consumes) instead of an xarray object.
    """
    ds = read_netcdf(ds_or_path) if isinstance(ds_or_path, str) else ds_or_path

    def _vals(name, *alts):
        for n in (name,) + alts:
            if n in ds:
                return np.asarray(ds[n].values).reshape(-1)
        raise KeyError(f"variable '{name}' not in dataset "
                       f"(have {list(ds.keys())})")

    lat = _vals("latitude", "lat")
    lon = _vals("longitude", "lon")
    gps = _vals("gps_seconds", "time")
    if data_variable in ds:
        val = np.asarray(ds[data_variable].values).reshape(-1)
    else:   # reference fallback: thickness-only datasets
        val = _vals("ice_thickness")
    t = GPS_EPOCH + gps.astype("timedelta64[s]")
    x, y = WGS84toEASE2(lon=lon, lat=lat, lat_0=lat_0, lon_0=lon_0)
    df = pd.DataFrame({"x": x, "y": y, "time": t, data_variable: val})
    return df.dropna().reset_index(drop=True)


def _grid_xy(ds):
    """(x, y) 1-d grid coordinates with the reference's rename fallbacks
    (extra_funcs.py cdr_preprocess_nh: xgrid/ygrid, ni/nj, xc/yc)."""
    for xn, yn in (("x", "y"), ("xgrid", "ygrid"), ("xc", "yc"),
                   ("ni", "nj")):
        if xn in ds and yn in ds:
            return (np.asarray(ds[xn].values).reshape(-1),
                    np.asarray(ds[yn].values).reshape(-1))
    raise KeyError(f"no x/y grid coordinates found (have {list(ds.coords)})")


def _month_from_name(path):
    m = re.search(r"(\d{6})", os.path.basename(path))
    if m:
        s = m.group(1)
        return np.datetime64(f"{s[:4]}-{s[4:6]}-01")
    return np.datetime64("NaT")


def read_is2sitmogr4(local_data_path, pattern="*.nc",
                     val_cols=("ice_thickness",), data_type="netcdf-local"):
    """Monthly gridded IS2SITMOGR4 thickness -> long DataFrame
    (x, y, time, *val_cols), one row per finite grid cell.

    Reference: read_IS2SITMOGR4 (extra_funcs.py:201) with
    data_type='netcdf-local'; the zarr-s3/netcdf-s3 modes need s3fs, which
    is not available — requesting them raises with that explanation.
    """
    if data_type != "netcdf-local":
        raise ImportError(
            f"read_is2sitmogr4 data_type='{data_type}' needs s3fs/zarr for "
            "remote S3 access, which is not installed in this environment; "
            "download the monthly netCDF files and use "
            "data_type='netcdf-local'")
    files = sorted(glob.glob(os.path.join(local_data_path, pattern)))
    assert files, f"no files matching {pattern} in {local_data_path}"
    frames = []
    for f in files:
        ds = read_netcdf(f)
        x, y = _grid_xy(ds)
        xm, ym = np.meshgrid(x, y)
        t = np.asarray(ds["time"].values).reshape(-1)[0] if "time" in ds \
            else _month_from_name(f)
        cols = {"x": xm.reshape(-1), "y": ym.reshape(-1)}
        keep = None
        for vc in val_cols:
            v = np.asarray(ds[vc].values, dtype=float).squeeze().reshape(-1)
            cols[vc] = v
            fin = np.isfinite(v)
            keep = fin if keep is None else (keep | fin)
        df = pd.DataFrame(cols)[keep if keep is not None else slice(None)]
        df["time"] = t
        frames.append(df)
    return pd.concat(frames, ignore_index=True)


def sic_pseudo_obs(ds, sic_cutoff=0.15, coarsen_factor=2,
                   val_col="ice_thickness", time=None, flip_y=True):
    """Zero-value pseudo-observations where sea-ice concentration is below
    `sic_cutoff` — the ice-edge anchor concatenated into the training set
    (reference: extra_funcs.py:149-195 + IS2_GPSat_train.py:782-786).

    ds: an NcDataset (or anything with the same surface) holding a 2-d
    concentration grid. Returns a DataFrame (x, y, val_col, time).
    """
    conc_name = next((n for n in _CONC_NAMES if n in ds), None)
    assert conc_name is not None, \
        f"no concentration variable found (tried {_CONC_NAMES})"
    conc = np.asarray(ds[conc_name].values, dtype=float).squeeze()
    x, y = _grid_xy(ds)
    if flip_y:   # CDR grids are top-down vs the IS2 orientation
        conc = conc[::-1]
        # y coordinate order is unchanged: flipping data re-aligns it
    if coarsen_factor > 1:
        conc = conc[::coarsen_factor, ::coarsen_factor]
        x = x[::coarsen_factor]
        y = y[::coarsen_factor]
    xm, ym = np.meshgrid(x, y)
    low = np.isfinite(conc) & (conc < sic_cutoff)
    out = pd.DataFrame({"x": xm[low], "y": ym[low],
                        val_col: np.zeros(int(low.sum()))})
    if time is None and "time" in ds:
        time = np.asarray(ds["time"].values).reshape(-1)[0]
    out["time"] = time
    return out


def load_sic_pseudo_obs_for_date(date_str, sic_base_path, sic_cutoff=0.15,
                                 coarsen_factor=2, val_col="ice_thickness"):
    """Daily CDR file lookup + pseudo-obs extraction (reference:
    load_sic_data_for_date, local path branch; the S3 fallback needs s3fs
    and is not supported here). Returns an empty frame when no file exists
    (matching the reference's graceful degrade)."""
    year = date_str[:4]
    compact = date_str.replace("-", "")
    files = sorted(glob.glob(os.path.join(sic_base_path, year,
                                          f"*{compact}*.nc")))
    if not files:
        files = sorted(glob.glob(os.path.join(sic_base_path,
                                              f"*{compact}*.nc")))
    if not files:
        return pd.DataFrame(columns=["x", "y", val_col, "time"])
    ds = read_netcdf(files[0])
    return sic_pseudo_obs(ds, sic_cutoff=sic_cutoff,
                          coarsen_factor=coarsen_factor, val_col=val_col,
                          time=np.datetime64(date_str))


def bin_to_is2(df, x_grid, y_grid, val_col="ice_thickness", grid_res=25_000,
               limit=200_000, by_col="time"):
    """Bin along-track data onto the 25 km IS2 grid (reference: bin_to_IS2,
    extra_funcs.py:31-53). x_grid/y_grid: the target grid's coordinate
    arrays (their extent defines the bin ranges, padded by half a cell)."""
    x_grid = np.asarray(x_grid, dtype=float)
    y_grid = np.asarray(y_grid, dtype=float)
    return DataPrep.bin_data_by(
        df=df, by_cols=[by_col], val_col=val_col,
        x_col="x", y_col="y", grid_res=grid_res, limit=limit,
        x_range=[x_grid.min() - grid_res / 2, x_grid.max() + grid_res / 2],
        y_range=[y_grid.min() - grid_res / 2, y_grid.max() + grid_res / 2])
