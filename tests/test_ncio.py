"""Native netCDF IO: round-trips through the h5py dimension-scale writer,
netCDF3 via scipy, DataLoader engine integration and where pushdown.
(Reference surface: GPSat/dataloader.py:32-33,388-389,776,1126-1155.)
"""

import os

import numpy as np
import pandas as pd
import pytest

from gpsat_tpu import ncio
from gpsat_tpu.ncio import NcDataset, NcVariable, read_netcdf, write_netcdf
from gpsat_tpu.dataloader import DataLoader


@pytest.fixture
def grid_ds():
    x = np.linspace(-100.0, 100.0, 9)
    y = np.linspace(-50.0, 50.0, 5)
    t = np.array([0.0, 1.0, 2.0])
    rng = np.random.default_rng(3)
    z = rng.standard_normal((3, 5, 9))
    sic = rng.uniform(0, 1, (5, 9))
    return ncio.NcDataset(
        data_vars={"z": ncio.NcVariable(("t", "y", "x"), z,
                                        {"units": "m"}),
                   "sic": ncio.NcVariable(("y", "x"), sic)},
        coords={"x": x, "y": y, "t": t},
        attrs={"title": "synthetic"})


def test_netcdf4_roundtrip(tmp_path, grid_ds):
    path = str(tmp_path / "grid.nc")
    ncio.write_netcdf(grid_ds, path)
    back = ncio.read_netcdf(path)
    assert set(back.data_vars) == {"z", "sic"}
    assert back.data_vars["z"].dims == ("t", "y", "x")
    np.testing.assert_allclose(back.coords["x"], grid_ds.coords["x"])
    np.testing.assert_allclose(back.data_vars["z"].values,
                               grid_ds.data_vars["z"].values)
    assert back.attrs["title"] == "synthetic"
    assert back.data_vars["z"].attrs["units"] == "m"


def test_netcdf3_read(tmp_path):
    from scipy.io import netcdf_file
    path = str(tmp_path / "classic.nc")
    with netcdf_file(path, "w") as f:
        f.createDimension("x", 4)
        xv = f.createVariable("x", "d", ("x",))
        xv[:] = np.arange(4.0)
        zv = f.createVariable("z", "d", ("x",))
        zv[:] = np.array([1.0, 2.0, 3.0, 4.0])
    ds = ncio.read_netcdf(path)
    np.testing.assert_allclose(ds.coords["x"], np.arange(4.0))
    np.testing.assert_allclose(ds.data_vars["z"].values, [1, 2, 3, 4])


def test_to_dataframe_union_and_dropna(grid_ds):
    grid_ds.data_vars["z"].values[0, 0, 0] = np.nan
    df = grid_ds.to_dataframe()
    # z spans (t,y,x)=135 rows; sic broadcasts; the NaN-z row survives
    # because sic is finite there (dropna is how='all')
    assert len(df) == 3 * 5 * 9
    assert {"t", "y", "x", "z", "sic"} <= set(df.columns)
    sub = df[(df.t == 1.0) & (df.y == 0.0)]
    np.testing.assert_allclose(sub["z"].values,
                               grid_ds.data_vars["z"].values[1, 2, :])


def test_sel_where_pushdown(grid_ds):
    sub, leftover = grid_ds.sel_where([
        {"col": "x", "comp": ">=", "val": 0.0},
        {"col": "t", "comp": "==", "val": 1.0},
        {"col": "z", "comp": ">", "val": 0.0},     # data var: not pushable
    ])
    assert (sub.coords["x"] >= 0).all() and len(sub.coords["x"]) == 5
    assert sub.coords["t"].tolist() == [1.0]
    assert sub.data_vars["z"].values.shape == (1, 5, 5)
    assert leftover == [{"col": "z", "comp": ">", "val": 0.0}]


def test_dataloader_netcdf_engine(tmp_path, grid_ds):
    path = str(tmp_path / "grid.nc")
    ncio.write_netcdf(grid_ds, path)
    df = DataLoader.load(path, where=[{"col": "t", "comp": "==", "val": 2.0},
                                      {"col": "z", "comp": ">", "val": 0.0}])
    assert (df["t"] == 2.0).all()
    assert (df["z"] > 0).all()
    assert len(df) > 0


def test_dataloader_zarr_gate(tmp_path):
    with pytest.raises(ImportError, match="zarr"):
        DataLoader.load(str(tmp_path / "missing.zarr"))


def test_dataset_from_dataframe_roundtrip():
    df = pd.DataFrame({"x": [0.0, 0.0, 1.0], "y": [0.0, 1.0, 0.0],
                       "v": [1.0, 2.0, 3.0]})
    ds = ncio.dataset_from_dataframe(df, index_cols=["x", "y"])
    v = ds.data_vars["v"].values
    assert v.shape == (2, 2)
    np.testing.assert_allclose(v[0], [1.0, 2.0])
    assert v[1, 0] == 3.0 and np.isnan(v[1, 1])
    # long-form round trip drops the unobserved cell
    back = ds.to_dataframe()
    assert len(back) == 3


def test_write_to_netcdf_from_dataframe(tmp_path):
    """Driver-export path: long results -> dense grid -> nc file."""
    df = pd.DataFrame({"x": np.tile([0.0, 1.0, 2.0], 2),
                       "y": np.repeat([0.0, 1.0], 3),
                       "f": np.arange(6.0)})
    ds = ncio.dataset_from_dataframe(df, index_cols=["y", "x"])
    path = str(tmp_path / "out.nc")
    DataLoader.write_to_netcdf(ds, path)
    back = ncio.read_netcdf(path)
    np.testing.assert_allclose(back.data_vars["f"].values,
                               np.arange(6.0).reshape(2, 3))


def test_decode_fill_and_scale(tmp_path):
    import h5py
    path = str(tmp_path / "enc.nc")
    with h5py.File(path, "w") as f:
        d = f.create_dataset("x", data=np.arange(3.0))
        d.make_scale("x")
        v = f.create_dataset("z", data=np.array([0, 10, 32767], np.int16))
        v.dims[0].attach_scale(d)
        v.attrs["_FillValue"] = np.int16(32767)
        v.attrs["scale_factor"] = 0.1
        v.attrs["add_offset"] = 5.0
    ds = ncio.read_netcdf(path)
    z = ds.data_vars["z"].values
    np.testing.assert_allclose(z[:2], [5.0, 6.0])
    assert np.isnan(z[2])


def test_combine_monthly_netcdf(tmp_path):
    """End-to-end monthly-product combiner (reference:
    IS2_SM_GP/combine_monthly_netcdf.py): collect run dirs, concat along
    time, attach cell area / region mask (CAA masked from thickness only)
    / middle-day SIC, write + re-read."""
    from examples.combine_monthly_netcdf import (collect_monthly_files,
                                                 combine_monthly_netcdf,
                                                 parse_date_from_filename)
    rng = np.random.default_rng(0)
    x = np.arange(-100e3, 100e3 + 1, 25e3)
    y = np.arange(-75e3, 75e3 + 1, 25e3)
    ny, nx = len(y), len(x)
    months = [(2018, 11), (2018, 12), (2019, 1)]
    for yr, mo in months:
        sub = tmp_path / f"run_30days_smap_{yr:04d}{mo:02d}15_v01"
        sub.mkdir()
        ds = NcDataset(
            coords={"x": x, "y": y},
            data_vars={
                "ice_thickness": NcVariable(
                    ("y", "x"), rng.uniform(0.5, 3.0, (ny, nx))),
                "ice_thickness_unc": NcVariable(
                    ("y", "x"), rng.uniform(0.0, 0.5, (ny, nx)))})
        write_netcdf(ds, str(sub / f"IS2_interp_{yr:04d}-{mo:02d}-15.nc"))
    (tmp_path / "not_a_run_dir").mkdir()

    # static fields
    area = NcDataset(coords={"x": x, "y": y},
                     data_vars={"cell_area": NcVariable(
                         ("y", "x"), np.full((ny, nx), 625e6))})
    write_netcdf(area, str(tmp_path / "cell_area.nc"))
    rmask = np.ones((ny, nx))
    rmask[-1, :] = 12.0     # CAA row (pre-flip orientation)
    rm = NcDataset(coords={"x": x, "y": y},
                   data_vars={"sea_ice_region_surface_mask": NcVariable(
                       ("y", "x"), rmask)})
    write_netcdf(rm, str(tmp_path / "region_mask.nc"))
    # middle-day SIC for one month only
    sic_dir = tmp_path / "sic" / "2018"
    sic_dir.mkdir(parents=True)
    conc = rng.uniform(0, 1, (ny, nx))
    write_netcdf(NcDataset(coords={"x": x, "y": y},
                           data_vars={"cdr_seaice_conc": NcVariable(
                               ("y", "x"), conc)}),
                 str(sic_dir / "seaice_conc_daily_20181215_v04.nc"))

    assert parse_date_from_filename("IS2_interp_2018-11-15.nc") is not None
    files, dates = collect_monthly_files(str(tmp_path), "run_30days_smap",
                                         "v01")
    assert len(files) == 3
    assert [d.strftime("%Y-%m") for d in dates] == ["2018-11", "2018-12",
                                                    "2019-01"]
    out_nc = str(tmp_path / "combined.nc")
    combined = combine_monthly_netcdf(
        str(tmp_path), cell_area_path=str(tmp_path / "cell_area.nc"),
        region_mask_path=str(tmp_path / "region_mask.nc"),
        sic_dir=str(tmp_path / "sic"), out_path=out_nc)
    th = combined["ice_thickness"].values
    assert th.shape == (3, ny, nx)
    # region mask is flipped north-up: CAA row lands at index 0
    assert np.isnan(th[:, 0, :]).all()          # CAA masked in thickness
    assert np.isfinite(th[:, 1:, :]).all()
    sic = combined["sea_ice_conc"].values
    np.testing.assert_allclose(sic[1], conc[::-1], rtol=1e-6)  # 2018-12
    assert np.isnan(sic[0]).all() and np.isnan(sic[2]).all()
    assert combined["region_mask"].values.dtype == np.int16
    # roundtrip through the native writer/reader
    back = read_netcdf(out_nc)
    assert back["ice_thickness"].values.shape == (3, ny, nx)
    np.testing.assert_allclose(back["grid_cell_area"].values[0, 0], 625e6)

    # browse images (reference --browse_dir: per-month V4-style panels +
    # seasonal cycle, combine_monthly_netcdf.py:678-694)
    from examples.combine_monthly_netcdf import write_browse_images
    browse = tmp_path / "browse"
    written = write_browse_images(combined, str(browse), "combined")
    names = sorted(os.path.basename(p) for p in written)
    assert names == ["combined_browse_201811.png",
                     "combined_browse_201812.png",
                     "combined_browse_201901.png",
                     "combined_browse_seasonal_cycle.png"]
    for p in written:
        assert os.path.getsize(p) > 1000
