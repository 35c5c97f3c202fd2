"""Production-style sea-ice driver: SGPR experts + ice-edge anchoring +
optional secondary-instrument fusion.

A compact equivalent of the akpetty fork's production flows
(reference: IS2_GPSat_train.py — read along-track + sea-ice-concentration
data, build an expert grid, anchor the field at the ice edge by injecting
zero-value pseudo-observations where SIC < sic_cutoff
(reference: extra_funcs.py:149-195, concat at IS2_GPSat_train.py:782-786),
run SGPR OI, smooth hyperparameters, re-predict, merge, export) and
(reference: IS2_SMAP_GPSat_train.py — fuse a second instrument's gridded
thin-ice thickness into the training set: value-range filter, coarsen,
region exclusion, concat with a source label; load_smap_data_for_date at
142-350, concat at 1441-1515).

Runs on synthetic data so it is self-contained:
  python -m examples.sea_ice_freeboard_driver [--num-experts N] [--sic]
      [--plus-secondary] [--secondary-csv FILE]
"""

import argparse
import os

import numpy as np
import pandas as pd

from gpsat_tpu import get_parent_path
from gpsat_tpu.dataprepper import DataPrep
from gpsat_tpu.local_experts import LocalExpertOI, get_results_from_h5file
from gpsat_tpu.postprocessing import smooth_hyperparameters
from gpsat_tpu.utils import cprint, grid_2d_flatten, get_weighted_values

KM = 1000.0


def synth_sea_ice(n=6000, seed=0, domain=1200 * KM):
    """Synthetic 'thickness' field that tapers to zero at the ice edge, plus a
    radially-varying 'sea-ice concentration'."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(-domain, domain, n)
    y = rng.uniform(-domain, domain, n)
    r = np.hypot(x, y)
    ice_edge = 900 * KM
    sic = np.clip(1.4 - r / ice_edge, 0, 1)           # 1 at pole, 0 outside edge
    thickness = np.maximum(2.0 * (1 - (r / ice_edge) ** 2), 0.0) \
        + 0.3 * np.sin(x / (250 * KM)) * (sic > 0.15)
    obs = thickness + 0.1 * rng.standard_normal(n)
    df = pd.DataFrame({"x": x, "y": y, "t": 0.0, "z": obs, "sic": sic})
    return df


def add_sic_pseudo_obs(bin_df, sic_cutoff=0.15, spacing=100 * KM,
                       domain=1200 * KM):
    """Zero-thickness pseudo-observations where SIC < cutoff — anchors the GP
    at the ice edge (reference: extra_funcs.py:149-195)."""
    grid = grid_2d_flatten([-domain, domain], [-domain, domain],
                           step_size=spacing)
    r = np.hypot(grid[:, 0], grid[:, 1])
    sic = np.clip(1.4 - r / (900 * KM), 0, 1)
    open_water = sic < sic_cutoff
    pseudo = pd.DataFrame({"x": grid[open_water, 0],
                           "y": grid[open_water, 1],
                           "t": 0.0, "z": 0.0})
    cprint(f"adding {len(pseudo)} zero-thickness pseudo-observations "
           f"(SIC < {sic_cutoff})", "OKCYAN")
    return pd.concat([bin_df, pseudo], axis=0).reset_index(drop=True)


def synth_secondary_instrument(n_side=40, seed=1, domain=1200 * KM,
                               noise=0.12):
    """Synthetic coarse passive-microwave product: gridded thin-ice thickness,
    only valid where the field is thin (the stand-in for SMAP/SMOS thickness,
    which saturates above ~0.5 m — reference: IS2_SMAP_GPSat_train.py:232)."""
    rng = np.random.default_rng(seed)
    ax = np.linspace(-domain, domain, n_side)
    gx, gy = np.meshgrid(ax, ax)
    x, y = gx.ravel(), gy.ravel()
    r = np.hypot(x, y)
    sic = np.clip(1.4 - r / (900 * KM), 0, 1)
    thickness = np.maximum(2.0 * (1 - (r / (900 * KM)) ** 2), 0.0) \
        + 0.3 * np.sin(x / (250 * KM)) * (sic > 0.15)
    obs = thickness + noise * rng.standard_normal(len(x))
    return pd.DataFrame({"x": x, "y": y, "t": 0.0, "z": obs})


def fuse_secondary_obs(primary_df, secondary_df, value_range=(0.0, 0.5),
                       coarsen_factor=1, day_only=None, exclude_fn=None):
    """Merge a secondary instrument's observations into the training set
    (reference mechanics: IS2_SMAP_GPSat_train.py — thickness-range filter at
    232-242, coarsening at 245-251, region exclusion at 312-319, prediction-
    day-only filter at 405-413, concat with the along-track data at
    1441-1515). Returns the combined DataFrame with a 'source' label."""
    sec = secondary_df.copy()
    lo, hi = value_range
    sec = sec[(sec["z"] >= lo) & (sec["z"] <= hi)]
    if coarsen_factor and coarsen_factor > 1:
        sec = sec.iloc[::coarsen_factor]
    if day_only is not None:
        sec = sec[sec["t"] == day_only]
    if exclude_fn is not None:
        sec = sec[~exclude_fn(sec)]
    sec = sec.dropna(subset=["z"]).reset_index(drop=True)
    cprint(f"fusing {len(sec)} secondary-instrument obs "
           f"(value range [{lo}, {hi}], coarsen {coarsen_factor})", "OKCYAN")
    out = pd.concat([primary_df.assign(source="primary"),
                     sec.assign(source="secondary")],
                    axis=0, ignore_index=True)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-experts", type=int, default=None,
                    help="cap the expert count (smoke runs)")
    ap.add_argument("--sic", action="store_true", default=True,
                    help="inject SIC ice-edge pseudo observations")
    ap.add_argument("--no-sic", dest="sic", action="store_false")
    ap.add_argument("--plus-secondary", action="store_true",
                    help="fuse a secondary instrument (SMAP-style thin-ice "
                         "thickness) into the training set")
    ap.add_argument("--secondary-csv", default=None,
                    help="CSV with x,y,t,z columns for the secondary "
                         "instrument (synthetic if omitted)")
    ap.add_argument("--secondary-smap-dir", default=None,
                    help="SMAP cache dir: load the real Bremen mix product "
                         "for --secondary-smap-date via satdata."
                         "load_smap_data_for_date as the secondary source")
    ap.add_argument("--secondary-smap-date", default=None,
                    help="YYYY-MM-DD day to load from --secondary-smap-dir")
    ap.add_argument("--secondary-range", type=float, nargs=2,
                    default=(0.0, 0.5),
                    help="valid value range for secondary obs")
    ap.add_argument("--secondary-coarsen", type=int, default=1)
    ap.add_argument("--secondary-day-only", action="store_true",
                    help="only fuse secondary obs at the target day (t==0)")
    ap.add_argument("--expert-spacing", type=float, default=400 * KM)
    ap.add_argument("--store", default=None)
    args = ap.parse_args(argv)

    df = synth_sea_ice()
    bin_df = DataPrep.bin_data_by(
        df=df, by_cols=["t"], val_col="z", grid_res=50 * KM,
        x_range=[-1200 * KM, 1200 * KM],
        y_range=[-1200 * KM, 1200 * KM]).to_dataframe().dropna().reset_index()
    if args.sic:
        bin_df = add_sic_pseudo_obs(bin_df)
    if args.plus_secondary:
        if args.secondary_smap_dir:
            from gpsat_tpu.satdata import load_smap_data_for_date
            assert args.secondary_smap_date, \
                "--secondary-smap-dir needs --secondary-smap-date"
            lo, hi = args.secondary_range
            smap = load_smap_data_for_date(
                args.secondary_smap_date, args.secondary_smap_dir,
                thickness_min=lo, thickness_max=hi,
                coarsen_factor=max(1, args.secondary_coarsen))
            # SMAP rows are day-resolved; the synthetic domain's t axis is
            # days relative to the target day
            sec = pd.DataFrame({"x": smap["x"], "y": smap["y"], "t": 0.0,
                                "z": smap["ice_thickness"]})
            # the loader already applied grid-aware 2-d coarsening — the
            # row-stride coarsening in fuse_secondary_obs must not re-apply
            fuse_coarsen = 1
        elif args.secondary_csv:
            sec = pd.read_csv(args.secondary_csv)
            fuse_coarsen = args.secondary_coarsen
        else:
            sec = synth_secondary_instrument()
            fuse_coarsen = args.secondary_coarsen
        bin_df = fuse_secondary_obs(
            bin_df, sec, value_range=tuple(args.secondary_range),
            coarsen_factor=fuse_coarsen,
            day_only=0.0 if args.secondary_day_only else None)

    eloc = pd.DataFrame(grid_2d_flatten([-1000 * KM, 1000 * KM],
                                        [-1000 * KM, 1000 * KM],
                                        step_size=args.expert_spacing),
                        columns=["x", "y"])
    eloc["t"] = 0.0
    if args.num_experts:
        eloc = eloc.head(args.num_experts)
    ploc = pd.DataFrame(grid_2d_flatten([-1000 * KM, 1000 * KM],
                                        [-1000 * KM, 1000 * KM],
                                        step_size=50 * KM),
                        columns=["x", "y"])

    # SGPR configuration mirroring the production driver's choices
    # (reference: IS2_GPSat_train.py:341-364,793-868)
    model_config = {
        "oi_model": "SGPRModel",
        "init_params": {"coords_scale": [50 * KM, 50 * KM, 1],
                        "num_inducing_points": 300},
        "constraints": {
            "lengthscales": {"low": [10 * KM, 10 * KM, 0.5],
                             "high": [1000 * KM, 1000 * KM, 50]},
            "likelihood_variance": {"low": 1e-4, "high": 0.5}},
    }
    store_path = args.store or get_parent_path("results", "sea_ice_driver.h5")
    if os.path.exists(store_path):
        os.remove(store_path)

    locexp = LocalExpertOI(
        expert_loc_config={"source": eloc},
        data_config={"data_source": bin_df, "obs_col": "z",
                     "coords_col": ["x", "y", "t"],
                     "local_select": [
                         {"col": "t", "comp": "<=", "val": 4},
                         {"col": "t", "comp": ">=", "val": -4},
                         {"col": ["x", "y"], "comp": "<", "val": 600 * KM}]},
        model_config=model_config,
        pred_loc_config={"method": "from_dataframe", "df": ploc,
                         "max_dist": 400 * KM})
    locexp.run(store_path=store_path, optimise=True,
               check_config_compatible=False)

    smooth_hyperparameters(
        result_file=store_path, output_file=store_path,
        params_to_smooth=["lengthscales", "kernel_variance",
                          "likelihood_variance"],
        smooth_config_dict={
            "lengthscales": {"l_x": 400 * KM, "l_y": 400 * KM},
            "kernel_variance": {"l_x": 400 * KM, "l_y": 400 * KM, "max": 4.0},
            "likelihood_variance": {"l_x": 400 * KM, "l_y": 400 * KM,
                                    "max": 0.5}},
        table_suffix="_SMOOTHED", save_config_file=False)

    model_config_load = dict(model_config)
    model_config_load["load_params"] = {"file": store_path,
                                        "table_suffix": "_SMOOTHED"}
    locexp2 = LocalExpertOI(
        expert_loc_config={"source": eloc},
        data_config=locexp.config["data"] | {"data_source": bin_df},
        model_config=model_config_load,
        pred_loc_config={"method": "from_dataframe", "df": ploc,
                         "max_dist": 400 * KM})
    locexp2.run(store_path=store_path, optimise=False, predict=True,
                table_suffix="_SMOOTHED", check_config_compatible=False)

    dfs, _ = get_results_from_h5file(store_path)
    merged = get_weighted_values(dfs["preds_SMOOTHED"],
                                 ref_col=["pred_loc_x", "pred_loc_y"],
                                 dist_to_col=["x", "y"],
                                 val_cols=["f*", "f*_var"],
                                 lengthscale=200 * KM)
    # export the merged field (the reference exports NetCDF; CSV here)
    out_csv = store_path.replace(".h5", "_merged.csv")
    merged.to_csv(out_csv, index=False)
    cprint(f"merged field ({len(merged)} points) -> {out_csv}", "OKGREEN")

    # accuracy vs truth (thickness without noise)
    r = np.hypot(merged["pred_loc_x"], merged["pred_loc_y"])
    sic = np.clip(1.4 - r / (900 * KM), 0, 1)
    truth = np.maximum(2.0 * (1 - (r / (900 * KM)) ** 2), 0.0) \
        + 0.3 * np.sin(merged["pred_loc_x"] / (250 * KM)) * (sic > 0.15)
    fb = dfs["preds_SMOOTHED"]["f_bar"].mean()
    rmse = float(np.sqrt(np.mean((merged["f*"] + fb - truth) ** 2)))
    cprint(f"merged thickness RMSE vs truth: {rmse:.4f} m "
           f"(obs noise 0.10 m)", "OKGREEN")
    return store_path


if __name__ == "__main__":
    main()
