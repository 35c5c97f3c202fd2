# %% [markdown]
# # Worked example: optimal interpolation end to end
#
# The runnable, notebook-form version of `docs/worked_example.md`
# (reference equivalent: `notebooks/inline_example.ipynb`). Each `# %%`
# cell matches a section of the doc; run top-to-bottom with
# `python -m examples.worked_example`, or open in any py-percent-aware
# editor (VS Code / Jupytext) for cell-by-cell execution.
#
# Output: `results/worked_example.h5` (preds / smoothed preds / params /
# run details) and `results/worked_example_*.png` (merged field vs ground
# truth + hyperparameter maps), plus a truth-recovery RMSE printout.

# %%
import os

import numpy as np
import pandas as pd

from gpsat_tpu import get_data_path, get_parent_path
from gpsat_tpu.dataloader import DataLoader
from gpsat_tpu.dataprepper import DataPrep
from gpsat_tpu.local_experts import LocalExpertOI, get_results_from_h5file
from gpsat_tpu.postprocessing import smooth_hyperparameters
from gpsat_tpu.utils import (WGS84toEASE2, cprint, get_weighted_values,
                             grid_2d_flatten)

KM = 1000.0

# %% [markdown]
# ## 1. Raw data -> projected table
#
# Satellite tracks arrive as flat files of (lon, lat, datetime, value).
# Sweep them into one frame, tagging each row with its source file, then
# project to a planar EASE2 grid and a float day axis.

# %%
data_dir = get_data_path("example")
if not os.path.exists(os.path.join(data_dir, "A_RAW.csv")):
    from examples.generate_example_data import main as gen_data
    gen_data()

df = DataLoader.read_flat_files(
    file_dirs=data_dir, file_regex=r"_RAW\.csv$",
    col_funcs={"source": {
        "func": lambda fp: os.path.basename(fp).split("_")[0],
        "filename_as_arg": True}})
df["x"], df["y"] = WGS84toEASE2(df["lon"].values, df["lat"].values,
                                lat_0=90, lon_0=0)
# np.asarray, not .values: pandas may back str columns with Arrow
# arrays whose .astype rejects datetime64[D]
df["t"] = np.asarray(df["datetime"]).astype("datetime64[D]").astype(float)
cprint(f"raw rows: {len(df)}, sources: {sorted(df['source'].unique())}",
       "OKGREEN")

# %% [markdown]
# ## 2. Bin to a working resolution
#
# Binning de-noises and evens out track density: a 2-d binned mean per
# (day, source) group. (Tables that don't fit in memory stream through the
# `BinData` CLI with `batch=True` instead.)

# %%
bin_df = DataPrep.bin_data_by(
    df=df.loc[df["z"].abs() < 1], by_cols=["t", "source"], val_col="z",
    grid_res=100 * KM, x_range=[-1500 * KM, 1500 * KM],
    y_range=[-1500 * KM, 1500 * KM]).to_dataframe().dropna().reset_index()
cprint(f"binned rows: {len(bin_df)}", "OKGREEN")

# %% [markdown]
# ## 3. Expert and prediction grids
#
# Local experts sit on a coarse grid; predictions on a fine one. Each
# expert trains on observations within its local-select window and
# predicts within `max_dist` of itself.

# %%
eloc = pd.DataFrame(grid_2d_flatten([-1000 * KM, 1000 * KM],
                                    [-1000 * KM, 1000 * KM],
                                    step_size=400 * KM),
                    columns=["x", "y"])
eloc["t"] = np.floor(df["t"].mean())
ploc = pd.DataFrame(grid_2d_flatten([-1000 * KM, 1000 * KM],
                                    [-1000 * KM, 1000 * KM],
                                    step_size=50 * KM),
                    columns=["x", "y"])

# %% [markdown]
# ## 4. Configure + run the sweep
#
# The four config dicts are reference-compatible (JSON-able). With
# `coords_scale` set, lengthscale constraint bounds are given in PHYSICAL
# units. Under the hood the sweep gathers each expert's local data,
# buckets experts into padded [B, N, P] shapes, and drains them through
# one compiled batched L-BFGS pool per shape — not a Python loop.

# %%
store = get_parent_path("results", "worked_example.h5")
os.makedirs(os.path.dirname(store), exist_ok=True)
if os.path.exists(store):
    os.remove(store)

data = {"data_source": bin_df, "obs_col": "z",
        "coords_col": ["x", "y", "t"],
        "local_select": [{"col": "t", "comp": "<=", "val": 2},
                         {"col": "t", "comp": ">=", "val": -2},
                         {"col": ["x", "y"], "comp": "<", "val": 500 * KM}]}
model = {"oi_model": "GPRModel",
         "init_params": {"coords_scale": [100 * KM, 100 * KM, 1]},
         "constraints": {"lengthscales": {"low": [1e-8] * 3,
                                          "high": [600 * KM, 600 * KM, 9]},
                         "likelihood_variance": {"low": 0.00125,
                                                 "high": 0.25}}}
pred_loc = {"method": "from_dataframe", "df": ploc, "max_dist": 400 * KM}

oi = LocalExpertOI(expert_loc_config={"source": eloc}, data_config=data,
                   model_config=model, pred_loc_config=pred_loc)
oi.run(store_path=store, optimise=True)

# %% [markdown]
# ## 5. Read back, smooth, re-predict
#
# Per-expert hyperparameters are noisy; smoothing them spatially and
# re-predicting (without re-optimising) is the reference's production
# move. Re-running `oi.run` on the same store resumes via the anti-join.

# %%
smooth_hyperparameters(
    result_file=store,
    params_to_smooth=["lengthscales", "kernel_variance",
                      "likelihood_variance"],
    smooth_config_dict={"lengthscales": {"l_x": 400 * KM, "l_y": 400 * KM},
                        "kernel_variance": {"l_x": 400 * KM,
                                            "l_y": 400 * KM, "max": 0.5},
                        "likelihood_variance": {"l_x": 400 * KM,
                                                "l_y": 400 * KM,
                                                "max": 0.3}},
    table_suffix="_SMOOTHED", save_config_file=True)

model_load = {**model, "load_params": {"file": store,
                                       "table_suffix": "_SMOOTHED"}}
oi2 = LocalExpertOI(expert_loc_config={"source": eloc}, data_config=data,
                    model_config=model_load, pred_loc_config=pred_loc)
oi2.run(store_path=store, optimise=False, predict=True,
        table_suffix="_SMOOTHED")

# %% [markdown]
# ## 6. Merge overlapping predictions + score against ground truth
#
# Neighbouring experts predict the same locations; blend them with
# Gaussian distance weights centred on each expert. The synthetic data
# has a known truth field (noise sigma = 0.05) — merged recovery should
# land around RMSE ~ 0.006.

# %%
dfs, _ = get_results_from_h5file(store)
merged = get_weighted_values(
    df=dfs["preds_SMOOTHED"],
    ref_col=["pred_loc_x", "pred_loc_y", "pred_loc_t"],
    dist_to_col=["x", "y", "t"], val_cols=["f*", "f*_var"],
    weight_function="gaussian", lengthscale=200 * KM)

from examples.generate_example_data import truth_field
truth = truth_field(merged["pred_loc_x"].values, merged["pred_loc_y"].values)
rmse = float(np.sqrt(np.mean((merged["f*"].values - truth) ** 2)))
cprint(f"truth-recovery RMSE: {rmse:.4f} (raw obs noise 0.05)", "OKGREEN")

# %% [markdown]
# ## 7. Plots
#
# Merged field, truth, error, and predictive std on the prediction grid.

# %%
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

fig, axs = plt.subplots(2, 2, figsize=(11, 9))
panels = [("merged f*", merged["f*"].values),
          ("truth", truth),
          ("error (f* - truth)", merged["f*"].values - truth),
          ("predictive std", np.sqrt(np.maximum(merged["f*_var"].values,
                                                0.0)))]
for ax, (title, vals) in zip(axs.ravel(), panels):
    sc = ax.scatter(merged["pred_loc_x"] / KM, merged["pred_loc_y"] / KM,
                    c=vals, s=8, cmap="RdBu_r" if "error" in title
                    else "viridis")
    ax.set_title(title)
    ax.set_aspect("equal")
    ax.set_xlabel("x (km)")
    ax.set_ylabel("y (km)")
    fig.colorbar(sc, ax=ax, shrink=0.85)
fig.suptitle(f"worked example — merged OI field (RMSE {rmse:.4f})")
out_png = get_parent_path("results", "worked_example_field.png")
fig.tight_layout()
fig.savefig(out_png, dpi=150)
plt.close(fig)
cprint(f"saved plot to {out_png}", "OKGREEN")

try:                      # inline display in the notebook form; no-op as a script
    from IPython.display import Image, display
    display(Image(filename=out_png, width=820))
except Exception:
    pass

# %% [markdown]
# ## Where to go next
#
# - Sparse experts for big-N: `"oi_model": "SGPRModel"` with
#   `num_inducing_points` (`examples/sea_ice_freeboard_driver.py`).
# - Multi-device: pass a mesh (`gpsat_tpu.parallel.mesh.get_mesh()`).
# - Cross-validation configs: `examples/create_xval_config.py`.
# - Monthly product assembly: `examples/combine_monthly_netcdf.py`.
