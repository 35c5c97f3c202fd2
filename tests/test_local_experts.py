"""End-to-end tests of the batched LocalExpertOI sweep on synthetic data —
the inline-example flow (reference: examples/inline_example.py) minus plotting,
plus a batched-vs-single-model consistency oracle the reference never had.
"""

import numpy as np
import pandas as pd
import pytest

from gpsat_tpu.dataprepper import DataPrep
from gpsat_tpu.local_experts import LocalExpertOI, get_results_from_h5file
from gpsat_tpu.models.exact_gpr import GPRModel
from gpsat_tpu.dataloader import DataLoader
from gpsat_tpu.parallel.scheduler import make_buckets, bucket_level
from gpsat_tpu.store import ResultsStore
from gpsat_tpu.utils import grid_2d_flatten, get_weighted_values


KM = 1000.0


def truth_field(x, y):
    """Smooth 'sea-surface' field over a +-500 km domain."""
    return (0.3 * np.sin(x / (150 * KM)) + 0.2 * np.cos(y / (200 * KM))
            + 0.1 * np.sin((x + y) / (300 * KM)))


@pytest.fixture(scope="module")
def synthetic_setup(tmp_path_factory):
    rng = np.random.default_rng(7)
    n = 3000
    x = rng.uniform(-500 * KM, 500 * KM, n)
    y = rng.uniform(-500 * KM, 500 * KM, n)
    z = truth_field(x, y) + 0.05 * rng.standard_normal(n)
    df = pd.DataFrame({"x": x, "y": y, "z": z, "t": 0.0})

    bin_ds = DataPrep.bin_data_by(df=df, by_cols=["t"], val_col="z",
                                  x_range=[-500 * KM, 500 * KM],
                                  y_range=[-500 * KM, 500 * KM],
                                  grid_res=25 * KM)
    bin_df = bin_ds.to_dataframe().dropna().reset_index()

    eloc = pd.DataFrame(grid_2d_flatten([-400 * KM, 400 * KM],
                                        [-400 * KM, 400 * KM],
                                        step_size=400 * KM), columns=["x", "y"])
    eloc["t"] = 0.0

    ploc = pd.DataFrame(grid_2d_flatten([-400 * KM, 400 * KM],
                                        [-400 * KM, 400 * KM],
                                        step_size=50 * KM), columns=["x", "y"])

    data_config = {
        "data_source": bin_df,
        "obs_col": "z",
        "coords_col": ["x", "y", "t"],
        "local_select": [
            {"col": "t", "comp": "<=", "val": 4},
            {"col": "t", "comp": ">=", "val": -4},
            {"col": ["x", "y"], "comp": "<", "val": 220 * KM},
        ],
    }
    model_config = {
        "oi_model": "GPRModel",
        "init_params": {"coords_scale": [50 * KM, 50 * KM, 1]},
        "constraints": {
            "lengthscales": {"low": [1e-08, 1e-08, 1e-08],
                             "high": [600 * KM, 600 * KM, 9]},
            "likelihood_variance": {"low": 1e-4, "high": 0.05},
        },
    }
    pred_loc_config = {"method": "from_dataframe", "df": ploc,
                       "max_dist": 200 * KM}

    store_path = str(tmp_path_factory.mktemp("results") / "inline.h5")
    locexp = LocalExpertOI(expert_loc_config={"source": eloc},
                           data_config=data_config,
                           model_config=model_config,
                           pred_loc_config=pred_loc_config)
    locexp.run(store_path=store_path, optimise=True,
               check_config_compatible=False, verbose=False)
    return dict(store_path=store_path, bin_df=bin_df, eloc=eloc, ploc=ploc,
                data_config=data_config, model_config=model_config,
                pred_loc_config=pred_loc_config)


def test_store_schema(synthetic_setup):
    dfs, oi_config = get_results_from_h5file(synthetic_setup["store_path"])
    for t in ["preds", "run_details", "expert_locs", "lengthscales",
              "kernel_variance", "likelihood_variance"]:
        assert t in dfs, f"missing table: {t} (have: {list(dfs)})"
    assert len(oi_config) >= 1
    assert oi_config[0]["data"]["coords_col"] == ["x", "y", "t"]

    rd = dfs["run_details"]
    assert len(rd) == len(synthetic_setup["eloc"])
    assert (rd["num_obs"] >= 3).all()
    assert rd["optimise_success"].all()
    assert {"x", "y", "t", "config_id", "model", "device"} <= set(rd.columns)

    preds = dfs["preds"]
    for c in ["f*", "f*_var", "y_var", "f_bar", "pred_loc_x", "pred_loc_y",
              "pred_loc_t", "_dim_0"]:
        assert c in preds.columns
    assert (preds["f*_var"] >= 0).all()
    assert (preds["y_var"] >= preds["f*_var"]).all()

    ls = dfs["lengthscales"]
    assert set(ls["_dim_0"]) == {0, 1, 2}
    # constraints respected (scaled-space bounds: raw-space check)
    raw_ls = ls.loc[ls["_dim_0"] == 0, "lengthscales"] * 50 * KM
    assert (raw_ls <= 600 * KM + 1).all()


def test_predictions_match_truth(synthetic_setup):
    dfs, _ = get_results_from_h5file(synthetic_setup["store_path"])
    merged = get_weighted_values(df=dfs["preds"],
                                 ref_col=["pred_loc_x", "pred_loc_y"],
                                 dist_to_col=["x", "y"],
                                 val_cols=["f*", "f*_var"],
                                 lengthscale=100 * KM)
    truth = truth_field(merged["pred_loc_x"].values, merged["pred_loc_y"].values)
    rmse = np.sqrt(np.mean((merged["f*"].values - truth) ** 2))
    # binned-noise floor ~0.05/sqrt(per-cell count); the GP should get close
    assert rmse < 0.06, f"prediction rmse too high: {rmse}"


def test_batched_matches_single_expert_model(synthetic_setup):
    """The batched scheduler must reproduce the single-model path per expert."""
    dfs, _ = get_results_from_h5file(synthetic_setup["store_path"],
                                     merge_on_expert_locations=False)
    rd = dfs["run_details"]
    # pick the first expert
    ex = rd.iloc[0]
    eloc = {"x": ex["x"], "y": ex["y"], "t": ex["t"]}

    bin_df = synthetic_setup["bin_df"]
    df_local = DataLoader.local_data_select(
        bin_df, reference_location=eloc,
        local_select=synthetic_setup["data_config"]["local_select"],
        verbose=False)
    assert len(df_local) == ex["num_obs"]

    m = GPRModel(data=df_local, coords_col=["x", "y", "t"], obs_col="z",
                 coords_scale=[50 * KM, 50 * KM, 1])
    constraints = synthetic_setup["model_config"]["constraints"]
    constraints = {k: dict(v) for k, v in constraints.items()}
    constraints["lengthscales"]["scale"] = True
    m.set_parameter_constraints(constraints, move_within_tol=True, tol=1e-2)
    m.optimise_parameters()

    # objective agreement within optimiser tolerance
    assert np.isclose(m.get_objective_function_value(), ex["objective_value"],
                      rtol=1e-4, atol=1e-3), \
        (m.get_objective_function_value(), ex["objective_value"])

    ls_tab = dfs["lengthscales"]
    got_ls = ls_tab.loc[(ls_tab["x"] == ex["x"]) & (ls_tab["y"] == ex["y"]),
                        "lengthscales"].values
    np.testing.assert_allclose(got_ls, m.get_lengthscales(), rtol=5e-2,
                               atol=1e-3)


def test_resume_skips_completed(synthetic_setup, capsys):
    locexp = LocalExpertOI(
        expert_loc_config={"source": synthetic_setup["eloc"]},
        data_config=synthetic_setup["data_config"],
        model_config=synthetic_setup["model_config"],
        pred_loc_config=synthetic_setup["pred_loc_config"])
    # re-run against the same store: all experts already done
    locexp.run(store_path=synthetic_setup["store_path"], optimise=True,
               check_config_compatible=False, verbose=False)
    dfs, _ = get_results_from_h5file(synthetic_setup["store_path"])
    assert len(dfs["run_details"]) == len(synthetic_setup["eloc"])


def test_load_params_repredict(synthetic_setup, tmp_path):
    """optimise=False + load_params reproduces the smoothed-rerun flow
    (reference: GPSat/local_experts.py:1075-1101)."""
    store_path = synthetic_setup["store_path"]
    model_config = dict(synthetic_setup["model_config"])
    model_config["load_params"] = {"file": store_path, "table_suffix": ""}
    locexp = LocalExpertOI(
        expert_loc_config={"source": synthetic_setup["eloc"]},
        data_config=synthetic_setup["data_config"],
        model_config=model_config,
        pred_loc_config=synthetic_setup["pred_loc_config"])
    locexp.run(store_path=store_path, optimise=False, predict=True,
               table_suffix="_RELOAD", check_config_compatible=False,
               verbose=False)
    dfs, _ = get_results_from_h5file(store_path)
    assert "preds_RELOAD" in dfs
    # same parameters -> same predictions as the original run
    a = dfs["preds"].sort_values(["x", "y", "_dim_0"]).reset_index(drop=True)
    b = dfs["preds_RELOAD"].sort_values(["x", "y", "_dim_0"]).reset_index(drop=True)
    np.testing.assert_allclose(a["f*"].values, b["f*"].values, atol=1e-8)
    np.testing.assert_allclose(a["f*_var"].values, b["f*_var"].values, atol=1e-8)


def test_smoothing_round_trip(synthetic_setup):
    """Smooth hyperparameters -> re-predict with table_suffix _SMOOTHED
    (reference flow: examples/inline_example.py:437-499)."""
    from gpsat_tpu.postprocessing import smooth_hyperparameters
    import json, os

    store_path = synthetic_setup["store_path"]
    KM = 1000.0
    cfg_file = smooth_hyperparameters(
        result_file=store_path,
        output_file=store_path,
        params_to_smooth=["lengthscales", "kernel_variance",
                          "likelihood_variance"],
        smooth_config_dict={
            "lengthscales": {"l_x": 200 * KM, "l_y": 200 * KM},
            "kernel_variance": {"l_x": 200 * KM, "l_y": 200 * KM, "max": 0.5},
            "likelihood_variance": {"l_x": 200 * KM, "l_y": 200 * KM,
                                    "max": 0.3},
        },
        table_suffix="_SMOOTHED", save_config_file=True)
    assert os.path.exists(cfg_file)
    with open(cfg_file) as f:
        follow_cfg = json.load(f)
    assert follow_cfg[-1]["run_kwargs"]["optimise"] is False

    # re-run with smoothed params
    model_config = dict(synthetic_setup["model_config"])
    model_config["load_params"] = {"file": store_path,
                                   "table_suffix": "_SMOOTHED"}
    locexp = LocalExpertOI(
        expert_loc_config={"source": synthetic_setup["eloc"]},
        data_config=synthetic_setup["data_config"],
        model_config=model_config,
        pred_loc_config=synthetic_setup["pred_loc_config"])
    locexp.run(store_path=store_path, optimise=False, predict=True,
               table_suffix="_SMOOTHED", check_config_compatible=False,
               verbose=False)

    dfs, _ = get_results_from_h5file(store_path)
    for t in ["lengthscales_SMOOTHED", "preds_SMOOTHED",
              "run_details_SMOOTHED"]:
        assert t in dfs, f"missing {t} in {list(dfs)}"
    # smoothed kernel variance respects the max clamp
    assert (dfs["kernel_variance_SMOOTHED"]["kernel_variance"] <= 0.5).all()
    # smoothed predictions still track the truth
    merged = get_weighted_values(df=dfs["preds_SMOOTHED"],
                                 ref_col=["pred_loc_x", "pred_loc_y"],
                                 dist_to_col=["x", "y"],
                                 val_cols=["f*"], lengthscale=100 * KM)
    truth = truth_field(merged["pred_loc_x"].values,
                        merged["pred_loc_y"].values)
    rmse = np.sqrt(np.mean((merged["f*"].values - truth) ** 2))
    assert rmse < 0.08, f"smoothed prediction rmse too high: {rmse}"


def test_min_obs_skip_recorded(tmp_path):
    """Experts with too few observations get a run_details row with NaN."""
    rng = np.random.default_rng(0)
    df = pd.DataFrame({"x": rng.uniform(-10, 10, 50),
                       "y": rng.uniform(-10, 10, 50),
                       "z": rng.standard_normal(50), "t": 0.0})
    eloc = pd.DataFrame({"x": [0.0, 1000.0], "y": [0.0, 1000.0], "t": 0.0})
    locexp = LocalExpertOI(
        expert_loc_config={"source": eloc},
        data_config={"data_source": df, "obs_col": "z",
                     "coords_col": ["x", "y", "t"],
                     "local_select": [{"col": ["x", "y"], "comp": "<", "val": 50}]},
        model_config={"oi_model": "GPRModel"},
        pred_loc_config={"method": "expert_loc"})
    store = str(tmp_path / "s.h5")
    locexp.run(store_path=store, optimise=True, check_config_compatible=False,
               verbose=False)
    dfs, _ = get_results_from_h5file(store)
    rd = dfs["run_details"].set_index("x")
    assert rd.loc[0.0, "num_obs"] == 50
    assert rd.loc[1000.0, "num_obs"] == 0
    assert not rd.loc[1000.0, "optimise_success"]
    assert np.isnan(rd.loc[1000.0, "objective_value"])


def test_default_pred_loc_is_expert_loc(tmp_path):
    """No pred_loc config → predict at the expert location, matching the
    reference default (GPSat/local_experts.py:254-260 via _none_to_dict_check
    → PredictionLocations(method='expert_loc'))."""
    rng = np.random.default_rng(1)
    df = pd.DataFrame({"x": rng.uniform(-10, 10, 60),
                       "y": rng.uniform(-10, 10, 60),
                       "z": rng.standard_normal(60), "t": 0.0})
    eloc = pd.DataFrame({"x": [0.0, 5.0], "y": [0.0, -5.0], "t": 0.0})
    locexp = LocalExpertOI(
        expert_loc_config={"source": eloc},
        data_config={"data_source": df, "obs_col": "z",
                     "coords_col": ["x", "y", "t"],
                     "local_select": [{"col": ["x", "y"], "comp": "<", "val": 50}]},
        model_config={"oi_model": "GPRModel"})
    store = str(tmp_path / "s.h5")
    locexp.run(store_path=store, optimise=True, check_config_compatible=False,
               verbose=False)
    dfs, _ = get_results_from_h5file(store)
    preds = dfs["preds"]
    assert len(preds) == 2, "one prediction per expert at the expert location"
    merged = preds.set_index("x")
    for _, r in eloc.iterrows():
        assert np.isclose(merged.loc[r["x"], "pred_loc_x"], r["x"])
        assert np.isclose(merged.loc[r["x"], "pred_loc_y"], r["y"])
    assert dfs["run_details"]["optimise_success"].all()


def test_zero_pred_loc_recorded(tmp_path):
    """Experts whose radius-culled prediction set is empty still get a
    run_details row so resume does not re-attempt them (the reference
    'continue's with a TODO — GPSat/local_experts.py:962-965)."""
    rng = np.random.default_rng(2)
    df = pd.DataFrame({"x": rng.uniform(-10, 10, 60),
                       "y": rng.uniform(-10, 10, 60),
                       "z": rng.standard_normal(60), "t": 0.0})
    eloc = pd.DataFrame({"x": [0.0, 8.0], "y": [0.0, 8.0], "t": 0.0})
    # prediction grid only near the first expert
    ploc = pd.DataFrame({"x": [0.0, 1.0], "y": [0.0, 1.0]})
    locexp = LocalExpertOI(
        expert_loc_config={"source": eloc},
        data_config={"data_source": df, "obs_col": "z",
                     "coords_col": ["x", "y", "t"],
                     "local_select": [{"col": ["x", "y"], "comp": "<", "val": 50}]},
        model_config={"oi_model": "GPRModel"},
        pred_loc_config={"method": "from_dataframe", "df": ploc,
                         "max_dist": 3.0})
    store = str(tmp_path / "s.h5")
    locexp.run(store_path=store, optimise=True, check_config_compatible=False,
               verbose=False)
    dfs, _ = get_results_from_h5file(store)
    rd = dfs["run_details"].set_index("x")
    assert len(rd) == 2, "zero-pred expert must appear in run_details"
    assert np.isnan(rd.loc[8.0, "objective_value"])
    # resume: nothing left to run
    locexp2 = LocalExpertOI(
        expert_loc_config={"source": eloc},
        data_config={"data_source": df, "obs_col": "z",
                     "coords_col": ["x", "y", "t"],
                     "local_select": [{"col": ["x", "y"], "comp": "<", "val": 50}]},
        model_config={"oi_model": "GPRModel"},
        pred_loc_config={"method": "from_dataframe", "df": ploc,
                         "max_dist": 3.0})
    locexp2.run(store_path=store, optimise=True,
                check_config_compatible=False, verbose=False)
    dfs2, _ = get_results_from_h5file(store)
    assert len(dfs2["run_details"]) == 2, "resume must not re-run skipped experts"


# ---------------------------------------------------------------------------
# scheduler unit tests
# ---------------------------------------------------------------------------

def test_bucket_level():
    assert bucket_level(3) == 8
    assert bucket_level(8) == 8
    assert bucket_level(9) == 16
    assert bucket_level(100000) == 131072


def test_make_buckets_grouping():
    n_obs = np.array([5, 7, 100, 120, 600])
    n_pred = np.array([10, 10, 50, 50, 0])
    buckets = make_buckets(n_obs, n_pred)
    covered = np.concatenate([b["indices"] for b in buckets])
    assert sorted(covered.tolist()) == [0, 1, 2, 3, 4]
    for b in buckets:
        assert (n_obs[b["indices"]] <= b["n_max"]).all()
        assert b["batch_pad"] >= len(b["indices"])


def test_make_buckets_multiple_of():
    buckets = make_buckets(np.full(10, 20), np.zeros(10, int), multiple_of=8)
    for b in buckets:
        assert b["batch_pad"] % 8 == 0


def test_fuse_secondary_obs():
    """SMAP-style fusion mechanics (reference: IS2_SMAP_GPSat_train.py
    232-251, 1441-1515): range filter, coarsen, day filter, source labels."""
    import pandas as pd
    from examples.sea_ice_freeboard_driver import fuse_secondary_obs
    prim = pd.DataFrame({"x": [0.0, 1.0], "y": [0.0, 1.0],
                         "t": [0.0, 0.0], "z": [1.0, 2.0]})
    sec = pd.DataFrame({"x": np.arange(8.0), "y": np.zeros(8),
                        "t": [0.0] * 4 + [1.0] * 4,
                        "z": [0.1, 0.4, 0.9, -0.2, 0.2, 0.3, 0.45, 0.05]})
    out = fuse_secondary_obs(prim, sec, value_range=(0.0, 0.5))
    assert (out["source"] == "secondary").sum() == 6      # 0.9, -0.2 dropped
    assert (out["source"] == "primary").sum() == 2
    out2 = fuse_secondary_obs(prim, sec, value_range=(0.0, 0.5), day_only=0.0)
    assert (out2["source"] == "secondary").sum() == 2     # t==0 and in range
    out3 = fuse_secondary_obs(prim, sec, value_range=(-1.0, 1.0),
                              coarsen_factor=2)
    assert (out3["source"] == "secondary").sum() == 4
    out4 = fuse_secondary_obs(prim, sec, value_range=(-1.0, 1.0),
                              exclude_fn=lambda d: d["x"] > 3)
    assert (out4["source"] == "secondary").sum() == 4
