"""Multi-process (share-nothing) execution: strided expert partitioning,
per-rank stores, and the merge step — two subprocess ranks must reproduce the
single-process sweep exactly (reference semantics: independent SLURM array
jobs, submit_gpsat.sh:1-33, made in-process)."""

import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from gpsat_tpu.parallel.multihost import (merge_result_stores,
                                          partition_experts, process_info,
                                          rank_store_path, rank_store_paths)

KM = 1000.0

RUNNER = r"""
import sys
import numpy as np
import pandas as pd
import jax
jax.config.update("jax_platforms", "cpu")
from gpsat_tpu.local_experts import LocalExpertOI
from gpsat_tpu.utils import grid_2d_flatten

KM = 1000.0
csv_path, store_path = sys.argv[1], sys.argv[2]
bin_df = pd.read_csv(csv_path)

eloc = pd.DataFrame(grid_2d_flatten([-300 * KM, 300 * KM],
                                    [-300 * KM, 300 * KM],
                                    step_size=300 * KM), columns=["x", "y"])
eloc["t"] = 0.0
ploc = pd.DataFrame(grid_2d_flatten([-300 * KM, 300 * KM],
                                    [-300 * KM, 300 * KM],
                                    step_size=100 * KM), columns=["x", "y"])

locexp = LocalExpertOI(
    expert_loc_config={"source": eloc},
    data_config={
        "data_source": bin_df, "obs_col": "z", "coords_col": ["x", "y", "t"],
        "local_select": [{"col": "t", "comp": "<=", "val": 4},
                         {"col": "t", "comp": ">=", "val": -4},
                         {"col": ["x", "y"], "comp": "<", "val": 220 * KM}]},
    model_config={
        "oi_model": "GPRModel",
        "init_params": {"coords_scale": [50 * KM, 50 * KM, 1]},
        "constraints": {"likelihood_variance": {"low": 1e-4, "high": 0.05}}},
    pred_loc_config={"method": "from_dataframe", "df": ploc,
                     "max_dist": 200 * KM})
locexp.run(store_path=store_path, optimise=True,
           check_config_compatible=False, verbose=False)
"""


def test_partition_covers_disjoint():
    df = pd.DataFrame({"x": np.arange(11)})
    parts = [partition_experts(df, r, 3) for r in range(3)]
    got = pd.concat(parts).sort_values("x")["x"].to_numpy()
    np.testing.assert_array_equal(got, np.arange(11))
    assert {len(p) for p in parts} == {4, 4, 3}
    assert partition_experts(df, 0, 1) is df


def test_rank_store_path():
    assert rank_store_path("a/b.h5", 0, 1) == "a/b.h5"
    assert rank_store_path("a/b.h5", 2, 8) == "a/b.r002of008.h5"
    assert rank_store_paths("b.h5", 2) == ["b.r000of002.h5",
                                           "b.r001of002.h5"]


def test_process_info_env(monkeypatch):
    monkeypatch.setenv("GPSAT_PROCESS_ID", "3")
    monkeypatch.setenv("GPSAT_NUM_PROCESSES", "5")
    assert process_info() == (3, 5)
    monkeypatch.delenv("GPSAT_PROCESS_ID")
    monkeypatch.delenv("GPSAT_NUM_PROCESSES")
    monkeypatch.setenv("SLURM_PROCID", "1")
    monkeypatch.setenv("SLURM_NTASKS", "4")
    assert process_info() == (1, 4)


def test_two_process_matches_single(tmp_path):
    """Two subprocess ranks + merge == one single-process run, exactly."""
    from gpsat_tpu.dataprepper import DataPrep
    from gpsat_tpu.local_experts import get_results_from_h5file

    rng = np.random.default_rng(7)
    n = 1500
    x = rng.uniform(-400 * KM, 400 * KM, n)
    y = rng.uniform(-400 * KM, 400 * KM, n)
    z = (0.3 * np.sin(x / (150 * KM)) + 0.2 * np.cos(y / (200 * KM))
         + 0.05 * rng.standard_normal(n))
    df = pd.DataFrame({"x": x, "y": y, "z": z, "t": 0.0})
    bin_ds = DataPrep.bin_data_by(df=df, by_cols=["t"], val_col="z",
                                  x_range=[-400 * KM, 400 * KM],
                                  y_range=[-400 * KM, 400 * KM],
                                  grid_res=50 * KM)
    csv_path = str(tmp_path / "obs.csv")
    bin_ds.to_dataframe().dropna().reset_index().to_csv(csv_path, index=False)

    runner = str(tmp_path / "runner.py")
    with open(runner, "w") as f:
        f.write(RUNNER)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def env_for(rank=None, world=None):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = repo
        env.pop("GPSAT_PROCESS_ID", None)
        env.pop("GPSAT_NUM_PROCESSES", None)
        if world is not None:
            env["GPSAT_PROCESS_ID"] = str(rank)
            env["GPSAT_NUM_PROCESSES"] = str(world)
        return env

    single = str(tmp_path / "single.h5")
    subprocess.run([sys.executable, runner, csv_path, single],
                   check=True, env=env_for(), timeout=900)

    multi = str(tmp_path / "multi.h5")
    procs = [subprocess.Popen([sys.executable, runner, csv_path, multi],
                              env=env_for(r, 2)) for r in range(2)]
    for p in procs:
        assert p.wait(timeout=900) == 0
    parts = rank_store_paths(multi, 2)
    assert all(os.path.exists(p) for p in parts)
    merge_result_stores(parts, multi)

    dfs_s, _ = get_results_from_h5file(single)
    dfs_m, _ = get_results_from_h5file(multi)
    assert set(dfs_s) == set(dfs_m)
    for t in ["preds", "run_details", "lengthscales", "expert_locs"]:
        # sort_index alone is not a unique order (many pred rows per
        # expert): sort by every coordinate-ish column
        def canon(df):
            df = df.reset_index()
            num = df.select_dtypes(include=[np.number])
            # positional reset_index artifacts, wall times and optimiser
            # iteration counts are not comparable across runs (iteration
            # counts are composition-dependent: batch width changes XLA
            # vectorisation, whose ulp-level f64 differences flip
            # near-threshold Armijo accepts without moving the optimum)
            num = num.drop(columns=[c for c in num.columns
                                    if "time" in c or c == "index"
                                    or c == "optimise_iterations"
                                    or str(c).startswith("level_")])
            return num.sort_values(list(num.columns)).to_numpy()

        a, b = canon(dfs_s[t]), canon(dfs_m[t])
        assert a.shape == b.shape, t
        # different batch shapes (9 vs 4/5 experts) change the f64
        # reduction order inside XLA matmuls; L-BFGS stopping amplifies
        # that to ~1e-4 relative on optimised quantities — the partition/
        # merge semantics (rows, coords, convergence) are what's exact
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-4,
                                   err_msg=t, equal_nan=True)
