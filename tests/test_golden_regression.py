"""Golden-file regression — the reference's integration-test mechanism
(reference: tests/integration.py): replay the full LocalExpertOI run from the
config stored *inside* a previously generated results file, then outer-join
new vs golden tables and assert abs-diff tolerances (1e-6 default, 1e-3 for
lengthscales).

The golden store is generated deterministically on first run (CPU float64,
fixed seeds) and committed at tests/data/golden_inline.h5; CI then replays
the stored oi_config against it.

Regenerate by DELETING the file and running this test module under pytest —
generation must happen in the same 8-device mesh environment the replay uses
(sharded vs unsharded reductions differ in the last ulp, which optimisation
amplifies to ~1e-4).

Provenance note (round-1 advisor finding): the committed golden was
regenerated when the optimiser moved to the per-slot trial loop, so this
test alone cannot certify that trajectory change. The regenerated golden
WAS revalidated against external oracles in the same change-set: scipy
L-BFGS-B parity (test_ops_gpr), the reference-produced PurePythonGPR
fixture (test_reference_golden, reference tolerances 1e-6 objective /
1e-3 lengthscales), and masked==unpadded identities — this file then
guards against *drift* from that externally-validated state.

Round-3 regenerations (both revalidated against scipy parity + the
reference-produced fixture in the same change-sets):
1. clean-accept-gated trial-scale warm start moved f64 trajectories by
   ~1.4e-6 in preds (old golden failed at tol 1e-6 by that margin);
2. the gating was then REVERTED for f64 only (eager 4x regrowth): in
   exact arithmetic gated growth pins the trial scale small and slots
   crawl through ~1.6x the accepted steps (ops/lbfgs.py body comment).
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

from gpsat_tpu.dataprepper import DataPrep
from gpsat_tpu.local_experts import LocalExpertOI, get_results_from_h5file
from gpsat_tpu.utils import grid_2d_flatten, nested_dict_literal_eval

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "golden_inline.h5")
KM = 1000.0

TOL_DEFAULT = 1e-6
TOL_BY_TABLE = {"lengthscales": 1e-3}
COMPARE_TABLES = ["preds", "run_details", "lengthscales", "kernel_variance",
                  "likelihood_variance"]
SKIP_COLS = {"run_time", "device", "model", "config_id",
             "parameters_optimised", "optimise_success"}


def _build_inputs():
    rng = np.random.default_rng(1234)
    n = 2000
    x = rng.uniform(-400 * KM, 400 * KM, n)
    y = rng.uniform(-400 * KM, 400 * KM, n)
    z = (0.3 * np.sin(x / (150 * KM)) + 0.2 * np.cos(y / (200 * KM))
         + 0.05 * rng.standard_normal(n))
    df = pd.DataFrame({"x": x, "y": y, "z": z, "t": 0.0})
    bin_df = DataPrep.bin_data_by(
        df=df, by_cols=["t"], val_col="z", grid_res=50 * KM,
        x_range=[-400 * KM, 400 * KM],
        y_range=[-400 * KM, 400 * KM]).to_dataframe().dropna().reset_index()
    eloc = pd.DataFrame(grid_2d_flatten([-300 * KM, 300 * KM],
                                        [-300 * KM, 300 * KM],
                                        step_size=300 * KM),
                        columns=["x", "y"])
    eloc["t"] = 0.0
    ploc = pd.DataFrame(grid_2d_flatten([-300 * KM, 300 * KM],
                                        [-300 * KM, 300 * KM],
                                        step_size=100 * KM), columns=["x", "y"])
    return bin_df, eloc, ploc


def _run(store_path):
    bin_df, eloc, ploc = _build_inputs()
    locexp = LocalExpertOI(
        expert_loc_config={"source": eloc},
        data_config={"data_source": bin_df, "obs_col": "z",
                     "coords_col": ["x", "y", "t"],
                     "local_select": [
                         {"col": "t", "comp": "<=", "val": 4},
                         {"col": "t", "comp": ">=", "val": -4},
                         {"col": ["x", "y"], "comp": "<", "val": 250 * KM}]},
        model_config={"oi_model": "GPRModel",
                      "init_params": {"coords_scale": [50 * KM, 50 * KM, 1]},
                      "constraints": {
                          "lengthscales": {"low": [1e-08] * 3,
                                           "high": [600 * KM, 600 * KM, 9]},
                          "likelihood_variance": {"low": 1e-4, "high": 0.1}}},
        pred_loc_config={"method": "from_dataframe", "df": ploc,
                         "max_dist": 200 * KM})
    locexp.run(store_path=store_path, optimise=True,
               check_config_compatible=False, verbose=False)
    return store_path


def generate_golden():
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    if os.path.exists(GOLDEN):
        os.remove(GOLDEN)
    _run(GOLDEN)
    print(f"golden store written: {GOLDEN}")


@pytest.fixture(scope="module")
def golden_exists():
    if not os.path.exists(GOLDEN):
        generate_golden()
    return GOLDEN


@pytest.mark.slow
def test_replay_matches_golden(golden_exists, tmp_path):
    """Re-run from scratch and compare every value to the golden store."""
    new_store = str(tmp_path / "replay.h5")
    _run(new_store)
    golden_dfs, golden_cfg = get_results_from_h5file(
        GOLDEN, merge_on_expert_locations=False)
    new_dfs, _ = get_results_from_h5file(new_store,
                                         merge_on_expert_locations=False)
    assert golden_cfg, "golden store must contain oi_config"

    for table in COMPARE_TABLES:
        assert table in golden_dfs, f"golden missing table {table}"
        assert table in new_dfs, f"replay missing table {table}"
        g = golden_dfs[table]
        n = new_dfs[table]
        assert len(g) == len(n), f"{table}: row count {len(n)} != {len(g)}"
        key_cols = [c for c in ("x", "y", "t", "_dim_0", "pred_loc_x",
                                "pred_loc_y", "pred_loc_t") if c in g.columns]
        g = g.sort_values(key_cols).reset_index(drop=True)
        n = n.sort_values(key_cols).reset_index(drop=True)
        tol = TOL_BY_TABLE.get(table, TOL_DEFAULT)
        for col in g.columns:
            if col in SKIP_COLS:
                continue
            gv, nv = g[col].values, n[col].values
            if gv.dtype.kind not in "fiu":
                assert (gv == nv).all(), f"{table}.{col}: values differ"
                continue
            diff = np.abs(np.asarray(gv, float) - np.asarray(nv, float))
            assert np.nanmax(diff) <= tol, \
                f"{table}.{col}: max abs diff {np.nanmax(diff):.2e} > {tol}"


def test_golden_config_replayable(golden_exists):
    """The config stored in the golden file parses back into sections —
    the reference replays runs from stored configs (integration.py:28-69)."""
    _, cfgs = get_results_from_h5file(GOLDEN, merge_on_expert_locations=False)
    cfg = nested_dict_literal_eval(cfgs[0])
    for section in ("data", "model", "run_kwargs"):
        assert section in cfg
    assert cfg["model"]["oi_model"] == "GPRModel"


if __name__ == "__main__":
    generate_golden()
