"""Cross-validation workflow tests: fold-config generation -> fold runs ->
held-out scoring/analysis (reference: examples/create_xval_config.py +
examples/Archive/evaluate_xval_performance.py +
examples/Archive/xval_on_single_track_analysis.py)."""

import numpy as np
import pandas as pd
import pytest

from examples.create_xval_config import create_xval_configs, evaluate_xval
from examples.evaluate_xval_performance import (run_missing_folds,
                                                xval_fold_summary,
                                                xval_point_frame)

KM = 1000.0


def _make_tracked_data(seed=11, n_per=64):
    """Three synthetic 'tracks' (A/B/C) over a smooth field."""
    rng = np.random.default_rng(seed)
    frames = []
    for i, src in enumerate("ABC"):
        x = rng.uniform(-300 * KM, 300 * KM, n_per)
        y = rng.uniform(-300 * KM, 300 * KM, n_per)
        z = (0.3 * np.sin(x / (150 * KM)) + 0.2 * np.cos(y / (200 * KM))
             + 0.05 * rng.standard_normal(n_per))
        frames.append(pd.DataFrame(
            {"x": x, "y": y, "z": z, "t": 0.0, "source": src}))
    return pd.concat(frames, ignore_index=True)


@pytest.fixture(scope="module")
def xval_run(tmp_path_factory):
    df = _make_tracked_data()
    eloc = pd.DataFrame({"x": [-150 * KM, 150 * KM, -150 * KM, 150 * KM],
                         "y": [-150 * KM, -150 * KM, 150 * KM, 150 * KM],
                         "t": [0.0] * 4})
    ref_cfg = {
        "data": {
            "data_source": df,
            "obs_col": "z",
            "coords_col": ["x", "y", "t"],
            "local_select": [
                {"col": ["x", "y"], "comp": "<", "val": 260 * KM}],
        },
        "locations": {"source": eloc},
        "model": {
            "oi_model": "GPRModel",
            "init_params": {"coords_scale": [50 * KM, 50 * KM, 1]},
            "optim_kwargs": {"max_iter": 150},
            "constraints": {
                "likelihood_variance": {"low": 1e-4, "high": 0.05}},
        },
        "run_kwargs": {},
    }
    cfgs = create_xval_configs(ref_cfg, xval_col="source",
                               xval_vals=["A", "B"])
    store = str(tmp_path_factory.mktemp("xval") / "xval.h5")
    run_missing_folds(cfgs, store)
    return dict(cfgs=cfgs, store=store, df=df)


def test_fold_configs_shape(xval_run):
    cfgs = xval_run["cfgs"]
    assert len(cfgs) == 2
    for i, cfg in enumerate(cfgs):
        # held-out rows negated from training, un-negated as pred_loc
        assert cfg["data"]["row_select"][-1]["negate"] is True
        assert cfg["pred_loc"]["method"] == "from_source"
        assert cfg["run_kwargs"]["table_suffix"] == f"_xval{i}"


def test_point_frame_and_summary(xval_run):
    cfgs, store, df = (xval_run["cfgs"], xval_run["store"], xval_run["df"])
    suffixes = [c["run_kwargs"]["table_suffix"] for c in cfgs]
    points = xval_point_frame(store, suffixes, df, coords_col=("x", "y"),
                              obs_col="z", inference_radius=200 * KM)
    assert len(points) > 0
    for col in ("mu", "diff", "norm_diff", "nll", "fold"):
        assert col in points.columns
    assert np.isfinite(points["nll"]).all()
    # held-out points for fold i must come only from that fold's track
    merged = points.merge(df.round({"x": 6, "y": 6}), on=["x", "y"],
                          suffixes=("", "_truth"))
    for suffix, src in zip(suffixes, ["A", "B"]):
        g = merged.loc[merged["fold"] == suffix]
        assert (g["source"] == src).all()

    summary = xval_fold_summary(points, obs_col="z")
    assert set(summary["fold"]) == set(suffixes)
    assert np.isfinite(summary[["rmse", "nll"]].values).all()
    # interpolation from the other two tracks should beat the raw
    # observation noise ceiling by a wide margin
    assert (summary["rmse"] < 0.5).all()

    # consistency with the lighter evaluate_xval scorer
    ev = evaluate_xval(store, df, suffixes, coords_col=("x", "y"),
                       obs_col="z", inference_radius=200 * KM)
    m = summary.merge(ev, on="fold", suffixes=("", "_ev"))
    np.testing.assert_allclose(m["rmse"], m["rmse_ev"], rtol=1e-9)


def test_run_missing_is_idempotent(xval_run, capsys):
    # second call finds all tables present and runs nothing
    run_missing_folds(xval_run["cfgs"], xval_run["store"])
    out = capsys.readouterr().out
    assert "running fold" not in out


def test_two_panel_figure(xval_run, tmp_path):
    from examples.evaluate_xval_performance import _two_panel_figure
    cfgs, store, df = (xval_run["cfgs"], xval_run["store"], xval_run["df"])
    suffixes = [c["run_kwargs"]["table_suffix"] for c in cfgs]
    points = xval_point_frame(store, suffixes, df, coords_col=("x", "y"),
                              obs_col="z", inference_radius=200 * KM)
    out = tmp_path / "xval.png"
    _two_panel_figure(points, "norm_diff", str(out), ["x", "y"])
    assert out.exists() and out.stat().st_size > 0
