"""SGPR tests.

Key oracle: with inducing points Z = X the Titsias collapsed bound is tight —
ELBO == -NLML and the SGPR posterior equals the exact GPR posterior. Masking
equality and the batched engine are then checked against that.
"""

import numpy as np
import pandas as pd
import jax.numpy as jnp

from gpsat_tpu.ops import gpr_math
from gpsat_tpu.ops import sgpr as sgpr_math
from gpsat_tpu.models.sgpr import SGPRModel, select_inducing
from gpsat_tpu.models.batched import BatchedSGPR


def make_data(n=40, d=2, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-2, 2, (n, d))
    y = np.sin(X[:, 0]) + 0.5 * np.cos(2 * X[:, 1]) + 0.1 * rng.standard_normal(n)
    return X, y


PARAMS = {"lengthscales": jnp.asarray(np.array([0.9, 1.3])),
          "kernel_variance": jnp.asarray(0.8),
          "likelihood_variance": jnp.asarray(0.05)}


def test_elbo_tight_when_z_equals_x():
    X, y = make_data()
    m = jnp.ones(len(y), dtype=bool)
    Xj, yj = jnp.asarray(X), jnp.asarray(y)
    nlml = float(gpr_math.nlml(PARAMS, Xj, yj, m))
    elbo = float(sgpr_math.elbo(PARAMS, Xj, yj, m, Xj, m, jitter=1e-10))
    assert np.isclose(elbo, -nlml, atol=1e-5), (elbo, -nlml)


def test_sgpr_predict_equals_gpr_when_z_equals_x():
    X, y = make_data()
    Xs, _ = make_data(15, seed=3)
    m = jnp.ones(len(y), dtype=bool)
    Xj, yj, Xsj = jnp.asarray(X), jnp.asarray(y), jnp.asarray(Xs)
    exact = gpr_math.predict(PARAMS, Xj, yj, m, Xsj)
    sparse = sgpr_math.predict(PARAMS, Xj, yj, m, Xj, m, Xsj, jitter=1e-10)
    np.testing.assert_allclose(np.asarray(sparse["f*"]),
                               np.asarray(exact["f*"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sparse["f*_var"]),
                               np.asarray(exact["f*_var"]), atol=1e-6)


def test_elbo_lower_bound_and_monotone_in_m():
    X, y = make_data(60)
    m = jnp.ones(len(y), dtype=bool)
    Xj, yj = jnp.asarray(X), jnp.asarray(y)
    nlml = float(gpr_math.nlml(PARAMS, Xj, yj, m))
    rng = np.random.default_rng(0)
    vals = []
    for M in (10, 30, 60):
        Z = jnp.asarray(X[rng.permutation(len(y))[:M]])
        zm = jnp.ones(M, dtype=bool)
        vals.append(float(sgpr_math.elbo(PARAMS, Xj, yj, m, Z, zm)))
    # every ELBO is a lower bound of the log marginal likelihood
    for v in vals:
        assert v <= -nlml + 1e-6
    assert vals[-1] >= vals[0] - 1e-6  # more inducing -> tighter (same subset family)


def test_masked_elbo_equals_unpadded():
    X, y = make_data(30)
    n_valid, pad, Mv, Mpad = 22, 32, 12, 16
    rng = np.random.default_rng(1)
    Z = X[rng.permutation(30)[:Mv]]
    Xp = np.zeros((pad, 2)); Xp[:n_valid] = X[:n_valid]
    yp = np.zeros(pad); yp[:n_valid] = y[:n_valid]
    mk = np.arange(pad) < n_valid
    Zp = np.zeros((Mpad, 2)); Zp[:Mv] = Z
    zm = np.arange(Mpad) < Mv
    got = float(sgpr_math.elbo(PARAMS, jnp.asarray(Xp), jnp.asarray(yp),
                               jnp.asarray(mk), jnp.asarray(Zp), jnp.asarray(zm)))
    want = float(sgpr_math.elbo(PARAMS, jnp.asarray(X[:n_valid]),
                                jnp.asarray(y[:n_valid]),
                                jnp.ones(n_valid, dtype=bool), jnp.asarray(Z),
                                jnp.ones(Mv, dtype=bool)))
    assert np.isclose(got, want, atol=1e-8), (got, want)


def test_sgpr_model_class():
    X, y = make_data(80)
    m = SGPRModel(coords=X, obs=y[:, None], obs_mean="local",
                  num_inducing_points=30)
    assert m.inducing_points.shape == (30, 2)
    assert "inducing_points" in m.param_names
    e0 = m.get_objective_function_value()
    ok = m.optimise_parameters()
    assert ok
    assert m.get_objective_function_value() > e0  # ELBO increased
    out = m.predict(np.array([[0.0, 0.0], [80.0, 80.0]]))
    for k in ("f*", "f*_var", "y_var", "f_bar"):
        assert k in out
    p = m.get_parameters()
    # far from data -> prior variance
    assert np.isclose(out["f*_var"][1], p["kernel_variance"], rtol=1e-2)


def test_sgpr_model_uses_all_points_when_few():
    X, y = make_data(10)
    m = SGPRModel(coords=X, obs=y[:, None], num_inducing_points=50)
    assert m.inducing_points.shape == (10, 2)


def test_select_inducing_seeded():
    X, _ = make_data(100)
    a = select_inducing(X, 20, seed=1)
    b = select_inducing(X, 20, seed=1)
    c = select_inducing(X, 20, seed=2)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_batched_sgpr_engine_matches_single_model():
    B, N, D, M = 3, 64, 2, 24
    Xb, yb = [], []
    for i in range(B):
        X, y = make_data(N, d=D, seed=10 + i)
        Xb.append(X); yb.append(y - y.mean())
    Xb = np.stack(Xb); yb = np.stack(yb)
    mask = np.ones((B, N), dtype=bool)
    Xs = np.stack([make_data(9, d=D, seed=99)[0]] * B)

    engine = BatchedSGPR(coords_dim=D, num_inducing_points=M,
                         optim_kwargs={"max_iter": 400})
    out = engine.fit_predict(Xb, yb, mask, Xs=Xs, optimise=True, predict=True)
    assert out["params"]["inducing_points"].shape == (B, M, D)
    assert np.isfinite(out["objective"]).all()
    assert np.isfinite(out["preds"]["f*"]).all()

    # single-model cross-check on expert 0 with the engine's inducing set
    m = SGPRModel(coords=Xb[0], obs=yb[0][:, None], num_inducing_points=M)
    m.set_inducing_points(out["params"]["inducing_points"][0])
    m.optimise_parameters()
    # engine reports the ELBO (positive)
    assert np.isclose(m.get_objective_function_value(), out["objective"][0],
                      rtol=1e-3, atol=1e-2), \
        (m.get_objective_function_value(), out["objective"][0])


def test_sgpr_orchestrated_run(tmp_path):
    """LocalExpertOI dispatches SGPR through the batched engine."""
    from gpsat_tpu.local_experts import LocalExpertOI, get_results_from_h5file
    rng = np.random.default_rng(3)
    n = 600
    df = pd.DataFrame({
        "x": rng.uniform(-100, 100, n), "y": rng.uniform(-100, 100, n),
        "t": 0.0})
    df["z"] = (np.sin(df["x"] / 30) + 0.3 * np.cos(df["y"] / 40)
               + 0.05 * rng.standard_normal(n))
    eloc = pd.DataFrame({"x": [0.0], "y": [0.0], "t": [0.0]})
    locexp = LocalExpertOI(
        expert_loc_config={"source": eloc},
        data_config={"data_source": df, "obs_col": "z",
                     "coords_col": ["x", "y", "t"],
                     "local_select": [{"col": ["x", "y"], "comp": "<",
                                       "val": 100.0}]},
        model_config={"oi_model": "SGPRModel",
                      "init_params": {"coords_scale": [30, 30, 1],
                                      "num_inducing_points": 64}},
        pred_loc_config={"method": "expert_loc"})
    store = str(tmp_path / "sgpr.h5")
    locexp.run(store_path=store, optimise=True, check_config_compatible=False,
               verbose=False)
    dfs, _ = get_results_from_h5file(store)
    assert "inducing_points" in dfs
    assert {"_dim_0", "_dim_1"} <= set(dfs["inducing_points"].columns)
    rd = dfs["run_details"]
    assert rd["optimise_success"].all()
    pred = dfs["preds"]
    # prediction at the expert location should be close to the local field
    assert abs(pred["f*"].iloc[0] + pred["f_bar"].iloc[0]
               - (np.sin(0) + 0.3 * np.cos(0))) < 0.2


def test_sgpr_load_params_repredict_inducing(tmp_path):
    """load_params restores inducing locations, not just hypers: a reload
    with a *different* inducing seed + optimise=False must reproduce the
    original predictions exactly (reference load_params flow,
    GPSat/local_experts.py:553-689)."""
    from gpsat_tpu.local_experts import LocalExpertOI, get_results_from_h5file
    rng = np.random.default_rng(7)
    n = 400
    df = pd.DataFrame({
        "x": rng.uniform(-100, 100, n), "y": rng.uniform(-100, 100, n),
        "t": 0.0})
    df["z"] = (np.sin(df["x"] / 30) + 0.3 * np.cos(df["y"] / 40)
               + 0.05 * rng.standard_normal(n))
    eloc = pd.DataFrame({"x": [0.0, 20.0], "y": [0.0, -10.0], "t": [0.0, 0.0]})
    data_config = {"data_source": df, "obs_col": "z",
                   "coords_col": ["x", "y", "t"],
                   "local_select": [{"col": ["x", "y"], "comp": "<",
                                     "val": 100.0}]}
    model_config = {"oi_model": "SGPRModel",
                    "init_params": {"coords_scale": [30, 30, 1],
                                    "num_inducing_points": 48,
                                    "inducing_seed": 42}}
    store = str(tmp_path / "sgpr_reload.h5")
    LocalExpertOI(expert_loc_config={"source": eloc}, data_config=data_config,
                  model_config=model_config,
                  pred_loc_config={"method": "expert_loc"}).run(
        store_path=store, optimise=True, check_config_compatible=False,
        verbose=False)

    # reload: different seed would re-select different inducing points, so a
    # prediction match proves the stored ones were loaded
    model_config2 = dict(model_config)
    model_config2["init_params"] = dict(model_config["init_params"],
                                        inducing_seed=123)
    model_config2["load_params"] = {"file": store, "table_suffix": ""}
    LocalExpertOI(expert_loc_config={"source": eloc}, data_config=data_config,
                  model_config=model_config2,
                  pred_loc_config={"method": "expert_loc"}).run(
        store_path=store, optimise=False, predict=True,
        table_suffix="_RELOAD", check_config_compatible=False, verbose=False)

    dfs, _ = get_results_from_h5file(store)
    a = dfs["preds"].sort_values(["x", "y"]).reset_index(drop=True)
    b = dfs["preds_RELOAD"].sort_values(["x", "y"]).reset_index(drop=True)
    np.testing.assert_allclose(a["f*"].values, b["f*"].values, atol=1e-7)
    np.testing.assert_allclose(a["f*_var"].values, b["f*_var"].values,
                               atol=1e-7)


def test_batched_sgpr_pooled_matches_one_shot():
    """The device-resident L-BFGS pool (fit_predict_many) must reproduce the
    one-shot batched SGPR fit: fixed inducing points, same collapsed
    negative-ELBO objective, slot refills with zeroed curvature history.

    Tolerances are optimiser-level, not bitwise: the pooled loop is a
    different compiled program than the one-shot fit, so XLA fusion changes
    matmul accumulation order by a few ULPs and the L-BFGS *path* drifts —
    converged experts still land on the same optimum; only max_iter-capped
    (non-converged) experts may differ visibly."""
    E, N, D, M = 8, 48, 2, 16
    Xb, yb = [], []
    for i in range(E):
        X, y = make_data(N, d=D, seed=30 + i)
        Xb.append(X); yb.append(y - y.mean())
    Xb = np.stack(Xb); yb = np.stack(yb)
    mask = np.ones((E, N), dtype=bool)
    mask[2, 40:] = False
    Xs = np.stack([make_data(5, d=D, seed=77)[0]] * E)

    engine = BatchedSGPR(coords_dim=D, num_inducing_points=M,
                         optim_kwargs={"max_iter": 200})
    base = engine.fit_predict(Xb, yb, mask, Xs=Xs, optimise=True,
                              predict=True)
    pooled = engine.fit_predict_many(Xb, yb, mask, Xs=Xs, optimise=True,
                                     predict=True, slots=3)
    np.testing.assert_array_equal(pooled["converged"], base["converged"])
    conv = np.asarray(base["converged"])
    np.testing.assert_allclose(pooled["objective"][conv],
                               base["objective"][conv], rtol=1e-6, atol=1e-6)
    # non-converged (max_iter-capped) experts follow different trial
    # sequences in the pool (refill bootstraps shift the shared ring
    # pointer), so only require they land in the same basin
    np.testing.assert_allclose(pooled["objective"], base["objective"],
                               atol=1.0)
    for k in base["params"]:
        np.testing.assert_allclose(pooled["params"][k][conv],
                                   base["params"][k][conv],
                                   rtol=1e-2, atol=1e-4)
    np.testing.assert_allclose(pooled["preds"]["f*"][conv],
                               base["preds"]["f*"][conv],
                               rtol=1e-3, atol=1e-4)
    # inducing points are deterministic (seeded) and identical
    np.testing.assert_allclose(pooled["params"]["inducing_points"],
                               base["params"]["inducing_points"])


def test_batched_sgpr_train_z_falls_back_to_chunked():
    E, N, D, M = 4, 32, 2, 8
    X = np.stack([make_data(N, d=D, seed=50 + i)[0] for i in range(E)])
    y = np.stack([make_data(N, d=D, seed=50 + i)[1] for i in range(E)])
    y = y - y.mean(axis=1, keepdims=True)
    mask = np.ones((E, N), dtype=bool)
    engine = BatchedSGPR(coords_dim=D, num_inducing_points=M,
                         optim_kwargs={"max_iter": 60,
                                       "train_inducing_points": True})
    assert not engine._pool_supported(True)
    out = engine.fit_predict_many(X, y, mask, optimise=True, predict=False,
                                  slots=2)
    assert out["objective"].shape == (E,)
    assert np.isfinite(out["objective"]).all()
