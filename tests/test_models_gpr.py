"""Model-level tests for GPRModel — the reference's numerical-equivalence
harness re-created (reference: GPSat/models/pure_python_gpr.py:556-671):
optimised hyperparameters and objective cross-checked against an independent
scipy+numpy reference path, constraints honoured, parameter transfer exact.
"""

import numpy as np
import pandas as pd
import pytest
import scipy.optimize
from scipy.spatial.distance import cdist

from gpsat_tpu.models import get_model
from gpsat_tpu.models.exact_gpr import GPRModel


def toy_data(n=25, seed=3):
    rng = np.random.default_rng(seed)
    X = rng.uniform(0, 1, (n, 1))
    Y = (np.cos(4 * X[:, 0]) + 0.15 * rng.standard_normal(n))[:, None] + 3.0
    return X, Y


# independent numpy reference: Matern32 NLML minimised by scipy L-BFGS-B in
# log-space (equivalent parameterisation, independent code path)
def np_nlml(log_params, X, y):
    ls = np.exp(log_params[:-2])
    kv = np.exp(log_params[-2])
    lv = np.exp(log_params[-1])
    r = cdist(np.sqrt(3) * X / ls, np.sqrt(3) * X / ls)
    K = kv * (1 + r) * np.exp(-r) + np.eye(len(y)) * lv
    try:
        L = np.linalg.cholesky(K)
    except np.linalg.LinAlgError:
        return np.inf
    alpha = np.linalg.solve(L.T, np.linalg.solve(L, y))
    return float(0.5 * y @ alpha + np.log(np.diag(L)).sum()
                 + 0.5 * len(y) * np.log(2 * np.pi))


def test_factory_aliases():
    assert get_model("GPRModel") is GPRModel
    assert get_model("GPflowGPRModel") is GPRModel
    with pytest.raises(NotImplementedError):
        get_model("NoSuchModel")


def test_init_from_dataframe_demean_rescale():
    X, Y = toy_data()
    df = pd.DataFrame({"x": X[:, 0] * 100, "z": Y[:, 0]})
    m = GPRModel(data=df, coords_col="x", obs_col="z",
                 coords_scale=100, obs_mean="local")
    np.testing.assert_allclose(m.coords[:, 0], X[:, 0], atol=1e-12)
    assert abs(m.obs.mean()) < 1e-12
    np.testing.assert_allclose(m.obs_mean[0, 0], Y.mean(), atol=1e-12)


def test_param_get_set_round_trip():
    X, Y = toy_data()
    m = GPRModel(coords=X, obs=Y)
    m.set_parameters(lengthscales=np.array([0.5]), kernel_variance=2.0,
                     likelihood_variance=0.1)
    p = m.get_parameters()
    np.testing.assert_allclose(p["lengthscales"], [0.5])
    assert p["kernel_variance"] == 2.0
    assert p["likelihood_variance"] == 0.1


def test_objective_matches_numpy_reference():
    X, Y = toy_data()
    m = GPRModel(coords=X, obs=Y, obs_mean="local")
    p = m.get_parameters()
    want = np_nlml(np.log(np.concatenate([p["lengthscales"],
                                          [p["kernel_variance"]],
                                          [p["likelihood_variance"]]])),
                   m.coords, m.obs[:, 0])
    assert np.isclose(m.get_objective_function_value(), want, atol=1e-8)


def test_optimise_matches_scipy_reference():
    X, Y = toy_data()
    m = GPRModel(coords=X, obs=Y, obs_mean="local")
    success = m.optimise_parameters()
    assert success

    # independent scipy reference on the same data (log-parameterisation)
    res = scipy.optimize.minimize(np_nlml, np.zeros(3),
                                  args=(m.coords, m.obs[:, 0]),
                                  method="L-BFGS-B")
    got = m.get_objective_function_value()
    assert got <= res.fun + 1e-6, (got, res.fun)
    # parameters agree to optimiser tolerance
    ref_params = np.exp(res.x)
    p = m.get_parameters()
    np.testing.assert_allclose(p["lengthscales"], ref_params[:1], rtol=1e-3)
    np.testing.assert_allclose(p["kernel_variance"], ref_params[1], rtol=1e-3)
    np.testing.assert_allclose(p["likelihood_variance"], ref_params[2], rtol=1e-3)


def test_constraints_box_respected():
    X, Y = toy_data()
    constraints = {
        "lengthscales": {"low": [0.3], "high": [0.5]},
        "kernel_variance": {"low": 0.2, "high": 0.8},
        "likelihood_variance": {"low": 0.01, "high": 0.05},
    }
    m = GPRModel(coords=X, obs=Y, obs_mean="local",
                 kernel_kwargs={"lengthscales": 0.25, "variance": 0.1})
    m.set_parameter_constraints(constraints, move_within_tol=True, tol=1e-2)
    # initial values moved inside bounds
    p = m.get_parameters()
    assert 0.3 < p["lengthscales"][0] < 0.5
    assert 0.2 < p["kernel_variance"] < 0.8
    m.optimise_parameters()
    p = m.get_parameters()
    assert 0.3 <= p["lengthscales"][0] <= 0.5
    assert 0.2 <= p["kernel_variance"] <= 0.8
    assert 0.01 <= p["likelihood_variance"] <= 0.05


def test_lengthscales_constraint_scaling():
    X, Y = toy_data()
    m = GPRModel(coords=X * 50000, obs=Y, coords_scale=[50000])
    m.set_lengthscales_constraints(low=[10000], high=[200000], scale=True)
    # bounds divided by coords_scale
    b = m.transforms["lengthscales"]
    np.testing.assert_allclose(np.asarray(b.low), [0.2])
    np.testing.assert_allclose(np.asarray(b.high), [4.0])


def test_fixed_params_not_optimised():
    X, Y = toy_data()
    m = GPRModel(coords=X, obs=Y, obs_mean="local", noise_variance=0.0123)
    m.optimise_parameters(fixed_params=["likelihood_variance"])
    assert m.get_likelihood_variance() == 0.0123


def test_predict_keys_and_prior_far_away():
    X, Y = toy_data()
    m = GPRModel(coords=X, obs=Y, obs_mean="local")
    m.optimise_parameters()
    out = m.predict(np.array([[0.5], [100.0]]))
    for k in ["f*", "f*_var", "y_var", "f_bar"]:
        assert k in out
    # far from data: posterior ~ prior
    p = m.get_parameters()
    assert np.isclose(out["f*"][1], 0.0, atol=1e-3)
    assert np.isclose(out["f*_var"][1], p["kernel_variance"], rtol=1e-3)
    np.testing.assert_allclose(out["y_var"], out["f*_var"] + p["likelihood_variance"])
    np.testing.assert_allclose(out["f_bar"], Y.mean())


def test_predict_full_cov():
    X, Y = toy_data()
    m = GPRModel(coords=X, obs=Y)
    out = m.predict(np.array([[0.2], [0.4]]), full_cov=True)
    assert out["f*_cov"].shape == (2, 2)
    np.testing.assert_allclose(np.diag(out["f*_cov"]), out["f*_var"], atol=1e-8)
    np.testing.assert_allclose(np.diag(out["y_cov"]),
                               np.diag(out["f*_cov"]) + m.get_likelihood_variance())


def test_parameter_transfer_objective_equivalence():
    # fitting one model and transferring params to a fresh model gives the
    # identical objective (reference: pure_python_gpr.py:614-619)
    X, Y = toy_data()
    m1 = GPRModel(coords=X, obs=Y, obs_mean="local")
    m1.optimise_parameters()
    m2 = GPRModel(coords=X, obs=Y, obs_mean="local")
    m2.set_parameters(**m1.get_parameters())
    assert np.isclose(m1.get_objective_function_value(),
                      m2.get_objective_function_value(), atol=1e-10)


def test_smoothness_selects_matern_order():
    # GPyTorch-config compatibility: kernel_kwargs={'smoothness': nu}
    # selects the Matern order (reference: gpytorch_models.py:230-248)
    import warnings
    from gpsat_tpu.models.batched import BatchedGPR

    X, Y = toy_data()
    for nu, expect in [(0.5, "Matern12"), (1.5, "Matern32"),
                       (2.5, "Matern52")]:
        m = GPRModel(coords=X, obs=Y, kernel_kwargs={"smoothness": nu})
        assert m.kernel == expect
        eng = BatchedGPR(coords_dim=1, kernel_kwargs={"smoothness": nu})
        assert eng.kernel == expect
    # non-half-integer warns and rounds to the nearest supported order
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        m = GPRModel(coords=X, obs=Y, kernel_kwargs={"smoothness": 1.9})
        assert m.kernel == "Matern32"
        eng = BatchedGPR(coords_dim=1, kernel="RBF",
                         kernel_kwargs={"smoothness": 1.5})
        assert eng.kernel == "RBF"   # non-Matern kernel: warn + keep
    assert len(rec) == 2
