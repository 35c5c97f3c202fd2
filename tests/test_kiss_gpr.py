"""KISS-GP (SKI) model tests.

Oracles: the cubic-convolution interpolation identities (partition of unity,
exactness at grid nodes) and the exact-GPR model itself — SKI converges to
the exact kernel as the grid refines, so NLML / posterior / fitted
hyperparameters must approach GPRModel's on a dense grid.
(Reference model: GPyTorchKISSGPModel, GPSat/models/gpytorch_models.py:321.)
"""

import numpy as np
import jax.numpy as jnp

from gpsat_tpu.models import get_model
from gpsat_tpu.models.exact_gpr import GPRModel
from gpsat_tpu.models.kiss_gpr import KISSGPModel
from gpsat_tpu.ops import ski


def toy_data(n=40, seed=7):
    rng = np.random.default_rng(seed)
    X = rng.uniform(0, 1, (n, 1))
    Y = (np.cos(4 * X[:, 0]) + 0.1 * rng.standard_normal(n))[:, None]
    return X, Y


def test_factory_registration():
    assert get_model("KISSGPModel") is KISSGPModel
    assert get_model("GPyTorchKISSGPModel") is KISSGPModel


def test_interp_weights_partition_of_unity():
    rng = np.random.default_rng(0)
    X = rng.uniform(0, 1, (50, 2))
    starts, steps = ski.make_grid(X, 12)
    W = ski.interp_matrix(jnp.asarray(X), jnp.asarray(starts),
                          jnp.asarray(steps), 12)
    np.testing.assert_allclose(np.asarray(W).sum(axis=1), 1.0, atol=1e-12)


def test_interp_exact_at_grid_nodes():
    starts, steps = np.array([0.0]), np.array([0.25])
    G = 9
    nodes = starts[0] + steps[0] * np.arange(2, 7)   # interior nodes
    W = ski.interp_weights_1d(jnp.asarray(nodes), starts[0], steps[0], G)
    W = np.asarray(W)
    for i, node_idx in enumerate(range(2, 7)):
        expect = np.zeros(G)
        expect[node_idx] = 1.0
        np.testing.assert_allclose(W[i], expect, atol=1e-12)


def test_ski_nlml_close_to_exact_on_dense_grid():
    X, Y = toy_data()
    exact = GPRModel(coords=X, obs=Y, kernel="Matern32")
    kiss = KISSGPModel(coords=X, obs=Y, kernel="Matern32", grid_size=64)
    # same hyperparameters in both models
    kiss.set_lengthscales(exact.get_lengthscales())
    kiss.set_kernel_variance(exact.get_kernel_variance())
    kiss.set_likelihood_variance(exact.get_likelihood_variance())
    f_exact = exact.get_objective_function_value()
    f_ski = kiss.get_objective_function_value()
    assert abs(f_ski - f_exact) / abs(f_exact) < 2e-3


def test_ski_predict_close_to_exact():
    X, Y = toy_data()
    Xs = np.linspace(0.1, 0.9, 9)[:, None]
    exact = GPRModel(coords=X, obs=Y, kernel="Matern32")
    kiss = KISSGPModel(coords=X, obs=Y, kernel="Matern32", grid_size=64)
    kiss.set_lengthscales([0.3])
    exact.set_lengthscales([0.3])
    pe = exact.predict(Xs, apply_scale=False)
    pk = kiss.predict(Xs, apply_scale=False)
    assert set(pk) >= {"f*", "f*_var", "y_var", "f_bar"}
    np.testing.assert_allclose(pk["f*"], pe["f*"], atol=5e-3)
    np.testing.assert_allclose(pk["f*_var"], pe["f*_var"], atol=5e-3)


def test_optimise_tracks_exact_gpr():
    X, Y = toy_data()
    exact = GPRModel(coords=X, obs=Y, kernel="Matern32")
    kiss = KISSGPModel(coords=X, obs=Y, kernel="Matern32", grid_size=64)
    assert exact.optimise_parameters(max_iter=300)
    assert kiss.optimise_parameters(max_iter=300)
    ls_e = exact.get_lengthscales()[0]
    ls_k = kiss.get_lengthscales()[0]
    assert abs(ls_k - ls_e) / ls_e < 0.1
    f_e = exact.get_objective_function_value()
    f_k = kiss.get_objective_function_value()
    assert abs(f_k - f_e) / abs(f_e) < 0.05


def test_auto_grid_size():
    X, Y = toy_data(n=64)
    kiss = KISSGPModel(coords=X, obs=Y)
    assert kiss.grid_size == max(int(64 ** 1.0), 8) == 64
    X2 = np.concatenate([X, X], axis=1)
    kiss2 = KISSGPModel(coords=X2, obs=Y)
    assert kiss2.grid_size == 8
