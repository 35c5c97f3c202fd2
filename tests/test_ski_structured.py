"""Structured KISS-GP (BTTB FFT MVMs + sparse interpolation + CG) against
the dense SKI oracle (ops/ski.py) — the large-N machinery the reference gets
from gpytorch's GridInterpolationKernel (GPSat/models/gpytorch_models.py:321)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gpsat_tpu.ops import ski
from gpsat_tpu.ops.ski_structured import (SparseInterp, bttb_matvec,
                                          cg_solve, grid_kernel_embed_fft,
                                          ski_fit_adam, ski_matvec,
                                          ski_predict_cg)
from gpsat_tpu.ops.transforms import Softplus

KERNELS = ["Matern32", "RBF", "Matern12"]


def make_case(n=300, d=2, G=16, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-3, 3, (n, d))
    y = np.sin(X[:, 0]) + 0.3 * np.cos(X[:, 1] if d > 1 else X[:, 0]) \
        + 0.1 * rng.standard_normal(n)
    starts, steps = ski.make_grid(X, G)
    params = {"lengthscales": jnp.asarray(rng.uniform(0.8, 1.6, d)),
              "kernel_variance": jnp.asarray(1.3),
              "likelihood_variance": jnp.asarray(0.1)}
    return X, y, starts, steps, params


@pytest.mark.parametrize("kernel", KERNELS)
@pytest.mark.parametrize("d", [1, 2])
def test_bttb_matvec_matches_dense_grid_kernel(kernel, d):
    X, y, starts, steps, params = make_case(d=d, G=12, seed=1)
    G = 12
    Zg = ski.grid_points(starts, steps, G, d)
    from gpsat_tpu.ops.kernels import kernel_fn
    Kg = np.asarray(kernel_fn(kernel)(Zg, Zg, params["lengthscales"],
                                      params["kernel_variance"]))
    femb = grid_kernel_embed_fft(params, steps, G, kernel, d)
    rng = np.random.default_rng(2)
    v = rng.standard_normal((3, G ** d))
    got = np.asarray(bttb_matvec(femb, jnp.asarray(v), G, d))
    want = v @ Kg.T
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("d", [1, 2])
def test_sparse_interp_matches_dense(d):
    X, y, starts, steps, params = make_case(d=d, G=14, seed=3)
    G = 14
    Wd = np.asarray(ski.interp_matrix(jnp.asarray(X), starts, steps, G))
    sp = SparseInterp(X, starts, steps, G)
    rng = np.random.default_rng(4)
    u = rng.standard_normal((2, G ** d))
    np.testing.assert_allclose(np.asarray(sp.apply(jnp.asarray(u))),
                               u @ Wd.T, rtol=1e-6, atol=1e-10)
    r = rng.standard_normal((2, X.shape[0]))
    np.testing.assert_allclose(np.asarray(sp.apply_t(jnp.asarray(r))),
                               r @ Wd, rtol=1e-6, atol=1e-10)


def test_ski_matvec_and_cg_match_dense():
    X, y, starts, steps, params = make_case(d=2, G=14, seed=5)
    G, d = 14, 2
    Zg = ski.grid_points(starts, steps, G, d)
    W = np.asarray(ski.interp_matrix(jnp.asarray(X), starts, steps, G))
    from gpsat_tpu.ops.kernels import kernel_fn
    Kg = np.asarray(kernel_fn("Matern32")(Zg, Zg, params["lengthscales"],
                                          params["kernel_variance"]))
    Kdense = W @ Kg @ W.T + np.eye(len(y)) * (
        float(params["likelihood_variance"]) + 1e-4)
    sp = SparseInterp(X, starts, steps, G)
    mv = lambda v: ski_matvec(params, sp, steps, G, "Matern32", d, v,
                              jitter=1e-4)
    rng = np.random.default_rng(6)
    v = rng.standard_normal((2, len(y)))
    np.testing.assert_allclose(np.asarray(mv(jnp.asarray(v))), v @ Kdense.T,
                               rtol=1e-5, atol=1e-6)
    # CG solve vs dense solve
    sol = np.asarray(cg_solve(mv, jnp.asarray(v), tol=1e-10, max_iter=400))
    want = np.linalg.solve(Kdense, v.T).T
    np.testing.assert_allclose(sol, want, rtol=1e-4, atol=1e-6)


def test_ski_predict_cg_matches_dense_predict():
    X, y, starts, steps, params = make_case(d=2, G=14, seed=7)
    G, d = 14, 2
    rng = np.random.default_rng(8)
    Xs = rng.uniform(-2, 2, (20, d))
    sp = SparseInterp(X, starts, steps, G)
    got = ski_predict_cg(params, sp, X, y, Xs, starts, steps, G, "Matern32",
                         jitter=1e-4, cg_tol=1e-10, cg_iters=400)
    W = ski.interp_matrix(jnp.asarray(X), starts, steps, G)
    Zg = ski.grid_points(starts, steps, G, d)
    mask = jnp.ones(len(y), bool)
    want = ski.ski_predict(params, jnp.asarray(X), jnp.asarray(y), mask,
                           jnp.asarray(Xs), W, Zg, starts, steps, G,
                           "Matern32", jitter=1e-4)
    np.testing.assert_allclose(np.asarray(got["f*"]),
                               np.asarray(want["f*"]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["f*_var"]),
                               np.asarray(want["f*_var"]), rtol=1e-3,
                               atol=1e-5)


def test_ski_fit_adam_improves_and_predicts():
    """Training smoke: stochastic-gradient Adam moves the hyperparameters
    toward a better fit and the posterior tracks the signal."""
    X, y, starts, steps, _ = make_case(n=400, d=2, G=16, seed=9)
    G, d = 16, 2
    p0 = {"lengthscales": np.array([0.3, 0.3]),
          "kernel_variance": np.asarray(0.5),
          "likelihood_variance": np.asarray(0.5)}
    bij = {k: Softplus() for k in p0}
    params, interp = ski_fit_adam(p0, bij, X, y, starts, steps, G,
                                  "Matern32", iterations=25, lr=0.1,
                                  n_probes=4, seed=0)
    assert float(params["likelihood_variance"]) < 0.4   # shrinks toward 0.01
    pred = ski_predict_cg(params, interp, X, y, X[:50], starts, steps, G,
                          "Matern32")
    resid = np.asarray(pred["f*"]) - y[:50]
    assert np.sqrt((resid ** 2).mean()) < 0.5 * np.std(y)


def test_kissgp_model_structured_mode():
    """KISSGPModel(structured=True) trains and predicts consistently with
    the dense mode on a small case (stochastic Adam vs L-BFGS endpoints
    differ; posterior shapes and signal-tracking must agree)."""
    from gpsat_tpu.models.kiss_gpr import KISSGPModel

    rng = np.random.default_rng(11)
    n = 350
    X = rng.uniform(-3, 3, (n, 2))
    y = np.sin(X[:, 0]) + 0.3 * np.cos(X[:, 1]) \
        + 0.05 * rng.standard_normal(n)
    Xs = rng.uniform(-2, 2, (15, 2))

    md = KISSGPModel(coords=X, obs=y[:, None], grid_size=16)
    assert not md.structured
    md.optimise_parameters(max_iter=200)
    pd_ = md.predict(Xs, apply_scale=False)

    ms = KISSGPModel(coords=X, obs=y[:, None], grid_size=16,
                     structured=True)
    assert ms.structured
    assert ms.optimise_parameters(iterations=25)
    ps = ms.predict(Xs, apply_scale=False)
    assert np.isfinite(ps["f*"]).all() and np.isfinite(ps["f*_var"]).all()
    # both posteriors track the (noise-free) signal
    truth = np.sin(Xs[:, 0]) + 0.3 * np.cos(Xs[:, 1])
    for p in (pd_, ps):
        assert np.sqrt(((p["f*"] - truth) ** 2).mean()) < 0.3
