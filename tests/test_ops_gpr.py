"""Oracle tests for the masked batched GPR math.

The oracle is an independent NumPy implementation (cdist-based Matern kernels +
Rasmussen Algo 2.1) — the same math the reference validates its models against
(reference: GPSat/models/pure_python_gpr.py:378-553).
"""

import numpy as np
import pytest
import scipy.optimize
from scipy.spatial.distance import cdist

import jax
import jax.numpy as jnp

from gpsat_tpu.ops import gpr_math, kernel_fn
from gpsat_tpu.ops.transforms import Softplus, Sigmoid, get_bijector
from gpsat_tpu.ops.lbfgs import batched_lbfgs


# ---------------------------------------------------------------------------
# numpy oracle
# ---------------------------------------------------------------------------

def np_matern32(X1, X2, ls, var):
    r = cdist(np.sqrt(3.0) * X1 / ls, np.sqrt(3.0) * X2 / ls)
    return var * (1 + r) * np.exp(-r)


def np_rbf(X1, X2, ls, var):
    r2 = cdist(X1 / ls, X2 / ls) ** 2
    return var * np.exp(-0.5 * r2)


def np_nlml(X, y, ls, kv, lv, kfn=np_matern32):
    n = len(y)
    K = kfn(X, X, ls, kv) + np.eye(n) * lv
    L = np.linalg.cholesky(K)
    alpha = np.linalg.solve(L.T, np.linalg.solve(L, y))
    return float(0.5 * y @ alpha + np.log(np.diag(L)).sum()
                 + 0.5 * n * np.log(2 * np.pi))


def np_predict(X, y, Xs, ls, kv, lv, kfn=np_matern32):
    n = len(y)
    K = kfn(X, X, ls, kv) + np.eye(n) * lv
    L = np.linalg.cholesky(K)
    alpha = np.linalg.solve(L.T, np.linalg.solve(L, y))
    Ks = kfn(X, Xs, ls, kv)
    mean = Ks.T @ alpha
    v = np.linalg.solve(L, Ks)
    var = kv - np.sum(v * v, axis=0)
    return mean, var


def make_data(n=40, d=3, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-2, 2, (n, d))
    y = (np.sin(X[:, 0]) + 0.5 * np.cos(2 * X[:, 1]) +
         0.1 * rng.standard_normal(n))
    return X, y


PARAMS = {"lengthscales": np.array([0.8, 1.2, 1.5]),
          "kernel_variance": 0.7, "likelihood_variance": 0.05}


def jx_params(ls=None, kv=None, lv=None):
    return {"lengthscales": jnp.asarray(PARAMS["lengthscales"] if ls is None else ls),
            "kernel_variance": jnp.asarray(PARAMS["kernel_variance"] if kv is None else kv),
            "likelihood_variance": jnp.asarray(PARAMS["likelihood_variance"] if lv is None else lv)}


# ---------------------------------------------------------------------------
# kernels vs oracle
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name,np_fn", [("Matern32", np_matern32), ("RBF", np_rbf)])
def test_kernel_matches_oracle(name, np_fn):
    X, _ = make_data()
    Xs, _ = make_data(17, seed=1)
    k = kernel_fn(name)
    got = np.asarray(k(jnp.asarray(X), jnp.asarray(Xs),
                       jnp.asarray(PARAMS["lengthscales"]),
                       PARAMS["kernel_variance"]))
    want = np_fn(X, Xs, PARAMS["lengthscales"], PARAMS["kernel_variance"])
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_kernel_batched_shape():
    X = jnp.zeros((4, 10, 2))
    k = kernel_fn("Matern52")
    out = k(X, X, jnp.ones((4, 2)), jnp.ones(4))
    assert out.shape == (4, 10, 10)


def test_all_kernels_psd_diag():
    X, _ = make_data(20, 2)
    for name in ["Matern12", "Matern32", "Matern52", "RBF", "Exponential",
                 "RationalQuadratic", "Cosine"]:
        k = kernel_fn(name)
        K = np.asarray(k(jnp.asarray(X), jnp.asarray(X), jnp.ones(2), 2.0))
        np.testing.assert_allclose(np.diag(K), 2.0, atol=1e-9)
        np.testing.assert_allclose(K, K.T, atol=1e-12)


# ---------------------------------------------------------------------------
# NLML / predict vs oracle, incl. masking
# ---------------------------------------------------------------------------

def test_nlml_matches_oracle():
    X, y = make_data()
    got = float(gpr_math.nlml(jx_params(), jnp.asarray(X), jnp.asarray(y),
                              jnp.ones(len(y), dtype=bool)))
    want = np_nlml(X, y, **{k: v for k, v in
                            zip(["ls", "kv", "lv"], PARAMS.values())})
    assert np.isclose(got, want, atol=1e-8)


def test_masked_nlml_equals_unpadded():
    X, y = make_data(30)
    n_valid = 21
    pad = 30
    Xp = np.zeros((pad, 3))
    Xp[:n_valid] = X[:n_valid]
    yp = np.zeros(pad)
    yp[:n_valid] = y[:n_valid]
    mask = np.arange(pad) < n_valid
    got = float(gpr_math.nlml(jx_params(), jnp.asarray(Xp), jnp.asarray(yp),
                              jnp.asarray(mask)))
    want = np_nlml(X[:n_valid], y[:n_valid], PARAMS["lengthscales"],
                   PARAMS["kernel_variance"], PARAMS["likelihood_variance"])
    assert np.isclose(got, want, atol=1e-8), (got, want)


def test_predict_matches_oracle_with_padding():
    X, y = make_data(25)
    Xs, _ = make_data(11, seed=3)
    n_valid = 18
    pad = 32
    Xp = np.zeros((pad, 3)); Xp[:n_valid] = X[:n_valid]
    yp = np.zeros(pad); yp[:n_valid] = y[:n_valid]
    mask = np.arange(pad) < n_valid
    out = gpr_math.predict(jx_params(), jnp.asarray(Xp), jnp.asarray(yp),
                           jnp.asarray(mask), jnp.asarray(Xs))
    mean, var = np_predict(X[:n_valid], y[:n_valid], Xs,
                           PARAMS["lengthscales"], PARAMS["kernel_variance"],
                           PARAMS["likelihood_variance"])
    np.testing.assert_allclose(np.asarray(out["f*"]), mean, atol=1e-8)
    np.testing.assert_allclose(np.asarray(out["f*_var"]), var, atol=1e-8)
    np.testing.assert_allclose(np.asarray(out["y_var"]),
                               var + PARAMS["likelihood_variance"], atol=1e-8)


def test_nlml_batched_vmap():
    X, y = make_data(20)
    Xb = jnp.stack([jnp.asarray(X)] * 3)
    yb = jnp.stack([jnp.asarray(y)] * 3)
    mb = jnp.ones((3, 20), dtype=bool)
    pb = jax.tree.map(lambda a: jnp.stack([jnp.asarray(a)] * 3), jx_params())
    out = gpr_math.nlml_batched(pb, Xb, yb, mb)
    assert out.shape == (3,)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out)[0])


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------

def test_softplus_bijector_round_trip():
    b = Softplus(shift=0.1)
    u = jnp.linspace(-5, 5, 11)
    np.testing.assert_allclose(np.asarray(b.inverse(b.forward(u))), np.asarray(u),
                               atol=1e-9)


def test_sigmoid_bijector_round_trip():
    b = Sigmoid(low=jnp.array([0.1, 0.2]), high=jnp.array([1.0, 3.0]))
    u = jnp.array([[-2.0, 0.5], [1.5, -0.3]])
    v = b.forward(u)
    assert np.all(np.asarray(v) > np.array([0.1, 0.2]))
    np.testing.assert_allclose(np.asarray(b.inverse(v)), np.asarray(u), atol=1e-8)


def test_get_bijector_guessing():
    assert isinstance(get_bijector(low=0, high=1), Sigmoid)
    assert isinstance(get_bijector(), Softplus)
    assert isinstance(get_bijector("exp"), type(get_bijector("exp")))


# ---------------------------------------------------------------------------
# batched L-BFGS vs scipy on the GPR NLML
# ---------------------------------------------------------------------------

def _objective(u, X, y, mask):
    """Unconstrained [D+2] vector -> NLML with softplus-positive params."""
    d = X.shape[-1]
    params = {"lengthscales": jax.nn.softplus(u[:d]),
              "kernel_variance": jax.nn.softplus(u[d]),
              "likelihood_variance": jax.nn.softplus(u[d + 1])}
    return gpr_math.nlml(params, X, y, mask)


def test_batched_lbfgs_matches_scipy():
    X, y = make_data(35, d=2, seed=7)
    Xj, yj = jnp.asarray(X), jnp.asarray(y)
    mask = jnp.ones(len(y), dtype=bool)
    u0 = np.zeros(4)

    # scipy reference on the identical objective
    f = jax.jit(lambda u: _objective(u, Xj, yj, mask))
    g = jax.jit(jax.grad(lambda u: _objective(u, Xj, yj, mask)))
    res = scipy.optimize.minimize(lambda u: float(f(jnp.asarray(u))),
                                  u0, jac=lambda u: np.asarray(g(jnp.asarray(u))),
                                  method="L-BFGS-B")

    out = batched_lbfgs(_objective,
                        jnp.asarray(u0)[None, :],
                        args=(Xj[None], yj[None], mask[None]),
                        max_iter=300)
    assert np.isclose(float(out.fun[0]), res.fun, atol=1e-6), \
        (float(out.fun[0]), res.fun)


def test_batched_lbfgs_heterogeneous_batch():
    # 4 experts with different data (via masks) must each reach their own optimum
    rng = np.random.default_rng(11)
    B, N, D = 4, 30, 2
    Xs, ys, masks = [], [], []
    for i in range(B):
        n = 12 + 4 * i
        X, y = make_data(n, d=D, seed=100 + i)
        Xp = np.zeros((N, D)); Xp[:n] = X
        yp = np.zeros(N); yp[:n] = y
        m = np.arange(N) < n
        Xs.append(Xp); ys.append(yp); masks.append(m)
    Xb, yb, mb = map(lambda a: jnp.asarray(np.stack(a)), (Xs, ys, masks))
    u0 = jnp.zeros((B, D + 2))
    out = batched_lbfgs(_objective, u0, args=(Xb, yb, mb), max_iter=300)

    vg = jax.jit(jax.value_and_grad(_objective))
    for i in range(B):
        def fg(u):
            v, g = vg(jnp.asarray(u), Xb[i], yb[i], mb[i])
            return float(v), np.asarray(g)
        res = scipy.optimize.minimize(fg, np.zeros(D + 2), jac=True,
                                      method="L-BFGS-B")
        assert np.isclose(float(out.fun[i]), res.fun, atol=1e-5), \
            f"expert {i}: {float(out.fun[i])} vs {res.fun}"


def _rosen(x):
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)


def test_lbfgs_rosenbrock():
    x0 = jnp.tile(jnp.array([-1.2, 1.0, 0.5]), (2, 1))
    out = batched_lbfgs(_rosen, x0, args=(), max_iter=500)
    np.testing.assert_allclose(np.asarray(out.x), 1.0, atol=1e-5)


def test_pooled_lbfgs_matches_one_shot():
    """Segmented pool with slot refill must reproduce the one-shot batched
    fit: per-iteration math is identical (shared ring pointer is safe because
    refilled slots carry zeroed curvature history)."""
    from gpsat_tpu.models.batched import BatchedGPR

    E, N, D = 10, 48, 2
    rng = np.random.default_rng(11)
    X = rng.uniform(-3, 3, (E, N, D))
    y = np.sin(X[..., 0]) + 0.1 * rng.standard_normal((E, N))
    y = y - y.mean(axis=1, keepdims=True)
    mask = np.ones((E, N), dtype=bool)
    mask[1, 40:] = False
    Xs = np.tile(np.linspace(-2, 2, 4)[None, :, None], (E, 1, D))

    eng = BatchedGPR(coords_dim=D, kernel="Matern32",
                     optim_kwargs={"max_iter": 200})
    base = eng.fit_predict(X, y, mask, Xs=Xs, optimise=True, predict=True)
    pooled = eng.fit_predict_many(X, y, mask, Xs=Xs, optimise=True,
                                  predict=True, slots=4)
    np.testing.assert_array_equal(pooled["converged"], base["converged"])
    np.testing.assert_allclose(pooled["objective"], base["objective"],
                               rtol=1e-8, atol=1e-8)
    for k in base["params"]:
        np.testing.assert_allclose(pooled["params"][k], base["params"][k],
                                   rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(pooled["preds"]["f*"], base["preds"]["f*"],
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(pooled["iterations"], base["iterations"])


def test_fit_predict_many_chunked_fallback():
    """Engines/configs without pool support fall back to chunked sweeps with
    identical results."""
    from gpsat_tpu.models.batched import BatchedGPR

    E, N, D = 6, 32, 1
    rng = np.random.default_rng(3)
    X = rng.uniform(-2, 2, (E, N, D))
    y = np.sin(2 * X[..., 0]) + 0.05 * rng.standard_normal((E, N))
    mask = np.ones((E, N), dtype=bool)
    eng = BatchedGPR(coords_dim=D, kernel="Matern32",
                     optim_kwargs={"max_iter": 100})
    base = eng.fit_predict(X, y, mask, Xs=None, optimise=False, predict=False)
    out = eng.fit_predict_many(X, y, mask, Xs=None, optimise=False,
                               predict=False, slots=4)
    np.testing.assert_allclose(out["objective"], base["objective"],
                               rtol=1e-10)
