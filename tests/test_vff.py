"""VFF tests.

Key oracle: the collapsed VFF bound is a lower bound of the exact log
marginal likelihood of the separable product-Matern GP, and converges to it
(with matching posterior) as the number of Fourier features grows.
"""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.distance import cdist

from gpsat_tpu.ops import vff as vff_math
from gpsat_tpu.models.vff import VFFModel, resolve_domain


def np_product_matern32(X1, X2, ls, var_per_dim):
    """Separable product of 1-D Matern-3/2 kernels (the VFF prior)."""
    K = np.ones((len(X1), len(X2)))
    for d in range(X1.shape[1]):
        r = np.abs(X1[:, d:d+1] - X2[:, d:d+1].T) * np.sqrt(3.0) / ls[d]
        K = K * var_per_dim[d] * (1 + r) * np.exp(-r)
    return K


def np_nlml_product(X, y, ls, var_per_dim, sn2):
    n = len(y)
    K = np_product_matern32(X, X, ls, var_per_dim) + np.eye(n) * sn2
    L = np.linalg.cholesky(K)
    alpha = np.linalg.solve(L.T, np.linalg.solve(L, y))
    return float(0.5 * y @ alpha + np.log(np.diag(L)).sum()
                 + 0.5 * n * np.log(2 * np.pi))


def np_predict_product(X, y, Xs, ls, var_per_dim, sn2):
    n = len(y)
    K = np_product_matern32(X, X, ls, var_per_dim) + np.eye(n) * sn2
    L = np.linalg.cholesky(K)
    alpha = np.linalg.solve(L.T, np.linalg.solve(L, y))
    Ks = np_product_matern32(X, Xs, ls, var_per_dim)
    mean = Ks.T @ alpha
    v = np.linalg.solve(L, Ks)
    var = np.prod(var_per_dim) - (v * v).sum(0)
    return mean, var


def make_1d(n=60, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(0.5, 5.5, (n, 1))
    y = np.sin(2.0 * X[:, 0]) + 0.1 * rng.standard_normal(n)
    return X, y


PARAMS_1D = {"lengthscales": jnp.asarray([0.7]),
             "kernel_variance": jnp.asarray([0.9]),
             "likelihood_variance": jnp.asarray(0.05)}


def test_vff_bound_and_convergence_1d():
    X, y = make_1d()
    mask = jnp.ones(len(y), dtype=bool)
    a, b = jnp.asarray([0.0]), jnp.asarray([6.0])
    nlml = np_nlml_product(X, y, [0.7], [0.9], 0.05)
    prev = -np.inf
    for m in (4, 8, 16, 32):
        e = float(vff_math.elbo(PARAMS_1D, jnp.asarray(X), jnp.asarray(y),
                                mask, a, b, (m,)))
        assert e <= -nlml + 1e-6, f"m={m}: bound violated {e} > {-nlml}"
        assert e >= prev - 1e-6, f"m={m}: bound not monotone"
        prev = e


def test_vff_predict_converges_to_exact_1d():
    X, y = make_1d()
    Xs = np.linspace(1.0, 5.0, 25)[:, None]
    mask = jnp.ones(len(y), dtype=bool)
    a, b = jnp.asarray([-1.0]), jnp.asarray([7.0])
    out = vff_math.predict(PARAMS_1D, jnp.asarray(X), jnp.asarray(y), mask,
                           jnp.asarray(Xs), a, b, (64,))
    mean, var = np_predict_product(X, y, Xs, [0.7], [0.9], 0.05)
    # VFF variance deficiency decays O(1/m); means converge faster
    np.testing.assert_allclose(np.asarray(out["f*"]), mean, atol=0.05)
    np.testing.assert_allclose(np.asarray(out["f*_var"]), var, atol=0.15)


def test_kuu_matches_numerical_rkhs_oracle():
    """Matern-1/2 Kuu against quadrature of the exact RKHS inner product:
    <f,g>_H = (int f'g' + lam^2 f g)/(2 s2 lam) + (f(a)g(a)+f(b)g(b))/(2 s2)."""
    ls, var = 0.7, 0.9
    lam = 1.0 / ls
    a, b, m = 0.0, 6.0, 5
    om = 2 * np.pi * np.arange(m) / (b - a)
    xs = np.linspace(a, b, 8001)

    def phi(i):
        if i < m:
            return np.cos(om[i] * (xs - a)), -om[i] * np.sin(om[i] * (xs - a))
        j = i - m + 1
        return np.sin(om[j] * (xs - a)), om[j] * np.cos(om[j] * (xs - a))

    M = 2 * m - 1
    Kuu_num = np.zeros((M, M))
    for i in range(M):
        fi, dfi = phi(i)
        for j in range(M):
            fj, dfj = phi(j)
            integral = np.trapezoid(dfi * dfj + lam**2 * fi * fj, xs)
            Kuu_num[i, j] = integral / (2 * var * lam) + \
                (fi[0] * fj[0] + fi[-1] * fj[-1]) / (2 * var)
    Kuu_mine = np.asarray(vff_math.kuu_dense("Matern12", ls, var, a, b, m))
    np.testing.assert_allclose(Kuu_mine, Kuu_num, atol=1e-8)


def test_projection_deficiency_decays():
    """k(x,x) - Kfu Kuu^-1 Kuf diag -> 0 as m grows (O(1/m) for VFF)."""
    ls, var = 0.7, 0.9
    x = np.array([2.2, 3.7])
    defs = []
    for mm in (8, 32, 128):
        Kuu = np.asarray(vff_math.kuu_dense("Matern12", ls, var, 0.0, 6.0, mm))
        Kuf = np.asarray(vff_math.kuf("Matern12", ls, x, 0.0, 6.0, mm))
        approx = Kuf.T @ np.linalg.solve(Kuu, Kuf)
        defs.append(var - np.diag(approx).mean())
    assert defs[1] < defs[0] / 2
    assert defs[2] < defs[1] / 2


def test_vff_2d_bound():
    rng = np.random.default_rng(1)
    X = rng.uniform(0, 4, (50, 2))
    y = np.sin(X[:, 0]) * np.cos(X[:, 1]) + 0.05 * rng.standard_normal(50)
    params = {"lengthscales": jnp.asarray([0.8, 1.0]),
              "kernel_variance": jnp.asarray([0.9, 0.8]),
              "likelihood_variance": jnp.asarray(0.05)}
    mask = jnp.ones(len(y), dtype=bool)
    a, b = jnp.asarray([-0.5, -0.5]), jnp.asarray([4.5, 4.5])
    nlml = np_nlml_product(X, y, [0.8, 1.0], [0.9, 0.8], 0.05)
    e = float(vff_math.elbo(params, jnp.asarray(X), jnp.asarray(y), mask,
                            a, b, (12, 12)))
    assert e <= -nlml + 1e-6
    assert np.isfinite(e)
    # bound tightens with more features
    e2 = float(vff_math.elbo(params, jnp.asarray(X), jnp.asarray(y), mask,
                             a, b, (20, 20)))
    assert e2 >= e - 1e-6


def test_vff_masked_equals_unpadded():
    X, y = make_1d(40)
    n_valid, pad = 30, 40
    Xp = np.zeros((pad, 1)) + 3.0  # in-domain pad values
    Xp[:n_valid] = X[:n_valid]
    yp = np.zeros(pad)
    yp[:n_valid] = y[:n_valid]
    mk = np.arange(pad) < n_valid
    a, b = jnp.asarray([0.0]), jnp.asarray([6.0])
    got = float(vff_math.elbo(PARAMS_1D, jnp.asarray(Xp), jnp.asarray(yp),
                              jnp.asarray(mk), a, b, (12,)))
    want = float(vff_math.elbo(PARAMS_1D, jnp.asarray(X[:n_valid]),
                               jnp.asarray(y[:n_valid]),
                               jnp.ones(n_valid, dtype=bool), a, b, (12,)))
    assert np.isclose(got, want, atol=1e-8), (got, want)


def test_vff_model_class():
    X, y = make_1d(80)
    m = VFFModel(coords=X, obs=y[:, None], obs_mean="local",
                 num_inducing_features=16, domain_size=4.0,
                 expert_loc=np.array([3.0]))
    e0 = m.get_objective_function_value()
    ok = m.optimise_parameters()
    assert ok
    assert m.get_objective_function_value() > e0
    out = m.predict(np.array([[3.0]]))
    for k in ("f*", "f*_var", "y_var", "f_bar"):
        assert k in out
    # prediction near data should be accurate
    truth = np.sin(2.0 * 3.0)
    assert abs(out["f*"][0] + out["f_bar"][0] - truth) < 0.15


def test_resolve_domain_covers_data():
    coords = np.array([[0.0], [10.0]])
    a, b = resolve_domain(coords, np.array([[1.0]]), domain_size=2.0,
                          expert_loc=np.array([5.0]))
    assert a[0] <= 0.0 and b[0] >= 10.0
    a2, b2 = resolve_domain(coords, np.array([[1.0]]), domain_size=20.0,
                            expert_loc=np.array([5.0]))
    np.testing.assert_allclose([a2[0], b2[0]], [-15.0, 25.0])


def test_batched_vff_engine_matches_single_model():
    from gpsat_tpu.models.batched import BatchedVFF
    B, N = 3, 64
    Xb, yb = [], []
    for i in range(B):
        X, y = make_1d(N, seed=30 + i)
        Xb.append(X); yb.append(y - y.mean())
    Xb = np.stack(Xb); yb = np.stack(yb)
    mask = np.ones((B, N), dtype=bool)
    Xs = np.tile(np.linspace(1, 5, 9)[None, :, None], (B, 1, 1))

    engine = BatchedVFF(coords_dim=1, num_inducing_features=16,
                        domain_size=4.0, optim_kwargs={"max_iter": 300})
    engine._expert_locs_scaled = np.full((B, 1), 3.0)
    out = engine.fit_predict(Xb, yb, mask, Xs=Xs, optimise=True, predict=True)
    assert np.isfinite(out["objective"]).all()
    assert np.isfinite(out["preds"]["f*"]).all()
    assert out["params"]["kernel_variance"].shape == (B, 1)

    m = VFFModel(coords=Xb[0], obs=yb[0][:, None], num_inducing_features=16,
                 domain_size=4.0, expert_loc=np.array([3.0]))
    m.optimise_parameters()
    assert np.isclose(m.get_objective_function_value(), out["objective"][0],
                      rtol=1e-3, atol=0.05), \
        (m.get_objective_function_value(), out["objective"][0])


def test_batched_vff_pooled_matches_one_shot():
    """The device-resident L-BFGS pool must reproduce the one-shot batched
    VFF fit: per-expert box domains ride along as pool args, objective sign
    flips once in _pool_finalize (tolerances are optimiser-level; see the
    SGPR pool test for why)."""
    from gpsat_tpu.models.batched import BatchedVFF
    E, N = 7, 64
    Xb, yb = [], []
    for i in range(E):
        X, y = make_1d(N, seed=40 + i)
        Xb.append(X); yb.append(y - y.mean())
    Xb = np.stack(Xb); yb = np.stack(yb)
    mask = np.ones((E, N), dtype=bool)
    mask[3, 50:] = False
    Xs = np.tile(np.linspace(1, 5, 9)[None, :, None], (E, 1, 1))

    engine = BatchedVFF(coords_dim=1, num_inducing_features=16,
                        domain_size=4.0, optim_kwargs={"max_iter": 300})
    engine._expert_locs_scaled = np.full((E, 1), 3.0)
    base = engine.fit_predict(Xb, yb, mask, Xs=Xs, optimise=True,
                              predict=True)
    assert engine._pool_supported(True)
    pooled = engine.fit_predict_many(Xb, yb, mask, Xs=Xs, optimise=True,
                                     predict=True, slots=3)
    np.testing.assert_array_equal(pooled["converged"], base["converged"])
    conv = np.asarray(base["converged"])
    assert conv.any()
    np.testing.assert_allclose(pooled["objective"][conv],
                               base["objective"][conv], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(pooled["objective"], base["objective"],
                               atol=0.05)
    for k in base["params"]:
        np.testing.assert_allclose(pooled["params"][k][conv],
                                   base["params"][k][conv],
                                   rtol=1e-2, atol=1e-4)
    np.testing.assert_allclose(pooled["preds"]["f*"][conv],
                               base["preds"]["f*"][conv],
                               rtol=1e-3, atol=1e-4)


def test_batched_asvgp_pooled_matches_one_shot():
    """Same pool-vs-one-shot identity for the ASVGP engine (B-spline
    features share the VFF pool hooks via self._math)."""
    from gpsat_tpu.models.batched import BatchedASVGP
    E, N = 5, 64
    Xb, yb = [], []
    for i in range(E):
        X, y = make_1d(N, seed=60 + i)
        Xb.append(X); yb.append(y - y.mean())
    Xb = np.stack(Xb); yb = np.stack(yb)
    mask = np.ones((E, N), dtype=bool)
    Xs = np.tile(np.linspace(1, 5, 9)[None, :, None], (E, 1, 1))

    engine = BatchedASVGP(coords_dim=1, num_inducing_features=16,
                          domain_size=4.0, optim_kwargs={"max_iter": 300})
    engine._expert_locs_scaled = np.full((E, 1), 3.0)
    base = engine.fit_predict(Xb, yb, mask, Xs=Xs, optimise=True,
                              predict=True)
    assert engine._pool_supported(True)
    pooled = engine.fit_predict_many(Xb, yb, mask, Xs=Xs, optimise=True,
                                     predict=True, slots=2)
    np.testing.assert_array_equal(pooled["converged"], base["converged"])
    conv = np.asarray(base["converged"])
    np.testing.assert_allclose(pooled["objective"][conv],
                               base["objective"][conv], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(pooled["objective"], base["objective"],
                               atol=0.05)
    np.testing.assert_allclose(pooled["preds"]["f*"][conv],
                               base["preds"]["f*"][conv],
                               rtol=1e-3, atol=1e-4)


def test_vff_orchestrated_run(tmp_path):
    import pandas as pd
    from gpsat_tpu.local_experts import LocalExpertOI, get_results_from_h5file
    rng = np.random.default_rng(9)
    n = 400
    df = pd.DataFrame({"x": rng.uniform(-50, 50, n),
                       "y": rng.uniform(-50, 50, n), "t": 0.0})
    df["z"] = np.sin(df["x"] / 15) + 0.05 * rng.standard_normal(n)
    eloc = pd.DataFrame({"x": [0.0], "y": [0.0], "t": [0.0]})
    locexp = LocalExpertOI(
        expert_loc_config={"source": eloc},
        data_config={"data_source": df, "obs_col": "z",
                     "coords_col": ["x", "y"],
                     "local_select": [{"col": ["x", "y"], "comp": "<",
                                       "val": 60.0}]},
        model_config={"oi_model": "VFFModel",
                      "init_params": {"coords_scale": [15, 15],
                                      "num_inducing_features": 8,
                                      "domain_size": 80.0}},
        pred_loc_config={"method": "expert_loc"})
    store = str(tmp_path / "vff.h5")
    locexp.run(store_path=store, optimise=True, check_config_compatible=False,
               verbose=False)
    dfs, _ = get_results_from_h5file(store)
    assert "kernel_variance" in dfs
    # per-dim variance table has two components
    assert set(dfs["kernel_variance"]["_dim_0"]) == {0, 1}
    pred = dfs["preds"]
    assert abs(pred["f*"].iloc[0] + pred["f_bar"].iloc[0] - np.sin(0)) < 0.25


def test_vff_f32_stays_f32():
    """f32 inputs must NOT promote to f64 anywhere in the bound/predict
    (under jax_enable_x64 a bare jnp.arange/jnp.ones is f64 and one strong
    f64 leaf drags the whole program up — ~100x emulation on TPU, and the
    per-dim [2m-1, 2m-1] f64 LU does not even compile on v5e)."""
    X, y = make_1d(40)
    f32 = jnp.float32
    params = {"lengthscales": jnp.asarray([0.5], f32),
              "kernel_variance": jnp.asarray([1.0], f32),
              "likelihood_variance": f32(0.1)}
    Xf = jnp.asarray(X, f32)
    yf = jnp.asarray(y, f32)
    mask = jnp.ones(Xf.shape[0], bool)
    a = jnp.asarray([0.0], f32)
    b = jnp.asarray([6.0], f32)
    val = vff_math.elbo(params, Xf, yf, mask, a, b, (8,), "Matern32", 1e-6)
    assert val.dtype == jnp.float32
    pr = vff_math.predict(params, Xf, yf, mask, Xf[:5], a, b, (8,),
                          "Matern32", 1e-6)
    assert all(v.dtype == jnp.float32 for v in pr.values())
