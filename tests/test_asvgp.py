"""ASVGP (B-spline inducing features) tests.

Oracles: (1) the RKHS inner product itself is validated against the
reproducing property <k(x,.), k(y,.)>_H = k(x, y) via quadrature; (2) Kuu from
ops/asvgp is checked against an independent numpy quadrature of the spline
Gram; (3) the collapsed bound must lower-bound the exact masked NLML and
converge to it as the basis grows (reference semantics: the external ASVGP
GPR_kron used by GPSat/models/asvgp_model.py:150).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gpsat_tpu.ops import asvgp as asvgp_math
from gpsat_tpu.ops import gpr as gpr_math
from gpsat_tpu.models.asvgp import ASVGPModel

KERNELS = ["Matern12", "Matern32", "Matern52"]
LAM = {"Matern12": 1.0, "Matern32": np.sqrt(3.0), "Matern52": np.sqrt(5.0)}
PREF_C = {"Matern12": 2.0, "Matern32": 4.0, "Matern52": 16.0 / 3.0}

PARAMS_1D = {"lengthscales": jnp.asarray([1.2]),
             "kernel_variance": jnp.asarray([1.5]),
             "likelihood_variance": jnp.asarray(0.05)}


def make_1d(n=60, seed=0):
    rng = np.random.default_rng(seed)
    X = np.sort(rng.uniform(0.5, 5.5, n))[:, None]
    y = np.sin(2.0 * X[:, 0]) + 0.1 * rng.standard_normal(n)
    return X, y


def matern_k(kernel, lam, s2):
    if kernel == "Matern12":
        return lambda r: s2 * np.exp(-lam * r)
    if kernel == "Matern32":
        return lambda r: s2 * (1 + lam * r) * np.exp(-lam * r)
    return lambda r: s2 * (1 + lam * r + (lam * r) ** 2 / 3) * np.exp(-lam * r)


def _np_inner(kernel, lam, s2, fs, gs, a, b, t):
    """RKHS inner product on [a,b] from sampled derivative arrays.

    fs/gs: lists of arrays f^(r)(t); independently-coded oracle (trapezoid
    quadrature + boundary forms)."""
    p = {"Matern12": 0, "Matern32": 1, "Matern52": 2}[kernel]
    from math import comb
    pref = 1.0 / (PREF_C[kernel] * lam ** (2 * p + 1) * s2)
    integ = sum(comb(p + 1, r) * lam ** (2 * (p + 1 - r)) * fs[r] * gs[r]
                for r in range(p + 2))
    I = np.trapezoid(integ, t)
    if kernel == "Matern12":
        Q = np.array([[0.5]]) / s2
    elif kernel == "Matern32":
        Q = np.array([[0.5, 1 / (4 * lam)],
                      [1 / (4 * lam), 1 / (2 * lam ** 2)]]) / s2
    else:
        Q = np.array([[9 / 16, 9 / (16 * lam), 3 / (16 * lam ** 2)],
                      [9 / (16 * lam), 3 / (2 * lam ** 2), 9 / (16 * lam ** 3)],
                      [3 / (16 * lam ** 2), 9 / (16 * lam ** 3),
                       9 / (16 * lam ** 4)]]) / s2
    nj = Q.shape[0]
    sign = np.array([(-1.0) ** r for r in range(nj)])
    Qa = Q * np.outer(sign, sign)
    ja = np.array([f[0] for f in fs[:nj]])
    jb = np.array([f[-1] for f in fs[:nj]])
    ka = np.array([g[0] for g in gs[:nj]])
    kb = np.array([g[-1] for g in gs[:nj]])
    return pref * I + ja @ Qa @ ka + jb @ Q @ kb


@pytest.mark.parametrize("kernel", KERNELS)
def test_rkhs_inner_product_reproduces_kernel(kernel):
    """<k(x,.), k(y,.)>_H == k(x,y): validates the boundary quadratic forms
    the Kuu assembly is built on."""
    lam, s2 = 1.7, 2.3
    a, b = -1.0, 2.0
    t = np.linspace(a, b, 400001)
    kf = matern_k(kernel, lam, s2)

    def jets(x):
        u = t - x
        r = np.abs(u)
        e = np.exp(-lam * r)
        if kernel == "Matern12":
            return [s2 * e, s2 * (-lam) * np.sign(u) * e]
        if kernel == "Matern32":
            return [s2 * (1 + lam * r) * e,
                    s2 * (-lam ** 2) * u * e,
                    s2 * lam ** 2 * (lam * r - 1) * e]
        return [s2 * (1 + lam * r + (lam * r) ** 2 / 3) * e,
                -s2 * lam ** 2 / 3 * e * (u + lam * r * u),
                -s2 * lam ** 2 / 3 * e * (1 + lam * r - lam ** 2 * u ** 2),
                -s2 * lam ** 4 / 3 * e * (lam * u * r - 3 * u)]

    for (x, yv) in [(-0.5, 1.2), (0.3, 0.3), (-0.9, 1.9)]:
        got = _np_inner(kernel, lam, s2, jets(x), jets(yv), a, b, t)
        want = kf(abs(x - yv))
        # Matern12 tolerance is looser: the |t-x| kink limits trapezoid order
        tol = 1e-4 if kernel == "Matern12" else 1e-8
        assert abs(got - want) / abs(want) < tol, (kernel, x, yv, got, want)


@pytest.mark.parametrize("kernel", KERNELS)
def test_kuu_matches_numerical_rkhs_oracle(kernel):
    ls, var, a, b, m = 0.7, 2.3, -1.0, 2.0, 12
    p = asvgp_math.spline_degree(kernel)
    lam = LAM[kernel] / ls
    ni = m - p
    h = (b - a) / ni
    t = np.linspace(a, b, 200001)
    j = np.arange(m)
    u = (t - a) / h
    fs_all = [asvgp_math.cardinal_bspline_deriv(
        p, u[:, None] - j[None, :] + p, r, xp=np) / h ** r
        for r in range(p + 1)]
    want = np.empty((m, m))
    for i in range(m):
        for k in range(m):
            want[i, k] = _np_inner(kernel, lam, var,
                                   [f[:, i] for f in fs_all],
                                   [f[:, k] for f in fs_all], a, b, t)
    got = np.asarray(asvgp_math.kuu_dense(kernel, ls, var, a, b, m))
    err = np.max(np.abs(got - want)) / np.max(np.abs(want))
    assert err < 1e-4, err
    # SPD + banded: |i-j| > degree entries vanish
    assert np.linalg.eigvalsh(got).min() > 0
    band = np.abs(j[:, None] - j[None, :]) > p
    assert np.max(np.abs(got[band])) < 1e-10 * np.max(np.abs(got))


@pytest.mark.parametrize("kernel", KERNELS)
def test_asvgp_bound_and_convergence_1d(kernel):
    X, y = make_1d(80)
    mask = jnp.ones(len(y), dtype=bool)
    a, b = jnp.asarray([0.0]), jnp.asarray([6.0])
    pv = PARAMS_1D
    ps = {"lengthscales": pv["lengthscales"],
          "kernel_variance": pv["kernel_variance"][0],
          "likelihood_variance": pv["likelihood_variance"]}
    nlml = float(gpr_math.nlml(ps, jnp.asarray(X), jnp.asarray(y), mask,
                               kernel))
    prev = -np.inf
    # B1 splines (Matern12) converge at first order in the knot spacing —
    # push to finer bases and accept a wider final gap there
    ms_seq, final_gap = ((32, 128, 512), 5.0) if kernel == "Matern12" \
        else ((8, 32, 128), 2.0)
    for m in ms_seq:
        el = float(asvgp_math.elbo(pv, jnp.asarray(X), jnp.asarray(y), mask,
                                   a, b, (m,), kernel))
        assert el <= -nlml + 1e-6
        assert el > prev
        prev = el
    assert -nlml - prev < final_gap   # fine bases approach the exact evidence


def test_asvgp_masked_equals_unpadded():
    X, y = make_1d(40)
    n_valid, pad = 30, 40
    Xp = np.zeros((pad, 1)) + 3.0
    Xp[:n_valid] = X[:n_valid]
    yp = np.zeros(pad)
    yp[:n_valid] = y[:n_valid]
    mk = np.arange(pad) < n_valid
    a, b = jnp.asarray([0.0]), jnp.asarray([6.0])
    got = float(asvgp_math.elbo(PARAMS_1D, jnp.asarray(Xp), jnp.asarray(yp),
                                jnp.asarray(mk), a, b, (12,)))
    want = float(asvgp_math.elbo(PARAMS_1D, jnp.asarray(X[:n_valid]),
                                 jnp.asarray(y[:n_valid]),
                                 jnp.ones(n_valid, dtype=bool), a, b, (12,)))
    assert np.isclose(got, want, atol=1e-8), (got, want)


def test_asvgp_model_class():
    X, y = make_1d(80)
    m = ASVGPModel(coords=X, obs=y[:, None], obs_mean="local",
                   num_inducing_features=24, domain_size=4.0,
                   expert_loc=np.array([3.0]))
    e0 = m.get_objective_function_value()
    ok = m.optimise_parameters()
    assert ok
    assert m.get_objective_function_value() > e0
    out = m.predict(np.array([[3.0]]))
    for k in ("f*", "f*_var", "y_var", "f_bar"):
        assert k in out
    truth = np.sin(2.0 * 3.0)
    assert abs(out["f*"][0] + out["f_bar"][0] - truth) < 0.15


def test_batched_asvgp_engine_matches_single_model():
    from gpsat_tpu.models.batched import BatchedASVGP
    B, N = 3, 64
    Xb, yb = [], []
    for i in range(B):
        X, y = make_1d(N, seed=30 + i)
        Xb.append(X); yb.append(y - y.mean())
    Xb = np.stack(Xb); yb = np.stack(yb)
    mask = np.ones((B, N), dtype=bool)
    Xs = np.tile(np.linspace(1, 5, 9)[None, :, None], (B, 1, 1))

    engine = BatchedASVGP(coords_dim=1, num_inducing_features=24,
                          domain_size=4.0, optim_kwargs={"max_iter": 300})
    engine._expert_locs_scaled = np.full((B, 1), 3.0)
    out = engine.fit_predict(Xb, yb, mask, Xs=Xs, optimise=True, predict=True)
    assert np.isfinite(out["objective"]).all()
    assert np.isfinite(out["preds"]["f*"]).all()
    assert out["params"]["kernel_variance"].shape == (B, 1)

    m = ASVGPModel(coords=Xb[0], obs=yb[0][:, None],
                   num_inducing_features=24, domain_size=4.0,
                   expert_loc=np.array([3.0]))
    m.optimise_parameters()
    assert np.isclose(m.get_objective_function_value(), out["objective"][0],
                      rtol=1e-3, atol=0.05), \
        (m.get_objective_function_value(), out["objective"][0])


def test_asvgp_orchestrated_run(tmp_path):
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
        model_config={"oi_model": "GPflowASVGPModel",
                      "init_params": {"coords_scale": [15, 15],
                                      "num_inducing_features": 10,
                                      "domain_size": 80.0}},
        pred_loc_config={"method": "expert_loc"})
    store = str(tmp_path / "asvgp.h5")
    locexp.run(store_path=store, optimise=True, check_config_compatible=False,
               verbose=False)
    dfs, _ = get_results_from_h5file(store)
    assert "preds" in dfs and len(dfs["preds"]) == 1
    assert np.isfinite(dfs["preds"]["f*"]).all()


def test_asvgp_f32_stays_f32():
    """f32 inputs must not promote to f64 (the _LAM_MULT np.sqrt scalar was
    a STRONG f64 type and promoted lam — and every Kuu block — under x64)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    f32 = jnp.float32
    X = jnp.asarray(rng.uniform(0.5, 5.5, (40, 1)), f32)
    y = jnp.asarray(np.sin(np.asarray(X[:, 0])), f32)
    mask = jnp.ones(40, bool)
    a = jnp.asarray([0.0], f32)
    b = jnp.asarray([6.0], f32)
    params = {"lengthscales": jnp.asarray([0.5], f32),
              "kernel_variance": jnp.asarray([1.0], f32),
              "likelihood_variance": f32(0.1)}
    val = asvgp_math.elbo(params, X, y, mask, a, b, (10,), "Matern32", 1e-6)
    assert val.dtype == jnp.float32
    pr = asvgp_math.predict(params, X, y, mask, X[:5], a, b, (10,),
                            "Matern32", 1e-6)
    assert all(v.dtype == jnp.float32 for v in pr.values())
