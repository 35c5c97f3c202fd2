"""Multi-output forward-model GPR tests.

Key oracle: with P = L = Q = 1, H = [[1]], W = [[1]], R = [[sn2]] the model
IS exact single-output GPR — marginal likelihood and posterior must match
gpsat_tpu.ops.gpr exactly.
"""

import numpy as np
import jax.numpy as jnp

from gpsat_tpu.ops import gpr_math
from gpsat_tpu.ops import multioutput as mo
from gpsat_tpu.models.multioutput import MultioutputGPRModel


def make_data(n=30, d=2, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-2, 2, (n, d))
    f = np.sin(X[:, 0]) + 0.5 * np.cos(2 * X[:, 1])
    return X, f


def test_reduces_to_single_output_gpr():
    X, f = make_data()
    rng = np.random.default_rng(1)
    y = f + 0.1 * rng.standard_normal(len(f))
    sn2 = 0.05
    p_mo = {"lengthscales": jnp.asarray([[0.8, 1.2]]),
            "kernel_variance": jnp.asarray([0.7])}
    p_gpr = {"lengthscales": jnp.asarray([0.8, 1.2]),
             "kernel_variance": jnp.asarray(0.7),
             "likelihood_variance": jnp.asarray(sn2)}
    W = jnp.eye(1); H = jnp.eye(1); R = jnp.asarray([[sn2]])
    m = jnp.ones(len(y), dtype=bool)
    Xj, Yj = jnp.asarray(X), jnp.asarray(y)[:, None]

    lml = float(mo.log_marginal_likelihood(p_mo, W, H, R, Xj, Yj, m))
    nlml = float(gpr_math.nlml(p_gpr, Xj, jnp.asarray(y), m))
    assert np.isclose(lml, -nlml, atol=1e-8), (lml, -nlml)

    Xs = jnp.asarray(make_data(9, seed=5)[0])
    mean, var = mo.predict_f(p_mo, W, H, R, Xj, Yj, m, Xs)
    exact = gpr_math.predict(p_gpr, Xj, jnp.asarray(y), m, Xs)
    np.testing.assert_allclose(np.asarray(mean)[:, 0],
                               np.asarray(exact["f*"]), atol=1e-8)
    np.testing.assert_allclose(np.asarray(var)[:, 0],
                               np.asarray(exact["f*_var"]), atol=1e-8)


def test_two_instrument_fusion_reduces_variance():
    """Two instruments observing the same latent field (H=[[1],[1]]) beat one."""
    X, f = make_data(25)
    rng = np.random.default_rng(2)
    Y2 = np.stack([f + 0.1 * rng.standard_normal(len(f)),
                   f + 0.1 * rng.standard_normal(len(f))], axis=1)
    p = {"lengthscales": jnp.asarray([[0.8, 1.2]]),
         "kernel_variance": jnp.asarray([0.7])}
    W = jnp.eye(1)
    H2 = jnp.asarray([[1.0], [1.0]])
    R2 = jnp.asarray([[0.01, 0.0], [0.0, 0.01]])
    H1 = jnp.eye(1); R1 = jnp.asarray([[0.01]])
    m = jnp.ones(len(f), dtype=bool)
    Xj = jnp.asarray(X)
    Xs = jnp.asarray(make_data(7, seed=9)[0])

    _, var2 = mo.predict_f(p, W, H2, R2, Xj, jnp.asarray(Y2), m, Xs)
    _, var1 = mo.predict_f(p, W, H1, R1, Xj, jnp.asarray(Y2[:, :1]), m, Xs)
    assert (np.asarray(var2) <= np.asarray(var1) + 1e-10).all()


def test_masked_lml_equals_unpadded():
    X, f = make_data(20)
    rng = np.random.default_rng(3)
    Y = (f + 0.1 * rng.standard_normal(len(f)))[:, None]
    p = {"lengthscales": jnp.asarray([[0.8, 1.2]]),
         "kernel_variance": jnp.asarray([0.7])}
    W = jnp.eye(1); H = jnp.eye(1); R = jnp.asarray([[0.05]])
    n_valid, pad = 14, 20
    Xp = np.zeros((pad, 2)); Xp[:n_valid] = X[:n_valid]
    Yp = np.zeros((pad, 1)); Yp[:n_valid] = Y[:n_valid]
    mk = np.arange(pad) < n_valid
    got = float(mo.log_marginal_likelihood(p, W, H, R, jnp.asarray(Xp),
                                           jnp.asarray(Yp), jnp.asarray(mk)))
    want = float(mo.log_marginal_likelihood(
        p, W, H, R, jnp.asarray(X[:n_valid]), jnp.asarray(Y[:n_valid]),
        jnp.ones(n_valid, dtype=bool)))
    assert np.isclose(got, want, atol=1e-8), (got, want)


def test_multioutput_model_class():
    X, f = make_data(40)
    rng = np.random.default_rng(4)
    # instrument 1 sees f, instrument 2 sees 2f with more noise
    Y = np.stack([f + 0.05 * rng.standard_normal(len(f)),
                  2 * f + 0.2 * rng.standard_normal(len(f))], axis=1)
    m = MultioutputGPRModel(coords=X, obs=Y, num_latent_gps=1,
                            H=np.array([[1.0], [2.0]]),
                            R=np.diag([0.05**2, 0.2**2]))
    nll0 = m.get_objective_function_value()
    ok = m.optimise_parameters()
    assert ok
    assert m.get_objective_function_value() < nll0
    out = m.predict(X[:5])
    assert out["f*"].shape == (5, 1)
    assert out["y*"].shape == (5, 2)
    # latent recovery at training points
    np.testing.assert_allclose(out["f*"][:, 0], f[:5], atol=0.15)
    # observation-space mean respects H
    np.testing.assert_allclose(out["y*"][:, 1], 2 * out["f*"][:, 0], atol=1e-6)


# ---------------------------------------------------------------------------
# Multioutput SVGP (forward-model likelihoods)
# ---------------------------------------------------------------------------

def test_mosvgp_reduces_to_single_output_svgp():
    """Q = L = P = 1, H = W = [[1]]: the multioutput SVGP ELBO equals the
    single-output whitened SVGP ELBO at the same (Z, q)."""
    import jax
    from gpsat_tpu.ops import svgp as svgp_math
    X, f = make_data(30)
    rng = np.random.default_rng(3)
    y = f + 0.1 * rng.standard_normal(len(f))
    sn2 = 0.05
    M = 10
    Z = X[rng.permutation(len(y))[:M]]
    qm = rng.standard_normal(M) * 0.3
    qs = np.tril(rng.standard_normal((M, M)) * 0.05 + np.eye(M))

    p_mo = {"lengthscales": jnp.asarray([[0.8, 1.2]]),
            "kernel_variance": jnp.asarray([0.7])}
    p_1d = {"lengthscales": jnp.asarray([0.8, 1.2]),
            "kernel_variance": jnp.asarray(0.7),
            "likelihood_variance": jnp.asarray(sn2)}
    m = jnp.ones(len(y), dtype=bool)
    zm = jnp.ones(M, dtype=bool)
    jit = 1e-8

    got = float(mo.svgp_elbo(
        p_mo, jnp.eye(1), jnp.asarray([[sn2]]), jnp.asarray(qm)[:, None],
        jnp.asarray(qs)[None], jnp.asarray(X), jnp.asarray(y)[:, None], m,
        jnp.asarray(Z), zm, H=jnp.eye(1), jitter=jit))
    want = float(svgp_math.elbo(
        p_1d, jnp.asarray(qm), jnp.asarray(qs), jnp.asarray(X),
        jnp.asarray(y), m, jnp.asarray(Z), zm, jitter=jit))
    assert np.isclose(got, want, atol=1e-8), (got, want)

    # marginals agree too
    Xs = jnp.asarray(make_data(7, seed=9)[0])
    mean, var = mo.svgp_predict_f(p_mo, jnp.eye(1), jnp.asarray(qm)[:, None],
                                  jnp.asarray(qs)[None], jnp.asarray(Z), zm,
                                  Xs, jitter=jit)
    m1, v1 = svgp_math.marginals(p_1d, jnp.asarray(qm), jnp.asarray(qs),
                                 jnp.asarray(Z), zm, Xs, jitter=jit)
    np.testing.assert_allclose(np.asarray(mean)[:, 0], np.asarray(m1),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(var)[:, 0], np.asarray(v1),
                               atol=1e-8)


def test_mosvgp_mc_matches_analytic_linear():
    """The MC (nonlinear-likelihood) estimator converges to the analytic
    linear variational expectation when h is linear."""
    import jax
    X, f = make_data(12)
    rng = np.random.default_rng(4)
    Q, L, P = 2, 2, 2
    W = jnp.asarray(rng.standard_normal((L, Q)) * 0.7)
    H = jnp.asarray([[1.0, 0.3], [0.0, 1.0]])
    R = jnp.asarray([[0.05, 0.01], [0.01, 0.08]])
    Y = jnp.asarray(rng.standard_normal((len(f), P)))
    g_mean = jnp.asarray(rng.standard_normal((len(f), Q)))
    g_var = jnp.asarray(rng.uniform(0.1, 0.5, (len(f), Q)))

    analytic = mo.linear_var_exp(g_mean @ W.T, g_var, W, H, R, Y)
    h = lambda x, F: F @ H.T
    mc = mo.nonlinear_var_exp(h, jnp.asarray(X), g_mean, g_var, W, R, Y,
                              jax.random.PRNGKey(0), 40000)
    np.testing.assert_allclose(np.asarray(mc), np.asarray(analytic),
                               rtol=0.02, atol=0.02)


def test_mosvgp_elbo_bounds_exact_lml():
    """Linear-likelihood SVGP ELBO with Z = X and optimised q approaches the
    exact multioutput marginal likelihood (tight-bound identity)."""
    import jax
    import optax
    X, f = make_data(20)
    rng = np.random.default_rng(5)
    Q, L, P = 1, 2, 2
    W = jnp.asarray([[1.0], [0.6]])
    H = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    R = jnp.asarray([[0.04, 0.0], [0.0, 0.09]])
    Y = jnp.asarray(np.stack([f, 0.6 * f], 1)
                    + 0.15 * rng.standard_normal((len(f), P)))
    p = {"lengthscales": jnp.asarray([[0.9, 1.1]]),
         "kernel_variance": jnp.asarray([0.8])}
    m = jnp.ones(len(f), dtype=bool)
    Z = jnp.asarray(X)
    zm = jnp.ones(len(f), dtype=bool)
    Mi = len(f)

    lml = float(mo.log_marginal_likelihood(p, W, H, R, jnp.asarray(X), Y, m,
                                           jitter=1e-10))

    theta = {"qm": jnp.zeros((Mi, Q)),
             "qs": jnp.broadcast_to(jnp.eye(Mi), (Q, Mi, Mi))}
    loss = lambda t: -mo.svgp_elbo(p, W, R, t["qm"], t["qs"], jnp.asarray(X),
                                   Y, m, Z, zm, H=H, jitter=1e-10)
    opt = optax.adam(5e-2)
    state = opt.init(theta)

    @jax.jit
    def step(theta, state):
        v, g = jax.value_and_grad(loss)(theta)
        u, state = opt.update(g, state)
        return optax.apply_updates(theta, u), state, v

    v = None
    for _ in range(1500):
        theta, state, v = step(theta, state)
    achieved = -float(v)
    assert achieved <= lml + 1e-6
    assert achieved > lml - 0.1, (achieved, lml)


def test_mosvgp_masked_equals_unpadded():
    import jax
    X, f = make_data(24)
    rng = np.random.default_rng(6)
    n_valid, pad, Mv, Mpad = 16, 24, 8, 12
    Q, L, P = 2, 2, 2
    W = jnp.asarray(rng.standard_normal((L, Q)))
    H = jnp.asarray(rng.standard_normal((P, L)))
    R = jnp.asarray([[0.05, 0.0], [0.0, 0.05]])
    Y = rng.standard_normal((24, P))
    Z = X[rng.permutation(24)[:Mv]]
    qm = rng.standard_normal((Mv, Q)) * 0.3
    qs = np.stack([np.tril(rng.standard_normal((Mv, Mv)) * 0.05 + np.eye(Mv))
                   for _ in range(Q)])
    p = {"lengthscales": jnp.asarray(rng.uniform(0.5, 1.5, (Q, 2))),
         "kernel_variance": jnp.asarray([0.7, 1.1])}

    Xp = np.zeros((pad, 2)); Xp[:n_valid] = X[:n_valid]
    Yp = np.zeros((pad, P)); Yp[:n_valid] = Y[:n_valid]
    mk = np.arange(pad) < n_valid
    Zp = np.zeros((Mpad, 2)); Zp[:Mv] = Z
    zmp = np.arange(Mpad) < Mv
    qmp = np.zeros((Mpad, Q)); qmp[:Mv] = qm
    qsp = np.broadcast_to(np.eye(Mpad), (Q, Mpad, Mpad)).copy()
    qsp[:, :Mv, :Mv] = qs

    got = float(mo.svgp_elbo(p, W, R, jnp.asarray(qmp), jnp.asarray(qsp),
                             jnp.asarray(Xp), jnp.asarray(Yp),
                             jnp.asarray(mk), jnp.asarray(Zp),
                             jnp.asarray(zmp), H=H))
    want = float(mo.svgp_elbo(p, W, R, jnp.asarray(qm), jnp.asarray(qs),
                              jnp.asarray(X[:n_valid]),
                              jnp.asarray(Y[:n_valid]),
                              jnp.ones(n_valid, dtype=bool), jnp.asarray(Z),
                              jnp.ones(Mv, dtype=bool), H=H))
    assert np.isclose(got, want, atol=1e-8), (got, want)


def test_mosvgp_model_class_linear():
    from gpsat_tpu.models.multioutput import MultioutputSVGPModel
    X, f = make_data(50)
    rng = np.random.default_rng(7)
    Y = np.stack([f, f], 1) + 0.1 * rng.standard_normal((len(f), 2))
    m = MultioutputSVGPModel(coords=X, obs=Y, num_latent_gps=1,
                             W=np.array([[1.0], [1.0]]),
                             H=np.eye(2), R=0.02 * np.eye(2),
                             num_inducing_points=20)
    e0 = m.get_objective_function_value()
    ok = m.optimise_parameters(max_iter=600, learning_rate=5e-2)
    e1 = m.get_objective_function_value()
    assert e1 > e0
    out = m.predict(np.array([[0.0, 0.0]]))
    assert out["f*"].shape == (1, 2)
    assert "y*" in out and out["y_var"].shape == (1, 2)
    assert np.isfinite(out["f*_var"]).all()


def test_mosvgp_model_class_nonlinear():
    """Nonlinear forward model h(x, f) = [f1^3/3 + f1, f2] (invertible-ish);
    the MC likelihood should recover a sensible latent field."""
    import jax.numpy as jnpp
    from gpsat_tpu.models.multioutput import MultioutputSVGPModel
    X, f = make_data(40)
    rng = np.random.default_rng(8)
    F = np.stack([f, 0.5 * np.cos(X[:, 0])], 1)
    def h_np(F):
        return np.stack([F[..., 0] ** 3 / 3 + F[..., 0], F[..., 1]], -1)
    Y = h_np(F) + 0.05 * rng.standard_normal((len(f), 2))

    def h(Xq, Fq):
        return jnpp.stack([Fq[..., 0] ** 3 / 3 + Fq[..., 0], Fq[..., 1]], -1)

    m = MultioutputSVGPModel(coords=X, obs=Y, num_latent_gps=2,
                             forward_model=h, R=0.05 * np.eye(2),
                             num_inducing_points=20, num_mc_samples=64)
    e0 = m.get_objective_function_value()
    m.optimise_parameters(max_iter=400, learning_rate=2e-2,
                          persistence=200)
    e1 = m.get_objective_function_value()
    assert e1 > e0
    out = m.predict(X[:5])
    assert out["f*"].shape == (5, 2)
    assert "y*" not in out   # no closed-form obs posterior for nonlinear h
