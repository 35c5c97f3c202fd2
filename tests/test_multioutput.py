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
