"""Fused Pallas NLML value kernel vs the XLA reference path (interpret mode
on CPU; the real lowering is exercised on TPU by tpu_stuff/pallas_value_bench
and by the batched engine when running on device)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gpsat_tpu.ops.gpr import nlml
from gpsat_tpu.ops.pallas_gpr import nlml_value_batched

KERNELS = ["Matern32", "Matern12", "Matern52", "RBF", "Exponential"]


def make_case(B=5, N=200, D=3, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-4, 4, (B, N, D))
    y = rng.standard_normal((B, N))
    mask = np.ones((B, N), bool)
    mask[0, 150:] = False
    mask[3, 10:] = False          # nearly-empty expert
    params = {"lengthscales": rng.uniform(0.5, 3, (B, D)),
              "kernel_variance": rng.uniform(0.5, 2, B),
              "likelihood_variance": rng.uniform(0.01, 0.2, B)}
    return X, y, mask, params


@pytest.mark.parametrize("kernel", KERNELS)
def test_pallas_value_matches_nlml(kernel):
    X, y, mask, params = make_case()
    got = np.asarray(nlml_value_batched(
        {k: jnp.asarray(v) for k, v in params.items()},
        X, y, mask.astype(float), kernel, 1e-6, interpret=True))
    want = np.asarray(jax.vmap(
        lambda p, x, yy, mm: nlml(p, x, yy, mm, kernel, 1e-6))(
        {k: jnp.asarray(v, jnp.float32) for k, v in params.items()},
        jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32),
        jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-4)


def test_pallas_value_n_multiple_of_panel():
    # exact panel multiple (no N padding) + B not a multiple of the group
    X, y, mask, params = make_case(B=7, N=256, D=2, seed=1)
    got = np.asarray(nlml_value_batched(
        {k: jnp.asarray(v) for k, v in params.items()},
        X, y, mask.astype(float), "Matern32", 1e-6, interpret=True))
    want = np.asarray(jax.vmap(
        lambda p, x, yy, mm: nlml(p, x, yy, mm, "Matern32", 1e-6))(
        {k: jnp.asarray(v, jnp.float32) for k, v in params.items()},
        jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32),
        jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-4)


def test_pallas_value_non_pd_is_nan():
    # a wildly non-PD configuration must yield NaN (linesearch reject), not
    # a finite garbage value
    X, y, mask, params = make_case(B=4, N=64, D=2, seed=2)
    params = {k: jnp.asarray(v) for k, v in params.items()}
    params["likelihood_variance"] = jnp.asarray([-5.0, 0.1, 0.1, 0.1])
    got = np.asarray(nlml_value_batched(
        params, X, y, mask.astype(float), "Matern32", 0.0, interpret=True))
    assert np.isnan(got[0])
    assert np.isfinite(got[1:]).all()
