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


def test_lbfgs_pallas_linesearch_wiring(monkeypatch):
    """Full engine fit with the Pallas value path forced on (interpret mode):
    optimised hyperparameters must match the pure-XLA run."""
    from gpsat_tpu.models.batched import BatchedGPR
    from gpsat_tpu.ops import pallas_gpr

    B, N, D = 3, 96, 2
    rng = np.random.default_rng(5)
    X = rng.uniform(-3, 3, (B, N, D))
    y = np.sin(X[..., 0]) + 0.1 * rng.standard_normal((B, N))
    y = y - y.mean(axis=1, keepdims=True)
    mask = np.ones((B, N), dtype=bool)
    mask[0, 80:] = False
    Xs = np.tile(np.linspace(-2, 2, 5)[None, :, None], (B, 1, D))

    def run():
        eng = BatchedGPR(coords_dim=D, kernel="Matern32",
                         optim_kwargs={"max_iter": 150},
                         dtype=jnp.float32, jitter=1e-6)
        return eng.fit_predict(X, y, mask, Xs=Xs, optimise=True, predict=True)

    base = run()
    monkeypatch.setattr(pallas_gpr, "_FORCE_SUPPORTED", True)
    monkeypatch.setattr(pallas_gpr, "_INTERPRET", True)
    # fresh program: the outer jit caches by static args only, so clear it
    from gpsat_tpu.models import batched as batched_mod
    batched_mod._gpr_fit_predict.clear_cache()
    got = run()
    batched_mod._gpr_fit_predict.clear_cache()

    assert got["converged"].all()
    # trial-step acceptance may differ slightly (different f32 rounding), so
    # optima can land on nearby points — but never meaningfully worse
    assert (got["objective"] <= base["objective"]
            + 1e-3 * np.abs(base["objective"]) + 1e-3).all(), \
        (got["objective"], base["objective"])
    np.testing.assert_allclose(got["objective"], base["objective"],
                               rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(got["preds"]["f*"], base["preds"]["f*"],
                               rtol=5e-2, atol=5e-3)
