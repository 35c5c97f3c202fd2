"""ASVGP TPU smoke test: the ASVGP collapsed bound had the same fatal
f64-promotion class as VFF (np.sqrt STRONG scalars in _LAM_MULT) and had
never been executed on TPU. One pooled fit+predict at a modest shape
proves the f32 path compiles and converges on hardware.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tpu_stuff/asvgp_tpu_smoke.py
"""
import time

import numpy as np
import jax.numpy as jnp

from gpsat_tpu.models.batched import BatchedASVGP

E, N, P, D, m = 32, 500, 100, 2, 12
rng = np.random.default_rng(0)
X = rng.uniform(-4.0, 4.0, (E, N, D))
y = np.sin(X[..., 0]) + 0.1 * np.cos(3.0 * X[..., 1]) \
    + 0.05 * rng.standard_normal((E, N))
y = y - y.mean(axis=1, keepdims=True)
mask = np.ones((E, N), bool)
Xs = rng.uniform(-3.0, 3.0, (E, P, D))

eng = BatchedASVGP(
    coords_dim=D, kernel="Matern32", num_inducing_features=[m] * D,
    constraints={"lengthscales": {"low": [0.05] * D, "high": [50.0] * D},
                 "likelihood_variance": {"low": 1e-5, "high": 1.0}},
    optim_kwargs={"max_iter": 250, "gtol": 1e-5, "ftol": 1e-9},
    dtype=jnp.float32)
eng._expert_locs_scaled = np.zeros((E, D))

t0 = time.perf_counter()
out = eng.fit_predict_many(jnp.asarray(X, jnp.float32),
                           jnp.asarray(y, jnp.float32),
                           jnp.asarray(mask), Xs=jnp.asarray(Xs, jnp.float32),
                           optimise=True, predict=True, slots=E)
warm = time.perf_counter() - t0
conv = float(np.mean(out["converged"]))
finite = bool(np.isfinite(out["preds"]["f*"]).all())
t0 = time.perf_counter()
out = eng.fit_predict_many(jnp.asarray(X, jnp.float32),
                           jnp.asarray(y, jnp.float32),
                           jnp.asarray(mask), Xs=jnp.asarray(Xs, jnp.float32),
                           optimise=True, predict=True, slots=E)
dt = time.perf_counter() - t0
print(f"asvgp tpu smoke: converged={conv:.2f} finite={finite} "
      f"warm={warm:.1f}s rate={E / dt:.1f} experts/s "
      f"(E={E}, N={N}, m={m}/dim)", flush=True)
