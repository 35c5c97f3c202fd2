"""Reproduce the bench-sgpr non-finite-prediction failure with diagnosis."""
import time

import numpy as np
import jax.numpy as jnp

import bench
from gpsat_tpu.models.batched import BatchedSGPR

E, N, P, D, M = 128, 2000, 400, 3, 500
X, z, Xs = bench.make_workload(E, N, P, D)
y = z - z.mean(axis=1, keepdims=True)
mask = np.ones((E, N), dtype=bool)

engine = BatchedSGPR(
    coords_dim=D, kernel="Matern32", num_inducing_points=M,
    constraints={"lengthscales": {"low": [0.01] * D, "high": [50.0] * D},
                 "likelihood_variance": {"low": 1e-5, "high": 1.0}},
    optim_kwargs={"max_iter": 250, "gtol": 1e-5, "ftol": 1e-9},
    jitter=1e-6, dtype=jnp.float32)

B = min(E, max(1, 2**25 // (M * N)))
t0 = time.perf_counter()
out = engine.fit_predict_many(jnp.asarray(X, jnp.float32),
                              jnp.asarray(y, jnp.float32), mask,
                              Xs=jnp.asarray(Xs, jnp.float32),
                              optimise=True, predict=True, slots=B)
print(f"sweep {time.perf_counter()-t0:.1f}s  conv={out['converged'].mean():.2f} "
      f"pool_iters={engine._last_pool_iterations}", flush=True)
f = out["preds"]["f*"]
bad = ~np.isfinite(f).all(axis=1)
print("experts with non-finite preds:", np.flatnonzero(bad), flush=True)
print("objective finite:", np.isfinite(out["objective"]).all(), flush=True)
for ei in np.flatnonzero(bad)[:5]:
    print(f"expert {ei}: obj={out['objective'][ei]:.3f} "
          f"conv={out['converged'][ei]} iters={out['iterations'][ei]} "
          f"ls={out['params']['lengthscales'][ei]} "
          f"kv={out['params']['kernel_variance'][ei]:.3e} "
          f"lv={out['params']['likelihood_variance'][ei]:.3e} "
          f"frac_bad={np.mean(~np.isfinite(f[ei])):.2f}", flush=True)
