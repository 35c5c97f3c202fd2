"""Phase breakdown of the SGPR pooled sweep at the bench profile:
optimise-only vs optimise+predict (fill share), at two slot widths."""
import time

import numpy as np
import jax.numpy as jnp

import bench
from gpsat_tpu.models.batched import BatchedSGPR

E, N, P, D, M = 128, 2000, 400, 3, 500
X, z, Xs = bench.make_workload(E, N, P, D)
y = z - z.mean(axis=1, keepdims=True)
mask = np.ones((E, N), dtype=bool)
Xd = jnp.asarray(X, jnp.float32)
yd = jnp.asarray(y, jnp.float32)
Xsd = jnp.asarray(Xs, jnp.float32)


def engine():
    return BatchedSGPR(
        coords_dim=D, kernel="Matern32", num_inducing_points=M,
        constraints={"lengthscales": {"low": [0.01] * D, "high": [50.0] * D},
                     "likelihood_variance": {"low": 1e-5, "high": 1.0}},
        optim_kwargs={"max_iter": 250, "gtol": 1e-5, "ftol": 1e-9},
        jitter=1e-6, dtype=jnp.float32)


for slots in (32,):
    for do_pred in (False, True):
        eng = engine()
        kw = dict(Xs=Xsd if do_pred else None, optimise=True,
                  predict=do_pred, slots=slots)
        eng.fit_predict_many(Xd, yd, mask, **kw)          # compile
        t0 = time.perf_counter()
        out = eng.fit_predict_many(Xd, yd, mask, **kw)
        dt = time.perf_counter() - t0
        print(f"slots={slots} predict={int(do_pred)}: {dt:.2f}s "
              f"({E/dt:.1f} experts/s, pool_iters="
              f"{eng._last_pool_iterations}, "
              f"mean_iters={out['iterations'].mean():.1f})", flush=True)
