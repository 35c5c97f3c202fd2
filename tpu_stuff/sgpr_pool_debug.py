"""Real-TPU diagnosis of the hybrid SGPR pool: cholinv kernel numerics,
hybrid-vg finiteness at extreme trial points, and a small pooled optimize."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from gpsat_tpu.ops.pallas_cholinv import cholinv_batched
from gpsat_tpu.ops.pallas_sgpr import sgpr_vg_batched
from gpsat_tpu.ops import sgpr

rng = np.random.default_rng(0)

# 1) cholinv on-device numerics vs XLA fallback
M = 512
B = 8
A = np.zeros((B, M, M), np.float32)
for b in range(B):
    mv = [512, 500, 300, 128, 1, 512, 257, 400][b]
    G = rng.standard_normal((mv, mv)).astype(np.float32)
    S = G @ G.T / mv + np.eye(mv, dtype=np.float32) * 0.5
    A[b, :mv, :mv] = S
    A[b, range(mv, M), range(mv, M)] = 1.0
U, W, ld = cholinv_batched(jnp.asarray(A))
U, W, ld = np.asarray(U), np.asarray(W), np.asarray(ld)
print("cholinv finite:", np.isfinite(U).all(), np.isfinite(W).all(),
      np.isfinite(ld).all(), flush=True)
for b in [0, 3, 4, 6]:
    L = np.linalg.cholesky(A[b].astype(np.float64))
    eU = np.abs(U[b] - L.T).max()
    eW = np.abs(W[b] - np.linalg.inv(L.T)).max()
    eld = abs(ld[b] - np.log(np.diag(L)).sum())
    print(f"  b={b}: U err {eU:.2e}  W err {eW:.2e}  ld err {eld:.2e}",
          flush=True)

# non-PD input must give NaN (so L-BFGS rejects the trial)
A_bad = A.copy()
A_bad[0, 0, 0] = -5.0
_, _, ld_bad = cholinv_batched(jnp.asarray(A_bad))
print("non-PD ld[0] is nan:", bool(np.isnan(np.asarray(ld_bad)[0])),
      flush=True)

# 2) hybrid vg at normal + extreme params
N, Mi, D = 2000, 500, 3
X = rng.uniform(-4, 4, (8, N, D)).astype(np.float32)
y = (np.sin(X[..., 0]) + 0.1 * rng.standard_normal((8, N))).astype(np.float32)
y -= y.mean(1, keepdims=True)
mask = np.ones((8, N), np.float32)
Z = X[:, :Mi].copy()
zm = np.ones((8, Mi), np.float32)
params = {"lengthscales": jnp.asarray(rng.uniform(0.8, 2.0, (8, D)), jnp.float32),
          "kernel_variance": jnp.asarray([1.0, 1e6, 1e-6, 1.0, 1e4, 1.0, 1.0, 30.0], jnp.float32),
          "likelihood_variance": jnp.asarray([0.1, 1.0, 1e-5, 1e-5, 0.5, 0.9999, 0.1, 0.2], jnp.float32)}
val, grads = sgpr_vg_batched(params, X, y, mask, Z, zm, "Matern32", 1e-6)
val = np.asarray(val)
print("hybrid vals:", val, flush=True)
for k, g in grads.items():
    g = np.asarray(g)
    print(f"  grad {k}: finite={np.isfinite(g).all(axis=-1) if g.ndim > 1 else np.isfinite(g)}",
          flush=True)

# XLA reference for same
wv = np.asarray(jax.vmap(lambda p, xi, yi, mi, zi, zmi: sgpr.neg_elbo(
    p, xi, yi, mi, zi, zmi, kernel="Matern32", jitter=1e-6))(
    {k: jnp.asarray(v) for k, v in params.items()},
    jnp.asarray(X), jnp.asarray(y), jnp.asarray(mask), jnp.asarray(Z),
    jnp.asarray(zm)))
print("xla    vals:", wv, flush=True)

# 3) small pooled optimize at bench-like config
from gpsat_tpu.models.batched import BatchedSGPR
E = 40
Xe = rng.uniform(-4.0, 4.0, (E, N, D))
Xe[..., 2] = 0.0
ze = (0.4 * np.sin(Xe[..., 0] * 0.8) + 0.3 * np.cos(Xe[..., 1] * 0.6)
      + 0.05 * rng.standard_normal((E, N)))
ye = ze - ze.mean(1, keepdims=True)
me = np.ones((E, N), bool)
engine = BatchedSGPR(
    coords_dim=D, kernel="Matern32", num_inducing_points=Mi,
    constraints={"lengthscales": {"low": [0.01] * D, "high": [50.0] * D},
                 "likelihood_variance": {"low": 1e-5, "high": 1.0}},
    optim_kwargs={"max_iter": 250, "gtol": 1e-5, "ftol": 1e-9},
    dtype=jnp.float32)
t0 = time.perf_counter()
out = engine.fit_predict_many(Xe, ye, me, Xs=None, optimise=True,
                              predict=False, slots=20)
dt = time.perf_counter() - t0
obj = out["objective"]
print(f"pool: {dt:.1f}s, conv={out['converged'].mean():.2f}, "
      f"finite obj={np.isfinite(obj).all()}, "
      f"pool_iters={engine._last_pool_iterations}", flush=True)
print("objectives:", np.array2string(obj, precision=1), flush=True)
for k, v in out["params"].items():
    print(f"  {k}: finite={np.isfinite(v).all()}", flush=True)
