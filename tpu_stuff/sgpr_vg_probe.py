"""Real-TPU probe: fused Pallas SGPR vg kernel vs XLA adjoint at the
production profile (N=2000, M=500 — reference IS2_GPSat_train.py SGPR
config). Compares values/grads and per-eval latency at pool slot width.

Usage: python tpu_stuff/sgpr_vg_probe.py [B] [N] [M]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from gpsat_tpu.ops import sgpr
from gpsat_tpu.ops.pallas_sgpr import sgpr_vg_batched

B = int(sys.argv[1]) if len(sys.argv) > 1 else 40
N = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
M = int(sys.argv[3]) if len(sys.argv) > 3 else 500
D = 3
rng = np.random.default_rng(0)
X = rng.uniform(-4, 4, (B, N, D)).astype(np.float32)
y = (np.sin(X[..., 0]) + 0.1 * rng.standard_normal((B, N))).astype(np.float32)
y -= y.mean(1, keepdims=True)
mask = np.ones((B, N), np.float32)
mask[:, N - 37:] = 0.0
Z = X[:, :M].copy()
zmask = np.ones((B, M), np.float32)
zmask[:, M - 3:] = 0.0
params = {"lengthscales": jnp.asarray(rng.uniform(0.8, 2.0, (B, D)), jnp.float32),
          "kernel_variance": jnp.asarray(rng.uniform(0.5, 2.0, B), jnp.float32),
          "likelihood_variance": jnp.asarray(rng.uniform(0.05, 0.2, B), jnp.float32)}

Xd, yd, md = jnp.asarray(X), jnp.asarray(y), jnp.asarray(mask)
Zd, zmd = jnp.asarray(Z), jnp.asarray(zmask)

print(f"compiling fused kernel  B={B} N={N} M={M} ...", flush=True)
t0 = time.perf_counter()
val, grads = sgpr_vg_batched(params, Xd, yd, md, Zd, zmd, "Matern32", 1e-6)
jax.block_until_ready(val)
print(f"  compile+run {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
reps = 20
for _ in range(reps):
    val, grads = sgpr_vg_batched(params, Xd, yd, md, Zd, zmd, "Matern32", 1e-6)
    jax.block_until_ready(val)
dt_pallas = (time.perf_counter() - t0) / reps
print(f"pallas vg: {dt_pallas*1e3:.2f} ms/eval ({B} experts)", flush=True)

print("compiling XLA adjoint ...", flush=True)
@jax.jit
def xla_vg(p, X, y, m, Z, zm):
    return jax.vmap(jax.value_and_grad(
        lambda pi, xi, yi, mi, zi, zmi: sgpr.neg_elbo(
            pi, xi, yi, mi, zi, zmi, kernel="Matern32", jitter=1e-6)))(
        p, X, y, m, Z, zm)

t0 = time.perf_counter()
wv, wg = xla_vg(params, Xd, yd, md, Zd, zmd)
jax.block_until_ready(wv)
print(f"  compile+run {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
for _ in range(reps):
    wv, wg = xla_vg(params, Xd, yd, md, Zd, zmd)
    jax.block_until_ready(wv)
dt_xla = (time.perf_counter() - t0) / reps
print(f"xla    vg: {dt_xla*1e3:.2f} ms/eval  -> speedup {dt_xla/dt_pallas:.2f}x", flush=True)

val = np.asarray(val); wv = np.asarray(wv)
print("value err: max abs", np.abs(val - wv).max(),
      "rel", (np.abs(val - wv) / np.maximum(np.abs(wv), 1)).max())
for k in grads:
    a, b = np.asarray(grads[k]), np.asarray(wg[k])
    print(f"grad {k}: max abs {np.abs(a-b).max():.3e} "
          f"rel {(np.abs(a-b)/np.maximum(np.abs(b),1e-3)).max():.3e}")
