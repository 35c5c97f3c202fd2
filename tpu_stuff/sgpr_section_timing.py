"""Section timing for the SGPR vg redesign (round 5): chained dispatch of 12
varied-input evals with ONE final materialisation, so the tunnel round-trip
amortises (cf. sgpr_eval_timing.py which pays it per rep). Sections:

  hybrid   — full _sgpr_vg_hybrid (2 cholinv + XLA matmuls)
  cholinv  — one cholinv_batched call at [B, 512, 512]
  xla_mm   — the [B,M,N] einsum block alone (Kuf build + At + Bm + Kbar_uf
             chain + QF contractions), no factorisations: the part the
             round-5 streaming kernels replace
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from gpsat_tpu.ops.pallas_sgpr import sgpr_vg_batched
from gpsat_tpu.ops.pallas_cholinv import cholinv_batched

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
N, M, D = 2000, 500, 3
Mp = 512
rng = np.random.default_rng(0)
X = rng.uniform(-4, 4, (B, N, D)).astype(np.float32)
y = (np.sin(X[..., 0]) + 0.1 * rng.standard_normal((B, N))).astype(np.float32)
y -= y.mean(1, keepdims=True)
mask = np.ones((B, N), np.float32)
Z = X[:, :M].copy()
zm = np.ones((B, M), np.float32)
Xd, yd, md, Zd, zmd = map(jnp.asarray, (X, y, mask, Z, zm))


def params_k(k):
    r = np.random.default_rng(100 + k)
    return {"lengthscales": jnp.asarray(r.uniform(0.8, 2.0, (B, D)),
                                        jnp.float32),
            "kernel_variance": jnp.asarray(r.uniform(0.5, 2.0, B),
                                           jnp.float32),
            "likelihood_variance": jnp.asarray(r.uniform(0.05, 0.2, B),
                                               jnp.float32)}


psets = [params_k(k) for k in range(14)]
spds = [jnp.asarray(
    (np.eye(Mp, dtype=np.float32) * (1.0 + 0.01 * k)
     + 0.3 * np.exp(-0.1 * np.abs(np.subtract.outer(np.arange(Mp),
                                                    np.arange(Mp)))))
    .astype(np.float32)[None].repeat(B, 0)) for k in range(14)]


def chain_time(f, inputs, label, reps=12):
    np.asarray(jax.tree.leaves(f(inputs[12]))[0])   # compile
    np.asarray(jax.tree.leaves(f(inputs[13]))[0])
    t0 = time.perf_counter()
    outs = [f(inputs[i]) for i in range(reps)]
    for o in outs:
        jax.tree.leaves(o)[0].block_until_ready()
    np.asarray(jax.tree.leaves(outs[-1])[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{label}: {dt*1e3:.2f} ms/eval (B={B}, chained)", flush=True)
    return dt


def hybrid(p):
    return sgpr_vg_batched(p, Xd, yd, md, Zd, zmd, "Matern32", 1e-6)


@jax.jit
def _cholinv_only(A):
    return cholinv_batched(A)


chain_time(hybrid, psets, "hybrid vg")
chain_time(_cholinv_only, spds, "cholinv [B,512,512]")
