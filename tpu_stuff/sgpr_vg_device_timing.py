"""Device-true SGPR vg timing: ALL inputs built on-device from a scalar
seed (tunnel inputs are host-resident and re-shipped per execution — a
[B,M,M] operand costs ~170 ms/call in transfer and swamps any timing), a
scalar returned. Chained dispatch, block at the end.

Usage: python tpu_stuff/sgpr_vg_device_timing.py [B] [stream|hybrid]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
path = sys.argv[2] if len(sys.argv) > 2 else "stream"
os.environ["GPSAT_SGPR_STREAM"] = "1" if path == "stream" else "0"

from gpsat_tpu.ops.pallas_sgpr import sgpr_vg_batched  # noqa: E402

N, M, D = 2000, 500, 3


@jax.jit
def probe(seed):
    f32 = jnp.float32
    bidx = jnp.arange(B, dtype=f32)[:, None]
    i = jnp.arange(N, dtype=f32)[None, :]
    X = jnp.stack([jnp.sin(0.1 * i + 0.01 * bidx + seed) * 4.0,
                   jnp.cos(0.13 * i + 0.02 * bidx) * 4.0,
                   jnp.sin(0.07 * i + 0.0 * bidx) * 4.0], axis=-1)  # [B,N,D]
    y = jnp.sin(X[..., 0]) + 0.1 * jnp.cos(3.0 * X[..., 1])
    y = y - y.mean(axis=1, keepdims=True)
    m = jnp.ones((B, N), f32)
    Z = X[:, :M]
    zm = jnp.ones((B, M), f32)
    params = {
        "lengthscales": 0.8 + 0.1 * jnp.ones((B, D), f32)
        * (1.0 + 0.05 * bidx) + 0.001 * seed,
        "kernel_variance": 0.5 + 0.02 * bidx[:, 0],
        "likelihood_variance": 0.05 + 0.001 * bidx[:, 0],
    }
    val, g = sgpr_vg_batched(params, X, y, m, Z, zm, "Matern32", 1e-6)
    return val.sum() + sum(jnp.sum(v) for v in g.values())


seeds = [jnp.float32(k) for k in range(14)]
# np.asarray, not block_until_ready: on this tunnel block_until_ready
# does not force the round trip (sgpr_eval_timing.py lesson) — enqueue the
# chain, then materialise the LAST scalar (executions are ordered)
np.asarray(probe(seeds[12]))
np.asarray(probe(seeds[13]))
t0 = time.perf_counter()
outs = [probe(seeds[k]) for k in range(12)]
np.asarray(outs[-1])
dt = (time.perf_counter() - t0) / 12
print(f"sgpr vg [{path}] device-true: {dt*1e3:.2f} ms/eval (B={B})",
      flush=True)
