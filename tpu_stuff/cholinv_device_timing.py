"""Device-true cholinv timing: the SPD input is built ON DEVICE from a
scalar seed (shipping a [B,512,512] input over the axon tunnel costs
~170 ms/call and swamps the measurement — tunnel inputs appear to be
host-resident and transferred per execution), and only a scalar returns.
Chained dispatch, one block at the end."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from gpsat_tpu.ops.pallas_cholinv import cholinv_batched

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
Mp = 512


@jax.jit
def probe(seed):
    i = jnp.arange(Mp, dtype=jnp.float32)
    base = 0.3 * jnp.exp(-0.1 * jnp.abs(i[:, None] - i[None, :]))
    bidx = jnp.arange(B, dtype=jnp.float32)[:, None, None]
    A = (base[None] * (1.0 + 0.001 * bidx)
         + jnp.eye(Mp, dtype=jnp.float32) * (1.0 + 0.01 * seed))
    W, ld = cholinv_batched(A)
    return ld.sum() + W[:, 0, 0].sum()


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
print(f"cholinv device-true: {dt*1e3:.2f} ms/call (B={B}, M={Mp})",
      flush=True)
