"""TPU environment smoke test (reference equivalent: gpu_stuff/test_gpu.py).

Checks: device discovery, basic compute, batched Cholesky, compilation-cache
configuration, and the gpsat_tpu engine on a tiny bucket.

Run: python -m tpu_stuff.check_tpu
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    devs = jax.devices()
    print(f"devices: {devs}")
    d0 = devs[0]
    print(f"platform: {d0.platform}, kind: {d0.device_kind}, count: {len(devs)}")

    x = jnp.ones((512, 512), jnp.float32)
    t0 = time.time()
    r = (x @ x).block_until_ready()
    print(f"matmul [512,512] ok ({time.time() - t0:.2f}s incl. compile), "
          f"result[0,0]={float(r[0, 0])}")

    A = jnp.eye(128, dtype=jnp.float32) * 2.0
    L = jnp.linalg.cholesky(A[None].repeat(8, 0)).block_until_ready()
    print(f"batched cholesky ok, L[0,0,0]={float(L[0, 0, 0]):.4f}")

    cache = jax.config.jax_compilation_cache_dir
    print(f"compilation cache: {cache or 'DISABLED'}")

    from gpsat_tpu.models.batched import BatchedGPR
    rng = np.random.default_rng(0)
    B, N, D = 4, 32, 2
    X = rng.uniform(-2, 2, (B, N, D))
    y = np.sin(X[..., 0]) + 0.1 * rng.standard_normal((B, N))
    t0 = time.time()
    engine = BatchedGPR(coords_dim=D, optim_kwargs={"max_iter": 50})
    out = engine.fit_predict(X, y, np.ones((B, N), bool), optimise=True,
                             predict=False)
    print(f"BatchedGPR tiny fit ok ({time.time() - t0:.1f}s incl. compile): "
          f"objectives={np.round(out['objective'], 2)}")
    print("ALL CHECKS PASSED")


if __name__ == "__main__":
    main()
