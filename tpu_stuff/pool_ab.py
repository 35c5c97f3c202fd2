"""A/B: chunked fit_predict sweeps vs the device-resident L-BFGS pool on the
bench workload. Run (TPU): python -m tpu_stuff.pool_ab

History: a host-driven segmented pool (harvest/refill between jit calls) was
measured here first and REJECTED — chunked 34.8 experts/s vs pool 27.3-31.6
depending on segment length; each segment boundary cost ~0.5 s of tunnel
round-trip latency, losing the whole iteration-skew win. The device-resident
pool keeps the refill loop inside one program.
"""
import time

import numpy as np


def main():
    import jax.numpy as jnp
    from bench import make_workload
    from gpsat_tpu.models.batched import BatchedGPR
    from gpsat_tpu.parallel.scheduler import auto_batch_size

    E, N, P, D = 512, 400, 400, 3
    X, z, Xs = make_workload(E, N, P, D)
    y = z - z.mean(axis=1, keepdims=True)
    mask = np.ones((E, N), dtype=bool)
    dtype = jnp.float32
    engine = BatchedGPR(
        coords_dim=D, kernel="Matern32",
        constraints={"lengthscales": {"low": [0.01] * D, "high": [50.0] * D},
                     "likelihood_variance": {"low": 1e-5, "high": 1.0}},
        optim_kwargs={"max_iter": 250, "gtol": 1e-5, "ftol": 1e-9},
        jitter=1e-6, dtype=dtype)
    B = min(E, auto_batch_size(N, P))
    print(f"B={B}", flush=True)
    Xd = jnp.asarray(X, dtype)
    yd = jnp.asarray(y, dtype)
    md = jnp.asarray(mask)
    Xsd = jnp.asarray(Xs, dtype)

    def chunked():
        for s in range(0, E, B):
            e = min(s + B, E)
            engine.fit_predict(Xd[s:e], yd[s:e], md[s:e], Xs=Xsd[s:e],
                               optimise=True, predict=True)

    def pooled():
        engine.fit_predict_many(Xd, yd, md, Xs=Xsd, optimise=True,
                                predict=True, slots=B)

    chunked()
    t0 = time.perf_counter(); chunked()
    print(f"chunked: {E / (time.perf_counter() - t0):.1f} experts/s",
          flush=True)
    pooled()
    t0 = time.perf_counter(); pooled()
    print(f"device pool: {E / (time.perf_counter() - t0):.1f} experts/s",
          flush=True)


if __name__ == "__main__":
    main()
