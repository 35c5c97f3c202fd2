"""Profile the batched L-BFGS fit at bench shapes: iteration distribution +
derived per-trip latency. The while_loop runs until the LAST expert converges,
so wall time ~= max(iterations) * per-trip latency; this separates the two
levers (trip count vs trip cost).

Run (TPU, exclusively): python -m tpu_stuff.profile_lbfgs [E N P]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import gpsat_tpu  # noqa: F401
    from gpsat_tpu.models.batched import BatchedGPR
    from gpsat_tpu.parallel.scheduler import auto_batch_size
    sys.path.insert(0, ".")
    from bench import make_workload

    E = int(sys.argv[1]) if len(sys.argv) > 1 else 138
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    P = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    D = 3
    dtype = jnp.float32
    X, z, Xs = make_workload(E, N, P, D)
    y = z - z.mean(axis=1, keepdims=True)
    mask = np.ones((E, N), dtype=bool)

    engine = BatchedGPR(
        coords_dim=D, kernel="Matern32",
        constraints={"lengthscales": {"low": [0.01] * D, "high": [50.0] * D},
                     "likelihood_variance": {"low": 1e-5, "high": 1.0}},
        optim_kwargs={"max_iter": 250, "gtol": 1e-5, "ftol": 1e-9},
        jitter=1e-6, dtype=dtype)

    B = min(E, auto_batch_size(N, P))
    print(f"E={E} N={N} P={P} B={B} dtype={np.dtype(dtype).name}")
    Xd, yd = jnp.asarray(X, dtype), jnp.asarray(y, dtype)
    md, Xsd = jnp.asarray(mask), jnp.asarray(Xs, dtype)

    # warm-up compile
    engine.fit_predict(Xd[:B], yd[:B], md[:B], Xs=Xsd[:B])

    for s in range(0, E, B):
        e = min(s + B, E)
        if e - s < B:
            break
        t0 = time.perf_counter()
        out = engine.fit_predict(Xd[s:e], yd[s:e], md[s:e], Xs=Xsd[s:e])
        dt = time.perf_counter() - t0
        it = np.asarray(out["iterations"])
        trips = int(it.max())
        print(f"batch [{s}:{e}]: {dt:.2f}s  rate={B/dt:.1f}/s  "
              f"iters p50={np.percentile(it,50):.0f} p95={np.percentile(it,95):.0f} "
              f"max={trips}  latency/trip={dt/max(trips,1)*1e3:.1f} ms  "
              f"conv={out['converged'].mean():.2f}")


if __name__ == "__main__":
    main()
