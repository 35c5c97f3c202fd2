"""Iteration-count probe for the bench GPR pool under kernel configs.

Run (TPU, exclusively): python -m tpu_stuff.pool_iter_probe
Env: GPSAT_DISABLE_PALLAS_VG / GPSAT_DISABLE_PALLAS_VALUE to bisect.
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
    engine = BatchedGPR(
        coords_dim=D, kernel="Matern32",
        constraints={"lengthscales": {"low": [0.01] * D, "high": [50.0] * D},
                     "likelihood_variance": {"low": 1e-5, "high": 1.0}},
        optim_kwargs={"max_iter": 250, "gtol": 1e-5, "ftol": 1e-9},
        jitter=1e-6, dtype=jnp.float32)
    B = min(E, auto_batch_size(N, P))

    def sweep():
        return engine.fit_predict_many(
            jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32),
            jnp.asarray(mask), Xs=jnp.asarray(Xs, jnp.float32),
            optimise=True, predict=True, slots=B)

    sweep()
    t0 = time.perf_counter()
    out = sweep()
    dt = time.perf_counter() - t0
    it = out["iterations"]
    msg = (f"rate {E/dt:.1f}/s  conv {np.mean(out['converged']):.3f}  "
           f"iters mean {np.mean(it):.1f} p50 {np.percentile(it, 50):.0f} "
           f"p90 {np.percentile(it, 90):.0f} max {np.max(it)}")
    nit = getattr(engine, "_last_pool_iterations", None)
    if nit is not None:
        msg += (f"  pool_iters {int(nit)}  "
                f"trials/accept {int(nit) * B / max(np.sum(it), 1):.1f}")
    print(msg)


if __name__ == "__main__":
    main()


def phases():
    """Time optimise-only vs predict-only sweeps (run after main())."""
    import time
    import jax.numpy as jnp
    from bench import make_workload
    from gpsat_tpu.models.batched import BatchedGPR
    from gpsat_tpu.parallel.scheduler import auto_batch_size

    E, N, P, D = 512, 400, 400, 3
    X, z, Xs = make_workload(E, N, P, D)
    y = z - z.mean(axis=1, keepdims=True)
    mask = np.ones((E, N), dtype=bool)
    engine = BatchedGPR(
        coords_dim=D, kernel="Matern32",
        constraints={"lengthscales": {"low": [0.01] * D, "high": [50.0] * D},
                     "likelihood_variance": {"low": 1e-5, "high": 1.0}},
        optim_kwargs={"max_iter": 250, "gtol": 1e-5, "ftol": 1e-9},
        jitter=1e-6, dtype=jnp.float32)
    B = min(E, auto_batch_size(N, P))
    args = (jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32),
            jnp.asarray(mask))
    kw = dict(Xs=jnp.asarray(Xs, jnp.float32), slots=B)

    for name, opt, pred in [("optimise", True, False),
                            ("predict", False, True),
                            ("both", True, True)]:
        engine.fit_predict_many(*args, optimise=opt, predict=pred, **kw)
        t0 = time.perf_counter()
        engine.fit_predict_many(*args, optimise=opt, predict=pred, **kw)
        dt = time.perf_counter() - t0
        print(f"{name:10s} {dt:6.2f}s  ({E/dt:.1f}/s)")


if __name__ == "__main__" and __import__("sys").argv[-1] == "phases":
    phases()
