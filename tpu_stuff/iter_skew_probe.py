"""Iteration-count skew: how much work does the batch waste waiting for the
slowest expert's L-BFGS? Prints per-chunk iterations stats and the ideal
compaction speedup sum(iters)/ (B * max(iters)).
Run (TPU): python -m tpu_stuff.iter_skew_probe
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

    all_iters = []
    t_chunks = []
    for s in range(0, E, B):
        e = min(s + B, E)
        t0 = time.perf_counter()
        out = engine.fit_predict(Xd[s:e], yd[s:e], md[s:e], Xs=Xsd[s:e],
                                 optimise=True, predict=True)
        dt = time.perf_counter() - t0
        its = out["iterations"]
        all_iters.append(its)
        t_chunks.append((dt, its.max()))
        print(f"chunk {s:4d}: {dt:6.2f}s iters min/med/p90/max = "
              f"{its.min()}/{int(np.median(its))}/"
              f"{int(np.percentile(its, 90))}/{its.max()} "
              f"conv={out['converged'].mean():.2f}", flush=True)
    its = np.concatenate(all_iters)
    waste = 0.0
    for (dt, mx), ii in zip(t_chunks, all_iters):
        waste += len(ii) * mx - ii.sum()
    total = sum(len(ii) * mx for (_, mx), ii in zip(t_chunks, all_iters))
    print(f"expert-iterations executed: {total}, useful: {its.sum()}, "
          f"ideal compaction speedup: {total / its.sum():.2f}x", flush=True)
    # second-run timing (cached compile) for per-iteration cost
    t0 = time.perf_counter()
    for s in range(0, E, B):
        e = min(s + B, E)
        engine.fit_predict(Xd[s:e], yd[s:e], md[s:e], Xs=Xsd[s:e],
                           optimise=True, predict=True)
    print(f"steady sweep: {E / (time.perf_counter() - t0):.1f} experts/s",
          flush=True)


if __name__ == "__main__":
    main()
