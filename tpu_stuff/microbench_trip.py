"""Microbenchmark: (a) NLML value-eval latency vs batch size (is the
candidate-sweep's C*B eval supralinear?), (b) L-BFGS per-trip machinery
overhead on a trivial objective (two_loop + bookkeeping, objective ~free).

Run (TPU, exclusively): python -m tpu_stuff.microbench_trip
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import gpsat_tpu  # noqa: F401
    from gpsat_tpu.ops.gpr import nlml_fused
    from gpsat_tpu.ops.lbfgs import batched_lbfgs

    f32 = jnp.float32
    N, D = 400, 3
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)

    # (a) value-eval latency vs batch, dependent chain
    for B in (69, 276, 828):
        X = jnp.asarray(rng.uniform(-4, 4, (B, N, D)), f32)
        y = jnp.asarray(rng.standard_normal((B, N)), f32)
        m = jnp.ones((B, N), f32)
        p0 = {"lengthscales": jnp.full((B, D), 2.0, f32),
              "kernel_variance": jnp.ones(B, f32),
              "likelihood_variance": jnp.full(B, 0.1, f32)}
        one, tiny = jnp.asarray(1.0, f32), jnp.asarray(1e-12, f32)

        @jax.jit
        def run(p):
            def step(i, pp):
                v = jax.vmap(lambda a, b, c, d_: nlml_fused(
                    a, b, c, d_, "Matern32", 1e-6))(pp, X, y, m)
                return {**pp, "kernel_variance":
                        pp["kernel_variance"] * (one + tiny * jnp.tanh(v))}
            return jax.lax.fori_loop(0, 10, step, p)

        jax.block_until_ready(run(p0))
        t0 = time.perf_counter()
        jax.block_until_ready(run(p0))
        dt = time.perf_counter() - t0
        print(f"value eval [B={B:4d},N={N}]: {dt/10*1e3:8.2f} ms", flush=True)

    # (b) trip overhead with a trivial objective
    B, P = 69, 5

    def fun(x):
        return jnp.sum(x ** 4 + 0.1 * jnp.sin(3.0 * x) + x * x)

    x0 = jnp.asarray(rng.uniform(0.5, 1.5, (B, P)), f32)
    t0 = time.perf_counter()
    res = batched_lbfgs(fun, x0, args=(), max_iter=100, gtol=0.0, ftol=0.0)
    jax.block_until_ready(res.x)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = batched_lbfgs(fun, x0, args=(), max_iter=100, gtol=0.0, ftol=0.0)
    jax.block_until_ready(res.x)
    dt = time.perf_counter() - t0
    trips = int(np.max(np.asarray(res.iterations)))
    print(f"trivial-objective L-BFGS: {dt:.3f}s / {trips} trips = "
          f"{dt/max(trips,1)*1e3:.2f} ms/trip machinery overhead "
          f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
