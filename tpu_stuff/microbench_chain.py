"""Microbenchmark: per-op latency inside a sequential dependency chain.

A standalone timed op can pipeline across repetitions, hiding its real
latency; inside the L-BFGS while_loop every op sits on the critical path.
This times fori_loop chains of K dependent evaluations — total/K is the
in-loop latency that actually gates the optimiser.

Run (TPU, exclusively): python -m tpu_stuff.microbench_chain [B N]
"""

import sys
import time

import numpy as np


def chain(name, step_fn, x0, K=25):
    import jax

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, K, lambda i, c: step_fn(c, i), x)

    jax.block_until_ready(run(x0))   # compile
    t0 = time.perf_counter()
    jax.block_until_ready(run(x0))
    dt = time.perf_counter() - t0
    print(f"{name:42s} {dt/K*1e3:9.3f} ms/step  ({dt:.3f}s / {K})",
          flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import jax.scipy.linalg as jsl
    import gpsat_tpu  # noqa: F401

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 69
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    D = 3
    f32 = jnp.float32
    print(f"device: {jax.devices()[0].device_kind}, B={B}, N={N}, f32, "
          f"dependent chains", flush=True)

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-4, 4, (B, N, D)), f32)
    y = jnp.asarray(rng.standard_normal((B, N)), f32)
    mask = jnp.ones((B, N), bool)
    eps = jnp.asarray(1e-9, f32)
    A0 = (jnp.matmul(X, jnp.swapaxes(X, 1, 2))
          + jnp.eye(N, dtype=f32) * jnp.asarray(N * 20.0, f32))

    chain("cholesky+reconstruct [B,N,N]",
          lambda A, i: (lambda L: jnp.matmul(L, jnp.swapaxes(L, 1, 2)))(
              jnp.linalg.cholesky(A + eps * i)), A0)

    L0 = jnp.linalg.cholesky(A0)
    chain("trisolve matrix-RHS [B,N,N]",
          lambda V, i: jsl.solve_triangular(L0, V, lower=True) + eps * i, A0)
    chain("trisolve vector-RHS [B,N,1]",
          lambda v, i: jsl.solve_triangular(
              L0, v, lower=True) * jnp.asarray(0.999, f32),
          y[..., None], K=50)
    chain("matmul [B,N,N]@[B,N,N]",
          lambda V, i: jnp.matmul(V, A0) * jnp.asarray(1e-3, f32), A0, K=50)

    from gpsat_tpu.ops.gpr import nlml, nlml_fused
    params0 = {"lengthscales": jnp.full((B, D), 2.0, f32),
               "kernel_variance": jnp.ones(B, f32),
               "likelihood_variance": jnp.full(B, 0.1, f32)}
    tiny = jnp.asarray(1e-12, f32)
    one = jnp.asarray(1.0, f32)

    def bump(p, v):
        # feed the output back into the params so steps are dependent
        return {**p, "kernel_variance":
                p["kernel_variance"] * (one + tiny * jnp.tanh(v))}

    single_ad = lambda pp, x, yy, mm: nlml(pp, x, yy, mm, "Matern32", 1e-6)
    single_fused = lambda pp, x, yy, mm: nlml_fused(
        pp, x, yy, mm.astype(x.dtype), "Matern32", 1e-6)

    def step_value(single):
        def f(p, i):
            v = jax.vmap(single)(p, X, y, mask)
            return bump(p, v)
        return f

    def step_vg(single):
        def f(p, i):
            v, g = jax.vmap(jax.value_and_grad(single))(p, X, y, mask)
            return bump(p, v + jax.tree.reduce(
                lambda a, b: a + b, jax.tree.map(
                    lambda a: jnp.sum(a, axis=tuple(range(1, a.ndim)))
                    if a.ndim > 1 else a, g)))
        return f

    chain("nlml value AD-path", step_value(single_ad), params0)
    chain("nlml value fused", step_value(single_fused), params0)
    chain("nlml value+grad AD", step_vg(single_ad), params0)
    chain("nlml value+grad fused", step_vg(single_fused), params0)


if __name__ == "__main__":
    main()
