"""Microbenchmark: where does an L-BFGS iteration's time go on the chip?

Times the linear-algebra primitives the batched-GPR objective is built from,
at a production bucket shape, plus the current nlml value / value+grad
programs. Informs the fused-kernel work (CLAUDE.md perf notes).

Run (TPU, exclusively): python -m tpu_stuff.microbench_linalg [B N]
"""

import sys
import time

import numpy as np


def timeit(name, fn, *args, reps=5):
    import jax
    out = fn(*args)              # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:45s} {dt*1e3:9.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp
    import jax.scipy.linalg as jsl
    import gpsat_tpu  # noqa: F401  (compilation cache setup)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    D = 3
    print(f"device: {jax.devices()[0].device_kind}, B={B}, N={N}, f32")

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-4, 4, (B, N, D)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
    mask = jnp.ones((B, N), bool)
    A = jnp.matmul(X, jnp.swapaxes(X, 1, 2))
    A = A + jnp.eye(N, dtype=jnp.float32) * (N * 20.0)
    V = jnp.asarray(rng.standard_normal((B, N, N)), jnp.float32)

    L = jnp.linalg.cholesky(A)

    timeit("matmul [B,N,N]@[B,N,N]", jax.jit(lambda a, b: a @ b), A, V)
    timeit("cholesky [B,N,N]", jax.jit(jnp.linalg.cholesky), A)
    timeit("trisolve matrix-RHS [B,N,N]",
           jax.jit(lambda l, v: jsl.solve_triangular(l, v, lower=True)), L, V)
    timeit("trisolve vector-RHS [B,N,1]",
           jax.jit(lambda l, v: jsl.solve_triangular(l, v[..., :1], lower=True)),
           L, V)
    timeit("tri-inverse via trisolve-vs-I",
           jax.jit(lambda l: jsl.solve_triangular(
               l, jnp.broadcast_to(jnp.eye(N, dtype=l.dtype), l.shape),
               lower=True)), L)

    # current objective programs
    from gpsat_tpu.ops.gpr import nlml
    params = {"lengthscales": jnp.ones((B, D), jnp.float32) * 2.0,
              "kernel_variance": jnp.ones(B, jnp.float32),
              "likelihood_variance": jnp.full(B, 0.1, jnp.float32)}

    val = jax.jit(jax.vmap(lambda p, x, yy, mm: nlml(p, x, yy, mm,
                                                     "Matern32", 1e-6)))
    vg = jax.jit(jax.vmap(jax.value_and_grad(
        lambda p, x, yy, mm: nlml(p, x, yy, mm, "Matern32", 1e-6))))
    timeit("nlml value (current)", val, params, X, y, mask)
    timeit("nlml value+grad AD (current)", vg, params, X, y, mask)


if __name__ == "__main__":
    main()
