"""Microbench: per-eval cost split of the L-BFGS hot loop at bench shapes.

Measures, at [B, N] f32 (bench: B=69 slots, N=400):
  1. Pallas fused NLML value (the linesearch path)
  2. XLA bordered-Cholesky NLML value (nlml_fused forward)
  3. XLA value_and_grad (analytic adjoint: tri-inverse + matmul + kernel VJP)

Per L-BFGS iteration the loop pays ~k value evals (k = linesearch trips,
typically 1-3) + 1 value_and_grad. This script sizes the win of fusing the
value_and_grad path into Pallas.

Run (TPU, exclusively): python -m tpu_stuff.microbench_vg [B N]
"""

import sys
import time

import numpy as np


def timeit(f, n=20):
    f()  # warm-up/compile
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    jax_block(r)
    return (time.perf_counter() - t0) / n


def jax_block(r):
    import jax
    jax.tree.map(lambda a: a.block_until_ready()
                 if hasattr(a, "block_until_ready") else a, r)


def main():
    import jax
    import jax.numpy as jnp
    import gpsat_tpu  # noqa: F401
    from gpsat_tpu.models.exact_gpr import (make_gpr_objective,
                                            make_gpr_value_fun)
    from gpsat_tpu.ops.transforms import Softplus
    sys.path.insert(0, ".")
    from bench import make_workload

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 69
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    D = 3
    dtype = jnp.float32
    X, z, _ = make_workload(B, N, 4, D)
    y = z - z.mean(axis=1, keepdims=True)
    mask = np.ones((B, N), dtype=bool)

    free_names = ("lengthscales", "kernel_variance", "likelihood_variance")
    objective, spec = make_gpr_objective("Matern32", free_names, D)
    value_fun = make_gpr_value_fun("Matern32", free_names, D)

    bij = {n: Softplus() for n in free_names}
    bij_b = jax.tree.map(
        lambda a: jnp.broadcast_to(jnp.asarray(a, dtype), (B,) + jnp.asarray(a).shape),
        bij)
    fixed = {}
    u0 = jnp.zeros((B, D + 2), dtype)
    Xd = jnp.asarray(X, dtype)
    yd = jnp.asarray(y, dtype)
    md = jnp.asarray(mask)
    args = (Xd, yd, md, bij_b, fixed)

    pallas_value = jax.jit(lambda u: value_fun(u, *args))
    xla_value = jax.jit(lambda u: jax.vmap(
        lambda ui, xi, yi, mi, bi: objective(ui, xi, yi, mi, bi, fixed))(
        u, Xd, yd, md, bij_b))
    xla_vg = jax.jit(lambda u: jax.vmap(
        lambda ui, xi, yi, mi, bi: jax.value_and_grad(
            lambda v: objective(v, xi, yi, mi, bi, fixed))(ui))(
        u, Xd, yd, md, bij_b))

    t_pv = timeit(lambda: pallas_value(u0))
    t_xv = timeit(lambda: xla_value(u0))
    t_vg = timeit(lambda: xla_vg(u0))

    dev = jax.devices()[0]
    print(f"B={B} N={N} D={D} f32 device={dev.platform}:{dev.device_kind}")
    print(f"pallas value      : {t_pv*1e3:8.2f} ms")
    print(f"xla value         : {t_xv*1e3:8.2f} ms")
    print(f"xla value_and_grad: {t_vg*1e3:8.2f} ms")
    for k in (1, 2, 3, 5):
        tot = k * t_pv + t_vg
        print(f"  trips={k}: iter={tot*1e3:7.2f} ms  vg share={t_vg/tot:.0%}")


if __name__ == "__main__":
    main()
