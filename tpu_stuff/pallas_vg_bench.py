"""Validate + time the fused NLML value_and_grad kernel on real TPU.

Checks the Mosaic lowering agrees with the XLA adjoint path, then times the
kernel vs the XLA vg at bench shapes.

Run (TPU, exclusively): python -m tpu_stuff.pallas_vg_bench [B N]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import gpsat_tpu  # noqa: F401
    from gpsat_tpu.ops.gpr import nlml_fused
    from gpsat_tpu.ops.pallas_gpr import nlml_vg_batched

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 69
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    D = 3
    rng = np.random.default_rng(0)
    X = rng.uniform(-4, 4, (B, N, D))
    y = rng.standard_normal((B, N))
    mask = np.ones((B, N), bool)
    mask[0, N // 2:] = False
    params = {"lengthscales": rng.uniform(0.5, 3, (B, D)),
              "kernel_variance": rng.uniform(0.5, 2, B),
              "likelihood_variance": rng.uniform(0.01, 0.2, B)}

    p32 = {k: jnp.asarray(v, jnp.float32) for k, v in params.items()}
    X32 = jnp.asarray(X, jnp.float32)
    y32 = jnp.asarray(y, jnp.float32)
    m32 = jnp.asarray(mask.astype(np.float32))

    pal = jax.jit(lambda p: nlml_vg_batched(p, X32, y32, m32, "Matern32",
                                            1e-6))
    xla = jax.jit(lambda p: jax.vmap(jax.value_and_grad(
        lambda pp, x, yy, mm: nlml_fused(pp, x, yy, mm, "Matern32", 1e-6)))(
        p, X32, y32, m32))

    t0 = time.perf_counter()
    val, grads = jax.block_until_ready(pal(p32))
    print(f"pallas compile+run: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    wval, wg = jax.block_until_ready(xla(p32))
    print(f"xla compile+run:    {time.perf_counter()-t0:.1f}s")

    np.testing.assert_allclose(np.asarray(val), np.asarray(wval),
                               rtol=2e-5, atol=1e-3)
    for k in grads:
        err = np.max(np.abs(np.asarray(grads[k]) - np.asarray(wg[k])) /
                     (np.abs(np.asarray(wg[k])) + 1e-3))
        print(f"grad {k}: max rel err {err:.2e}")
        np.testing.assert_allclose(np.asarray(grads[k]), np.asarray(wg[k]),
                                   rtol=2e-2, atol=2e-2)
    print("MATCH OK")

    def timeit(f, n=20):
        f()
        t0 = time.perf_counter()
        for _ in range(n):
            r = f()
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / n

    t_p = timeit(lambda: pal(p32))
    t_x = timeit(lambda: xla(p32))
    print(f"B={B} N={N}: pallas vg {t_p*1e3:.2f} ms | xla vg {t_x*1e3:.2f} ms "
          f"| speedup {t_x/t_p:.2f}x")


if __name__ == "__main__":
    main()
