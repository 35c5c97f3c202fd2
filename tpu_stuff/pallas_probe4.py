"""Post-precision-fix check: pallas accuracy vs f64 + full iteration budget
(value, value_and_grad latencies). Run (TPU): python -m tpu_stuff.pallas_probe4
"""
import sys
import time

import numpy as np

from tpu_stuff.pallas_probe3 import np_nlml_f64


def main():
    import jax
    import jax.numpy as jnp
    import gpsat_tpu  # noqa: F401
    from gpsat_tpu.ops import pallas_gpr as pg
    from gpsat_tpu.ops.gpr import nlml_fused

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 69
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    D = 3
    f32 = jnp.float32
    print(f"device: {jax.devices()[0].device_kind} B={B} N={N} "
          f"bt={pg._group_size(512)}", flush=True)
    rng = np.random.default_rng(0)
    Xh = rng.uniform(-4, 4, (B, N, D))
    yh = rng.standard_normal((B, N))
    X = jnp.asarray(Xh, f32); y = jnp.asarray(yh, f32)
    m = jnp.ones((B, N), f32)
    ph = {"lengthscales": np.full((B, D), 2.0),
          "kernel_variance": np.ones(B),
          "likelihood_variance": np.full(B, 0.1)}
    p0 = {k: jnp.asarray(v, f32) for k, v in ph.items()}

    want = np_nlml_f64(ph, Xh, yh, 1e-6)
    got = np.asarray(pg.nlml_value_batched(p0, X, y, m, "Matern32", 1e-6))
    err = np.max(np.abs(got - want) / np.maximum(np.abs(want), 1.0))
    print(f"pallas vs f64 (precision fix): {err:.2e}", flush=True)

    one, tiny = f32(1.0), f32(1e-12)

    def chain(name, valfn):
        @jax.jit
        def run(p):
            def step(i, pp):
                v = valfn(pp)
                return {**pp, "kernel_variance":
                        pp["kernel_variance"] * (one + tiny * jnp.tanh(v))}
            return jax.lax.fori_loop(0, 25, step, p)
        jax.block_until_ready(run(p0))
        t0 = time.perf_counter()
        jax.block_until_ready(run(p0))
        dt = time.perf_counter() - t0
        print(f"{name:34s} {dt/25*1e3:8.3f} ms/eval", flush=True)

    chain("pallas fused value",
          lambda p: pg.nlml_value_batched(p, X, y, m, "Matern32", 1e-6))
    chain("xla bordered value",
          lambda p: jax.vmap(lambda a, b, c, d_: nlml_fused(
              a, b, c, d_, "Matern32", 1e-6))(p0, X, y, m))

    def vg(p):
        f = lambda pp: jnp.sum(jax.vmap(lambda a, b, c, d_: nlml_fused(
            a, b, c, d_, "Matern32", 1e-6))(pp, X, y, m))
        val, grad = jax.value_and_grad(f)(p)
        return val, grad

    @jax.jit
    def run_vg(p):
        def step(i, pp):
            v, g = vg(pp)
            return {**pp, "kernel_variance":
                    pp["kernel_variance"] * (one + tiny * jnp.tanh(
                        v + jnp.sum(g["kernel_variance"])))}
        return jax.lax.fori_loop(0, 25, step, p)
    jax.block_until_ready(run_vg(p0))
    t0 = time.perf_counter()
    jax.block_until_ready(run_vg(p0))
    dt = time.perf_counter() - t0
    print(f"{'xla value_and_grad (adjoint)':34s} {dt/25*1e3:8.3f} ms/eval",
          flush=True)


if __name__ == "__main__":
    main()
