"""Probe: can the fused Pallas NLML value kernel lower+run on real TPU with a
raised recursion limit? Run: python -m tpu_stuff.pallas_probe2 [B N]"""
import sys
import time

import numpy as np


def main():
    sys.setrecursionlimit(100000)
    import jax
    import jax.numpy as jnp
    import gpsat_tpu  # noqa: F401
    from gpsat_tpu.ops.pallas_gpr import nlml_value_batched
    from gpsat_tpu.ops.gpr import nlml_fused

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 69
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    D = 3
    f32 = jnp.float32
    print(f"device: {jax.devices()[0].device_kind} B={B} N={N}", flush=True)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-4, 4, (B, N, D)), f32)
    y = jnp.asarray(rng.standard_normal((B, N)), f32)
    m = jnp.ones((B, N), f32)
    p0 = {"lengthscales": jnp.full((B, D), 2.0, f32),
          "kernel_variance": jnp.ones(B, f32),
          "likelihood_variance": jnp.full(B, 0.1, f32)}

    t0 = time.perf_counter()
    got = np.asarray(nlml_value_batched(p0, X, y, m, "Matern32", 1e-6))
    print(f"pallas compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    want = np.asarray(jax.vmap(lambda a, b, c, d_: nlml_fused(
        a, b, c, d_, "Matern32", 1e-6))(p0, X, y, m))
    err = np.max(np.abs(got - want) / np.maximum(np.abs(want), 1.0))
    print(f"on-device rel err: {err:.2e}", flush=True)

    # chained latency
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
        print(f"{name:30s} {dt/25*1e3:8.3f} ms/eval", flush=True)

    chain("pallas fused value",
          lambda p: nlml_value_batched(p, X, y, m, "Matern32", 1e-6))
    chain("xla bordered value",
          lambda p: jax.vmap(lambda a, b, c, d_: nlml_fused(
              a, b, c, d_, "Matern32", 1e-6))(p, X, y, m))


if __name__ == "__main__":
    main()
