"""Pallas NLML value kernel: accuracy vs f64 + group-size (bt) sweep.
Run (TPU): python -m tpu_stuff.pallas_probe3 [B N]
"""
import sys
import time

import numpy as np


def np_nlml_f64(p, X, y, jitter):
    """Exact f64 masked NLML (numpy oracle), Matern32."""
    B, N, D = X.shape
    out = np.empty(B)
    for i in range(B):
        ls = p["lengthscales"][i]
        sf2 = p["kernel_variance"][i]
        sn2 = p["likelihood_variance"][i] + jitter
        Xs = X[i] / ls
        d2 = ((Xs[:, None, :] - Xs[None, :, :]) ** 2).sum(-1)
        r = np.sqrt(np.maximum(3.0 * d2, 1e-36))
        K = sf2 * (1 + r) * np.exp(-r) + np.eye(N) * sn2
        L = np.linalg.cholesky(K)
        al = np.linalg.solve(L.T, np.linalg.solve(L, y[i]))
        out[i] = (0.5 * y[i] @ al + np.log(np.diag(L)).sum()
                  + 0.5 * N * np.log(2 * np.pi))
    return out


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
    print(f"device: {jax.devices()[0].device_kind} B={B} N={N}", flush=True)
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
    xla = np.asarray(jax.vmap(lambda a, b, c, d_: nlml_fused(
        a, b, c, d_, "Matern32", 1e-6))(p0, X, y, m))
    err_x = np.max(np.abs(xla - want) / np.maximum(np.abs(want), 1.0))
    print(f"XLA f32 vs f64:    {err_x:.2e}", flush=True)

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

    for bt_cap in [16, 24, 40]:
        pg._VMEM_BUDGET = 64 * 2**20
        orig = pg._group_size
        pg._group_size = lambda n, cap=bt_cap: min(
            max(2, int(pg._VMEM_BUDGET // (n * (n + pg._T) * 4))), cap)
        pg._nlml_value_call._clear_cache() if hasattr(
            pg._nlml_value_call, "_clear_cache") else None
        got = np.asarray(pg.nlml_value_batched(p0, X, y, m, "Matern32", 1e-6))
        err_p = np.max(np.abs(got - want) / np.maximum(np.abs(want), 1.0))
        print(f"pallas bt<={bt_cap}: vs f64 {err_p:.2e}", flush=True)
        chain(f"pallas fused value bt<={bt_cap}",
              lambda p: pg.nlml_value_batched(p, X, y, m, "Matern32", 1e-6))
        pg._group_size = orig

    chain("xla bordered value",
          lambda p: jax.vmap(lambda a, b, c, d_: nlml_fused(
              a, b, c, d_, "Matern32", 1e-6))(p0, X, y, m))


if __name__ == "__main__":
    main()
