"""Probe Mosaic/Pallas costs that decide the fused-Cholesky kernel design:

1. per-iteration overhead of a fori_loop doing a dynamic-row read + masked
   rank-1 update on a VMEM-resident [Bt, T, T] block (the unblocked-Cholesky
   inner step) — the XLA equivalent costs ~15 us/step (in-loop chol is
   ~6.6 ms at N=400: tpu_stuff/microbench_chain.py);
2. grid-step overhead (grid serialises on one core).

Run (TPU, exclusively): python -m tpu_stuff.pallas_probe
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import gpsat_tpu  # noqa: F401

    T = 128
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    def probe_kernel(a_ref, out_ref, blk):
        # blk: [Bt, T, T] VMEM scratch; dynamic row indexing must go through
        # the ref (Mosaic has no dynamic_slice on loop-carried values)
        blk[:] = a_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, T), 2)
        sub = jax.lax.broadcasted_iota(jnp.int32, (1, T, 1), 1)

        f32 = jnp.float32
        zero = f32(0.0)
        eps = f32(1e-9)
        sc = f32(1e-6)
        one = f32(1.0)

        def step(j, acc):
            jj = jnp.mod(j, T)
            row = blk[:, pl.ds(jj, 1), :]                          # [Bt,1,T]
            piv2 = jnp.sum(jnp.where(lane == jj, row, zero), axis=2,
                           keepdims=True)                          # [Bt,1,1]
            piv = jnp.sqrt(jnp.maximum(piv2, eps))
            u = row / piv * jnp.where(lane >= jj, one, zero)
            rmask = jnp.where(sub > jj, one, zero)
            coef = jnp.swapaxes(u, 1, 2)                           # [Bt,T,1]
            blk[:] = blk[:] - (coef * rmask) * u * sc
            return acc + jnp.sum(piv)

        acc = jax.lax.fori_loop(0, 512, step, jnp.float32(0))
        out_ref[:] = blk[:] + acc

    @jax.jit
    def run(a):
        Bt = a.shape[0]
        return pl.pallas_call(
            lambda a_ref, o_ref, blk: probe_kernel(a_ref, o_ref, blk),
            out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM(a.shape, jnp.float32)],
        )(a)

    rng = np.random.default_rng(0)
    for Bt in (1, 8, 32, 69):
        a = jnp.asarray(rng.uniform(1.0, 2.0, (Bt, T, T)), jnp.float32)
        jax.block_until_ready(run(a))
        t0 = time.perf_counter()
        for _ in range(5):
            out = run(a)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 5
        print(f"rank1-loop [Bt={Bt:3d},{T},{T}] 512 steps: "
              f"{dt*1e3:8.3f} ms = {dt/512*1e6:6.2f} us/step", flush=True)

    # grid-step overhead: tiny kernel, many grid steps
    def tiny(a_ref, o_ref):
        o_ref[:] = a_ref[:] * 2.0

    for G in (1, 9, 35, 69):
        a = jnp.asarray(rng.standard_normal((G, 8, 128)), jnp.float32)

        @jax.jit
        def grun(a):
            return pl.pallas_call(
                tiny,
                out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
                grid=(a.shape[0],),
                in_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            )(a)

        jax.block_until_ready(grun(a))
        t0 = time.perf_counter()
        for _ in range(10):
            out = grun(a)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 10
        print(f"grid overhead G={G:3d}: {dt*1e3:7.3f} ms "
              f"({dt/G*1e6:6.2f} us/grid-step)", flush=True)


if __name__ == "__main__":
    main()
