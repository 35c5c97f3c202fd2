"""Bisect which construct breaks Mosaic lowering in the probe kernel.

Run (TPU): python -m tpu_stuff.pallas_bisect
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = 128
    f32 = jnp.float32
    a = jnp.asarray(np.random.default_rng(0).uniform(1, 2, (8, T, T)), f32)

    def make(body):
        def kernel(a_ref, o_ref, blk):
            blk[:] = a_ref[:]
            acc = jax.lax.fori_loop(0, 64, lambda j, acc: body(blk, j, acc),
                                    f32(0.0))
            o_ref[:] = blk[:] + acc
        return jax.jit(lambda x: pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM(x.shape, f32)])(x))

    lane = None

    def v_noop(blk, j, acc):
        blk[:] = blk[:] * f32(1.0)
        return acc + f32(1.0)

    def v_dynrow(blk, j, acc):
        jj = jnp.mod(j, T)
        row = blk[:, pl.ds(jj, 1), :]
        return acc + jnp.sum(row)

    def v_eqmask(blk, j, acc):
        import jax.lax as lax
        jj = jnp.mod(j, T)
        lane = lax.broadcasted_iota(jnp.int32, (1, 1, T), 2)
        row = blk[:, pl.ds(jj, 1), :]
        piv2 = jnp.sum(jnp.where(lane == jj, row, f32(0.0)), axis=2,
                       keepdims=True)
        return acc + jnp.sum(piv2)

    def v_rank1(blk, j, acc):
        import jax.lax as lax
        jj = jnp.mod(j, T)
        lane = lax.broadcasted_iota(jnp.int32, (1, 1, T), 2)
        sub = lax.broadcasted_iota(jnp.int32, (1, T, 1), 1)
        row = blk[:, pl.ds(jj, 1), :]
        u = row * jnp.where(lane >= jj, f32(1.0), f32(0.0))
        coef = jnp.swapaxes(u, 1, 2)
        rmask = jnp.where(sub > jj, f32(1.0), f32(0.0))
        blk[:] = blk[:] - (coef * rmask) * u * f32(1e-6)
        return acc + jnp.sum(u)

    def v_rowstore(blk, j, acc):
        jj = jnp.mod(j, T)
        row = blk[:, pl.ds(jj, 1), :]
        blk[:, pl.ds(jj, 1), :] = row * f32(0.999)
        return acc + f32(1.0)

    for name, v in [("noop", v_noop), ("dynrow", v_dynrow),
                    ("eqmask", v_eqmask), ("rank1", v_rank1),
                    ("rowstore", v_rowstore)]:
        try:
            out = make(v)(a)
            jax.block_until_ready(out)
            print(f"{name:10s} OK", flush=True)
        except Exception as e:
            msg = str(e).split(chr(10))[0][:120]
            print(f"{name:10s} FAIL: {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()


def depth_test():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    T = 128
    f32 = jnp.float32
    a = jnp.asarray(np.random.default_rng(0).uniform(1, 2, (8, T, T)), f32)

    def make(K):
        def kernel(a_ref, o_ref, blk):
            import jax.lax as lax
            blk[:] = a_ref[:]
            lane = lax.broadcasted_iota(jnp.int32, (1, 1, T), 2)
            sub = lax.broadcasted_iota(jnp.int32, (1, T, 1), 1)

            def step(j, acc):
                jj = jnp.mod(j, T)
                row = blk[:, pl.ds(jj, 1), :]
                piv2 = jnp.sum(jnp.where(lane == jj, row, f32(0.0)), axis=2,
                               keepdims=True)
                piv = jnp.sqrt(jnp.maximum(piv2, f32(1e-9)))
                u = row / piv * jnp.where(lane >= jj, f32(1.0), f32(0.0))
                rmask = jnp.where(sub > jj, f32(1.0), f32(0.0))
                coef = jnp.swapaxes(u, 1, 2)
                blk[:] = blk[:] - (coef * rmask) * u * f32(1e-6)
                return acc + jnp.sum(piv)

            acc = jax.lax.fori_loop(0, K, step, f32(0.0))
            o_ref[:] = blk[:] + acc
        return jax.jit(lambda x: pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM(x.shape, f32)])(x))

    import time
    for K in (64, 128, 256, 512):
        try:
            fn = make(K)
            jax.block_until_ready(fn(a))
            t0 = time.perf_counter()
            for _ in range(5):
                out = fn(a)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / 5
            print(f"K={K:4d} OK  {dt*1e3:8.3f} ms = {dt/K*1e6:6.2f} us/step",
                  flush=True)
        except Exception as e:
            print(f"K={K:4d} FAIL {type(e).__name__}", flush=True)


if __name__ == "__main__":
    depth_test()
