"""Decompose the SGPR pool's per-iteration cost (the round-5 mystery:
per-iter = 7.0 + 0.37*B ms, the 7 ms B-independent share unexplained —
suspects eliminated so far: arg gather method, refill branch, two_loop
sizes; see CLAUDE.md round-5 perf ground truth).

Device-true methodology (sgpr_vg_device_timing.py): ALL inputs are built
on-device from a scalar seed inside the jitted probe, a scalar comes back,
np.asarray materialises the last of a chained batch of executions.

Modes (each is its own program shape -> its own 5-10 min remote compile):
  full      K iterations of the REAL pool body — per-slot arg gather +
            two_loop + _make_step trial + always-false harvest cond —
            with the production fused SGPR vg. No slot converges
            (gtol=0, ftol tiny), so this is the steady-state iteration.
  harness   same body, vg stubbed to a near-free quadratic in u that still
            touches the gathered args (keeps the gather live). full -
            harness = the vg's true in-loop serial cost.
  vgserial  K data-dependent SGPR vg evals in a bare while-style fori loop
            (no gather, no two_loop, no history): the vg's serial LATENCY,
            to compare against the chained-execution throughput number
            (10.7 ms at B=32) which may hide per-execution overlap.

Usage: python tpu_stuff/pool_overhead_probe.py [mode] [B] [K]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

mode = sys.argv[1] if len(sys.argv) > 1 else "full"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 48
K = int(sys.argv[3]) if len(sys.argv) > 3 else 30

from gpsat_tpu.ops import lbfgs as L                        # noqa: E402
from gpsat_tpu.ops.transforms import Softplus               # noqa: E402
from gpsat_tpu.models.batched import make_sgpr_vg_fun       # noqa: E402

N, M, D, E = 2000, 500, 3, 128
P = D + 2
free_names = ("lengthscales", "kernel_variance", "likelihood_variance")
vg_real = make_sgpr_vg_fun("Matern32", free_names, D, 1e-6)


def build_inputs(seed):
    """Production-shape pool args, entirely on device."""
    f32 = jnp.float32
    eidx = jnp.arange(E, dtype=f32)[:, None]
    i = jnp.arange(N, dtype=f32)[None, :]
    X = jnp.stack([jnp.sin(0.1 * i + 0.01 * eidx + seed) * 4.0,
                   jnp.cos(0.13 * i + 0.02 * eidx) * 4.0,
                   jnp.sin(0.07 * i) * 4.0 + 0 * eidx], axis=-1)
    y = jnp.sin(X[..., 0]) + 0.1 * jnp.cos(3.0 * X[..., 1])
    y = y - y.mean(axis=1, keepdims=True)
    mask = jnp.ones((E, N), f32) > 0
    Z = X[:, :M]
    zmask = jnp.ones((E, M), f32) > 0
    bij = {n: Softplus() for n in free_names}
    bij_b = jax.tree.map(lambda a: jnp.broadcast_to(jnp.asarray(
        a, f32), (E,) + jnp.shape(a)), bij)
    fixed = {}
    u0 = jnp.concatenate([
        jnp.log(jnp.expm1(0.8 + 0.05 * eidx / E + 0.001 * seed))
        * jnp.ones((E, D), f32),
        jnp.log(jnp.expm1(0.5)) * jnp.ones((E, 1), f32),
        jnp.log(jnp.expm1(0.05)) * jnp.ones((E, 1), f32)], axis=-1)
    return u0, (X, y, mask, Z, zmask, bij_b, fixed)


def vg_stub(u, X, y, mask, Z, zmask, bijectors, fixed):
    # near-free, but reads every gathered float leaf so the gather stays
    # live in the program
    touch = (jnp.sum(X[:, 0, 0]) + jnp.sum(y[:, 0]) + jnp.sum(Z[:, 0, 0])
             + jnp.sum(zmask[:, 0].astype(u.dtype)))
    f = 0.5 * jnp.sum(u * u, axis=-1) + 1e-12 * touch
    return f, u


def make_pool_probe(vg_fun):
    """K iterations of the _pool_core body (fixed trip count, no harvest
    fires — gtol=0/ftol=1e-30/max_iter huge keep every slot live)."""
    gtol, ftol, max_iter, m, mls, rec = 0.0, 1e-30, 10 ** 6, 10, 8, 0

    @jax.jit
    def probe(seed):
        u0_all, args_all = build_inputs(seed)
        dtype = u0_all.dtype

        def gather(ids):
            oh = ids[:, None] == jnp.arange(E, dtype=ids.dtype)[None, :]

            def one(a):
                if jnp.issubdtype(a.dtype, jnp.floating) and a.ndim >= 1 \
                        and a.shape[0] == E:
                    flat = a.reshape(E, -1)
                    out = jax.lax.dot(oh.astype(a.dtype), flat,
                                      precision=jax.lax.Precision.HIGHEST)
                    return out.reshape(ids.shape[:1] + a.shape[1:])
                return a[ids]

            return jax.tree.map(one, args_all)

        def vg_at(ids):
            def vg(x):
                return vg_fun(x, *gather(ids))
            return vg

        ids0 = jnp.arange(B)
        carry0 = L._init_carry(vg_at(ids0), u0_all[:B], gtol, m)
        live0 = jnp.ones(B, bool)

        def body(_, st):
            carry, slot_expert, live = st
            step = L._make_step(vg_at(slot_expert), B, P, dtype, max_iter,
                                gtol, ftol, m, mls, rec)
            carry = step(carry)
            harvest = carry[8] & live
            # mirror _pool_core's per-iteration lax.cond (predicate is
            # always false here; the cond itself is part of the cost)
            slot_expert, live = jax.lax.cond(
                jnp.any(harvest),
                lambda se, lv: (se, lv & ~harvest),
                lambda se, lv: (se, lv), slot_expert, live)
            return carry, slot_expert, live

        carry, slot_expert, live = jax.lax.fori_loop(
            0, K, body, (carry0, ids0, live0))
        return (carry[2].sum() + carry[1].sum() + carry[11].sum()
                + slot_expert.sum() + live.sum())

    return probe


def make_vgserial_probe():
    @jax.jit
    def probe(seed):
        u0_all, args_all = build_inputs(seed)
        args_b = jax.tree.map(
            lambda a: a[:B] if hasattr(a, "ndim") and a.ndim >= 1
            and a.shape[0] == E else a, args_all)
        u0 = u0_all[:B]

        def body(_, u):
            f, g = vg_real(u, *args_b)
            return u - 1e-6 * g        # data-dependent: forces serial evals

        u = jax.lax.fori_loop(0, K, body, u0)
        return u.sum()

    return probe


if mode == "full":
    probe = make_pool_probe(vg_real)
elif mode == "harness":
    probe = make_pool_probe(vg_stub)
elif mode == "vgserial":
    probe = make_vgserial_probe()
else:
    raise SystemExit(f"unknown mode {mode!r}")

seeds = [jnp.float32(k) for k in range(8)]
np.asarray(probe(seeds[6]))          # compile + first exec
np.asarray(probe(seeds[7]))          # warm check
t0 = time.perf_counter()
outs = [probe(seeds[k]) for k in range(6)]
np.asarray(outs[-1])
dt = (time.perf_counter() - t0) / 6
print(f"pool_overhead[{mode}] B={B} K={K}: {dt * 1e3:.1f} ms/exec = "
      f"{dt * 1e3 / K:.2f} ms/iter", flush=True)
