"""Batched L-BFGS with per-expert convergence — TPU-first design.

Replaces the reference's per-expert scipy L-BFGS-B loop
(reference: GPSat/models/gpflow_models.py:317-321 via gpflow.optimizers.Scipy)
with one compiled program optimising a whole batch of independent experts.

Design note (the hard-won TPU lesson): the loop lives at the *batch* level and
only the objective is vmapped. Putting a while_loop inside vmap makes every
L-BFGS history access a batched dynamic index, which XLA lowers to TPU
gather/scatter — ~1000x slower than the elementwise/reduction ops used here.
With a scalar ring pointer the history updates are dynamic-slice ops on a
[m, B, P] buffer and the whole iteration is VPU-friendly. Per-expert
convergence is a [B] done-mask; converged experts freeze while others
continue.
"""

from functools import partial

import jax
import jax.numpy as jnp
import optax

__all__ = ["batched_lbfgs", "LBFGSResult", "linesearch_policy"]


def linesearch_policy(dtype, kind="gpr", n=None):
    """(max_linesearch_steps, recovery_steps) by working precision,
    objective family, and (for exact GPR) a LOWER BOUND on the per-expert
    VALID data size (callers pass min over experts of the masked count, not
    the padded bucket width — a padded-width gate silently dropped the
    recovery chain for small heavily-masked experts in wide buckets).

    f32 (the TPU production dtype): the objective's noise floor is
    ~1e-4 relative, so deep backtracking chains grind noise — don't probe
    scales below 2^-8 (measured on the bench sweep: <2% of accepted steps
    used t < 2^-8, each costing 8+ rejected evals).

    The post-fail steepest-descent recovery chain is per-family:

    - "gpr" (exact NLML): size-gated. On SMALL experts the recovery is
      essential — ending on the first exhausted chain lost up to 0.41
      absolute NLML (mean 8.6e-3 rel) on multimodal N=150 problems, the
      round-3 "plateau escape" finding reproduced with fresh data. At
      N >= 256 the same multimodal construction shows the recovery worth
      NOTHING (max delta 9e-5 across seeds at N=256/300/400, bench
      workload delta ~1e-7), while costing 12% of all live trials at the
      bench shape (trials/accept 1.82 -> 1.59, classification probe in
      tpu_stuff/linesearch_stats.py driven at N=400). Gate: min VALID
      size n >= 256 drops the recovery (N=256 is the smallest
      measured-safe size); the harmful ~150-size regime keeps the
      4-halving recovery regardless of how wide its padded bucket is.
    - "vff" (VFF/ASVGP collapsed bound): always (8, 4) in f32. The
      size-gated drop was validated ONLY on the exact-GPR NLML objective;
      VFF workloads routinely have large N, so an inherited "gpr" gate
      would silently apply an unvalidated policy to a different objective
      family (round-4 advisor finding).
    - "sgpr" (collapsed ELBO): NO recovery halvings at any size (one free
      steepest-descent trial post-reset, then done). Measured at the
      production profile N=2000/M=500 AND small-expert N=200/M=64 across
      seeds (tpu_stuff/sgpr_linesearch_stats.py): the recovery chain
      recovered 0 accepts and the final objective is bit-identical with it
      removed, while trials/accept drops 2.11 -> 1.82 (prod) and
      1.69 -> 1.53 (small) — the SGPR endgame was pure noise-grinding.

    f64: the conservative scipy-style policy (full 12-step chains) for
    every family — f64 Armijo is sharp, chains rarely exhaust, and the f32
    endgame pathology does not exist (see also the f64 eager-regrowth
    branch in _make_step).
    """
    if jnp.dtype(dtype) == jnp.float32:
        if kind == "sgpr":
            return 8, 0
        if kind == "gpr" and n is not None and n >= 256:
            return 8, 0
        return 8, 4
    return 12, 12


class LBFGSResult(dict):
    """dict with attribute access: x, fun, converged, iterations."""

    def __getattr__(self, item):
        try:
            return self[item]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(item) from e


def _make_step(batched_value_and_grad, B, P, dtype, max_iter,
               gtol, ftol, memory_size, max_linesearch_steps,
               recovery_steps=None):
    """Build the per-iteration body over the L-BFGS carry tuple
    (it, x, f, g, S, Y, rho, gamma, done, iters, fail_cnt, t, backed).

    `it` is the global scalar iteration (ring-pointer base); `iters` counts
    per-slot ACCEPTED steps, so slots (re)filled mid-run — the pool path —
    get correct per-expert budgets and statistics.

    ONE trial point per iteration, evaluated with value_and_grad; `t` [B]
    carries each slot's Armijo backtracking scale ACROSS iterations
    (halved on rejection, reset to 1 on acceptance). This replaces the
    earlier inner linesearch while_loop, whose rounds were batch-coupled:
    it ran until EVERY slot accepted, and with ~70 pooled slots some slot
    nearly always rejected deep, so virtually every iteration paid the
    full `max_linesearch_steps` value evaluations (measured 57 ms/iter
    ~= 12 x value + 1 x vg at [69,400] f32). Per-slot trials cost one
    fused value_and_grad each (~5.5 ms) and rejections no longer stall
    the rest of the batch. Rejected iterations retain the slot's previous
    ring-history entry, so the preconditioner is not diluted."""
    m = memory_size

    def two_loop(g, S, Y, rho, gamma, ptr):
        """Search direction -H g for all experts; S/Y: [m, B, P], rho: [m, B],
        gamma: [B]. ptr is the *scalar* ring position of the next write."""
        def bwd(i, carry):
            q, alpha = carry
            idx = jnp.mod(ptr - 1 - i, m)
            s_i = jax.lax.dynamic_index_in_dim(S, idx, axis=0, keepdims=False)
            y_i = jax.lax.dynamic_index_in_dim(Y, idx, axis=0, keepdims=False)
            r_i = jax.lax.dynamic_index_in_dim(rho, idx, axis=0, keepdims=False)
            a_i = r_i * jnp.sum(s_i * q, axis=-1)          # [B]; rho=0 -> no-op
            q = q - a_i[:, None] * s_i
            return q, jax.lax.dynamic_update_index_in_dim(alpha, a_i, idx, axis=0)

        q, alpha = jax.lax.fori_loop(0, m, bwd, (g, jnp.zeros((m, B), dtype)))
        r = gamma[:, None] * q

        def fwd(i, r):
            idx = jnp.mod(ptr - m + i, m)
            s_i = jax.lax.dynamic_index_in_dim(S, idx, axis=0, keepdims=False)
            y_i = jax.lax.dynamic_index_in_dim(Y, idx, axis=0, keepdims=False)
            r_i = jax.lax.dynamic_index_in_dim(rho, idx, axis=0, keepdims=False)
            a_i = jax.lax.dynamic_index_in_dim(alpha, idx, axis=0, keepdims=False)
            b_i = r_i * jnp.sum(y_i * r, axis=-1)
            return r + jnp.where(r_i > 0, a_i - b_i, 0.0)[:, None] * s_i

        r = jax.lax.fori_loop(0, m, fwd, r)
        return -r

    # (quadratic-interpolation trial steps were measured on real TPU and
    # rejected: f32 objective noise breaks them, conv 1.00 -> 0.01,
    # tpu_stuff/microbench_trip.py)
    t_min = 0.5 ** max_linesearch_steps   # python float: weak-typed ops keep
                                          # the carry dtype
    # the post-reset steepest-descent recovery chain may be shorter (f32
    # policy: 4 halvings) — see linesearch_policy
    t_min_rec = 0.5 ** (recovery_steps if recovery_steps is not None
                        else max_linesearch_steps)

    # unit-trial cap for STEEPEST-DESCENT-LIKE directions only (no usable
    # curvature history, or a non-descent two-loop result): those can have
    # |d| ~ 1e3+ in the unconstrained/log-ish parameter space and burned
    # ~12 halvings per accepted step (measured 21.5 trials/accept on the
    # bench sweep). Proper L-BFGS directions are gamma-scaled and keep the
    # plain unit trial — capping THEM throttles progress (measured: 5/7
    # small-case experts crawl into the iteration cap with a global cap).
    _DMAX = 2.0

    def body(carry):
        it, x, f, g, S, Y, rho, gamma, done, iters, fail_cnt, t, backed = carry
        d = two_loop(g, S, Y, rho, gamma, it)
        gd = jnp.sum(g * d, axis=-1)
        bad_dir = ~jnp.isfinite(gd) | (gd >= 0)
        d = jnp.where(bad_dir[:, None], -g, d)
        gd = jnp.where(bad_dir, -jnp.sum(g * g, axis=-1), gd)
        no_hist = ~jnp.any(rho > 0, axis=0)
        dinf = jnp.max(jnp.abs(d), axis=-1)
        t_base = jnp.where(bad_dir | no_hist,
                           jnp.minimum(1.0, _DMAX / jnp.maximum(dinf, 1e-30)),
                           1.0)
        step = t * t_base

        x_try = x + step[:, None] * d
        f_try, g_try = batched_value_and_grad(x_try)
        accept = (~done) & jnp.isfinite(f_try) & (
            f_try <= f + 1e-4 * step * gd)

        s = x_try - x
        yv = g_try - g
        sy = jnp.sum(s * yv, axis=-1)
        s_norm = jnp.linalg.norm(s, axis=-1)
        y_norm = jnp.linalg.norm(yv, axis=-1)
        keep = accept & (sy > 1e-10 * s_norm * y_norm)

        # rejected slots RETAIN their previous entry at the ring position
        # (each accepted pair lands in one distinct slot, so entries are
        # per-slot stale, never duplicated): zero-wiping on rejection
        # diluted the preconditioner enough to inflate accepted-step counts
        # past max_iter on small problems
        ptr = jnp.mod(it, m)
        s_old = jax.lax.dynamic_index_in_dim(S, ptr, axis=0, keepdims=False)
        y_old = jax.lax.dynamic_index_in_dim(Y, ptr, axis=0, keepdims=False)
        r_old = jax.lax.dynamic_index_in_dim(rho, ptr, axis=0,
                                             keepdims=False)
        S = jax.lax.dynamic_update_index_in_dim(
            S, jnp.where(keep[:, None], s, s_old), ptr, axis=0)
        Y = jax.lax.dynamic_update_index_in_dim(
            Y, jnp.where(keep[:, None], yv, y_old), ptr, axis=0)
        rho_new = jnp.where(keep, 1.0 / jnp.where(sy == 0, 1.0, sy), r_old)
        rho = jax.lax.dynamic_update_index_in_dim(rho, rho_new, ptr, axis=0)
        yy = jnp.sum(yv * yv, axis=-1)
        gamma = jnp.where(keep & (yy > 0), sy / jnp.maximum(yy, 1e-300), gamma)

        grad_small = accept & (jnp.max(jnp.abs(g_try), axis=-1) < gtol)
        # f-stagnation on any accepted step from a finite point (scipy
        # L-BFGS-B semantics; pool-refilled slots carry f=inf through their
        # bootstrap pass, so isfinite(f) keeps them alive: |inf - f0| <=
        # ftol*inf would be vacuously true)
        f_change = accept & jnp.isfinite(f) & (
            jnp.abs(f - f_try) <= ftol * jnp.maximum(
                jnp.maximum(jnp.abs(f), jnp.abs(f_try)), 1.0))
        # a slot fails when its backtracking scale is exhausted without an
        # acceptable point. First failure: reset that slot's curvature
        # history so the next direction is steepest descent (the scipy
        # recovery) with a fresh t=1 but a possibly SHORTER chain
        # (t_min_rec; the f32 policy gives the recovery 4 halvings — it
        # recovered only 2.5% of accepts on the production-shape bench,
        # where the endgame grinds the f32 noise floor, but rescues small/
        # multimodal experts stuck on plateaus, where ending on the first
        # exhausted chain measurably lost ~2-3% of objective). A second
        # exhausted chain ends the slot.
        fail = (~accept) & (~done) & (
            t <= jnp.where(fail_cnt >= 1, t_min_rec, t_min))
        fail_cnt = jnp.where(fail, fail_cnt + 1,
                             jnp.where(accept, 0, fail_cnt))
        hard_fail = fail & (fail_cnt >= 2)
        reset = fail & (~hard_fail) & (fail_cnt == 1)
        rho = jnp.where(reset[None, :], 0.0, rho)
        gamma = jnp.where(reset, 1.0, gamma)
        iters = iters + jnp.where(accept, 1, 0)
        hit_cap = iters >= max_iter
        newly_done = (~done) & (grad_small | f_change | hard_fail | hit_cap)

        x = jnp.where(accept[:, None], x_try, x)
        f = jnp.where(accept, f_try, f)
        g = jnp.where(accept[:, None], g_try, g)
        # warm-started trial scale — PRECISION-DEPENDENT growth policy
        # (python-level branch on the carry dtype: no new static args, the
        # f32 program is unchanged).
        #
        # f32 (clean-accept gating; round-3 trials/accept lever, measured
        # via tpu_stuff/pool_iter_probe.py): `backed` marks a slot whose
        # scale was halved since its last accepted step. A CLEAN accept
        # (first-trial accept) probes upward 2x; a BACKTRACKED accept keeps
        # t — the halving just calibrated it at the f32-noise acceptance
        # boundary, and re-growing (the old 4x-always rule) immediately
        # re-pays the halvings (steady-state 4 trials per 2 accepts vs 3).
        #
        # f64 must NOT gate growth: with exact arithmetic the Armijo test
        # is sharp, a grown trial is often rejected (setting `backed`), and
        # gated t then stays pinned small — slots crawl through hundreds of
        # real-but-tiny accepted steps that never trip ftol=1e-11
        # (observed: seasonal-driver experts at 150-230 accepted
        # iterations, 3-4x the r2 trajectories). Eager 4x-per-accept
        # regrowth restores the r2 behaviour.
        if jnp.dtype(dtype) == jnp.float32:
            t = jnp.where(done, t,
                          jnp.where(accept & ~backed,
                                    jnp.minimum(1.0, t * 2.0),
                                    jnp.where(accept, t,
                                              jnp.where(fail, 1.0, t * 0.5))))
        else:
            t = jnp.where(done, t,
                          jnp.where(accept, jnp.minimum(1.0, t * 4.0),
                                    jnp.where(fail, 1.0, t * 0.5)))
        backed = jnp.where(done, backed,
                           jnp.where(accept | fail, False, True))
        done = done | newly_done
        return (it + 1, x, f, g, S, Y, rho, gamma, done, iters, fail_cnt, t,
                backed)

    return body


def _init_carry(batched_value_and_grad, x0, gtol, memory_size):
    B, P = x0.shape
    m = memory_size
    dtype = x0.dtype
    f0, g0 = batched_value_and_grad(x0)
    S0 = jnp.zeros((m, B, P), dtype)
    Y0 = jnp.zeros((m, B, P), dtype)
    rho0 = jnp.zeros((m, B), dtype)
    gamma0 = jnp.ones(B, dtype)
    done0 = ~jnp.isfinite(f0) | (jnp.max(jnp.abs(g0), axis=-1) < gtol)
    return (jnp.asarray(0, jnp.int32), x0, f0, g0, S0, Y0, rho0, gamma0,
            done0, jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32),
            jnp.ones(B, dtype), jnp.zeros(B, bool))


def _batch_lbfgs_loop(batched_value_and_grad, x0, max_iter,
                      gtol, ftol, memory_size, max_linesearch_steps,
                      recovery_steps=None):
    """Core batch-level loop. x0: [B, P]. Returns (x, f, converged, iters)."""
    B, P = x0.shape
    body = _make_step(batched_value_and_grad, B, P, x0.dtype,
                      max_iter, gtol, ftol, memory_size, max_linesearch_steps,
                      recovery_steps)

    # each global iteration is one TRIAL; a slot needs at most
    # (max_linesearch_steps + 1) trials per accepted step, and hard-fail /
    # hit_cap bound every slot, so this global cap is a pure backstop
    it_cap = max_iter * (max_linesearch_steps + 2)

    def cond(carry):
        it, done = carry[0], carry[8]
        return (it < it_cap) & jnp.any(~done)

    carry0 = _init_carry(batched_value_and_grad, x0, gtol, memory_size)
    out = jax.lax.while_loop(cond, body, carry0)
    x, f, done, iters = out[1], out[2], out[8], out[9]
    # slots that only exhausted their per-slot budget are not converged
    return x, f, done & (iters < max_iter), iters


@partial(jax.jit, static_argnames=("fun", "max_iter", "gtol", "ftol",
                                   "memory_size", "max_linesearch_steps",
                                   "engine", "vg_fun", "recovery_steps"))
def _batched_lbfgs_jit(fun, x0, args, max_iter, gtol, ftol,
                       memory_size, max_linesearch_steps, engine="custom",
                       vg_fun=None, recovery_steps=None):
    """vg_fun, if given, overrides the per-trial value_and_grad:
    vg_fun(x [B, P], *args) -> ([B], [B, P]) (the fused Pallas
    value+gradient kernel); otherwise autodiff through `fun`. Every trial
    point is evaluated with value_and_grad (see _make_step): the gradient
    comes for ~1.3x the cost of a value under the fused kernel and is
    exactly what the accepted step needs, so no value-only path exists."""
    if engine == "optax":
        return _optax_fallback(fun, x0, args, max_iter, gtol, ftol,
                               memory_size, max_linesearch_steps)

    args = tuple(args)

    if vg_fun is not None:
        def value_and_grad(x):
            return vg_fun(x, *args)
    else:
        def value_and_grad(x):
            if args:
                return jax.vmap(lambda xi, ai: jax.value_and_grad(
                    lambda u: fun(u, *ai))(xi))(x, args)
            return jax.vmap(jax.value_and_grad(fun))(x)

    return _batch_lbfgs_loop(value_and_grad, x0, max_iter, gtol, ftol,
                             memory_size, max_linesearch_steps,
                             recovery_steps)


def batched_lbfgs(fun, x0, args=(), max_iter=500, gtol=1e-6, ftol=1e-11,
                  memory_size=10, max_linesearch_steps=12, engine="custom",
                  recovery_steps=None):
    """Minimise `fun(x, *args_i) -> scalar` for a batch of problems.

    Parameters
    ----------
    fun : callable, static. Applied per batch element.
    x0 : [B, P] initial points.
    args : pytree whose leaves have leading batch dim B (per-expert data,
        masks, bounds ...).

    Returns
    -------
    LBFGSResult with x [B, P], fun [B], converged [B] (bool), iterations [B].
    """
    x, f, conv, iters = _batched_lbfgs_jit(fun, x0, tuple(args), max_iter,
                                           gtol, ftol, memory_size,
                                           max_linesearch_steps, engine,
                                           recovery_steps=recovery_steps)
    return LBFGSResult(x=x, fun=f, converged=conv, iterations=iters)


# ---------------------------------------------------------------------------
# device-resident pooled execution: one jitted while_loop over a fixed-width
# slot batch whose slots are refilled from the expert queue the moment they
# converge — the batch never waits for its slowest expert (measured iteration
# skew: median 20 / max ~45 per 69-expert chunk -> ~1.85x ideal compaction,
# tpu_stuff/iter_skew_probe.py). All E experts' data stays in HBM; args for
# the active slots are gathered by expert index inside the objective calls,
# results scatter into [E]-shaped outputs, and refills happen in a lax.cond
# branch that only executes on iterations where something converged. Zero
# host round-trips until the whole sweep finishes (a host-driven segmented
# variant was measured and rejected: each segment boundary cost ~0.5 s of
# tunnel latency, turning the 1.85x win into a 1.25x loss,
# tpu_stuff/pool_ab.py). A shared scalar ring pointer is safe across refills
# because refilled slots get zeroed history (rho=0 rows are no-ops in the
# two-loop recursion).
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("fun", "slots", "max_iter", "gtol", "ftol",
                                   "memory_size", "max_linesearch_steps",
                                   "vg_fun", "recovery_steps"))
def _lbfgs_pool_jit(fun, x0_all, args_all, slots, max_iter, gtol, ftol,
                    memory_size, max_linesearch_steps, vg_fun=None,
                    recovery_steps=None):
    return _pool_core(fun, x0_all, args_all, slots, max_iter, gtol, ftol,
                      memory_size, max_linesearch_steps, vg_fun, recovery_steps)


@partial(jax.jit, static_argnames=("fun", "slots", "max_iter", "gtol", "ftol",
                                   "memory_size", "max_linesearch_steps",
                                   "vg_fun", "mesh", "recovery_steps"))
def _lbfgs_pool_mesh_jit(fun, x0_all, args_all, slots, max_iter, gtol, ftol,
                         memory_size, max_linesearch_steps, vg_fun, mesh,
                         recovery_steps=None):
    """One independent pool per device: experts shard over the mesh's
    leading axis and each device drains its own slot pool — zero collectives
    (experts are independent, SURVEY.md §2.4). Per-expert trajectories are
    identical to the single-device pool because a slot's L-BFGS path depends
    only on its own expert's data."""
    from jax.sharding import PartitionSpec
    try:
        from jax.experimental.shard_map import shard_map
    except ImportError:  # pragma: no cover - newer jax
        from jax.shard_map import shard_map

    ax = mesh.axis_names[0]
    spec = PartitionSpec(ax)

    def local(x0, args):
        x, f, conv, iters, nit = _pool_core(
            fun, x0, args, slots, max_iter, gtol, ftol, memory_size,
            max_linesearch_steps, vg_fun, recovery_steps)
        return x, f, conv, iters, nit.reshape(1)

    # prefix pytree: one spec covers every [E_local, ...] leaf of args
    # (building a full spec tree with tree_map would re-run custom pytree
    # node constructors — e.g. Sigmoid — on PartitionSpec leaves)
    in_specs = (spec, spec)
    out_specs = (spec, spec, spec, spec, spec)
    # the pool loop carry mixes sharded inputs with locally-created
    # constants; there are no collectives anywhere, so the varying-manual-
    # axes check is disabled rather than pcast-ing every carry leaf
    try:
        fn = shard_map(local, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    except TypeError:  # pragma: no cover - older jax spells it check_rep
        fn = shard_map(local, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_rep=False)
    return fn(x0_all, args_all)


def _pool_core(fun, x0_all, args_all, slots, max_iter, gtol, ftol,
               memory_size, max_linesearch_steps, vg_fun=None, recovery_steps=None):
    E, P = x0_all.shape
    B = slots
    dtype = x0_all.dtype
    m = memory_size

    def gather(ids):
        """Per-slot arg rows for this iteration's objective call.

        Float leaves ride a one-hot [B, E] matmul over the flattened
        [E, K] arg instead of advanced indexing: a traced-index row gather
        scalarises on TPU (~1 GB/s measured — ~8 ms of every SGPR pool
        iteration at the production profile, where the per-slot args are
        ~4 MB), while the MXU product is exact (one unit coefficient per
        output row; requires finite arg values — 0 * inf would poison the
        row, and padded rows are zero-filled by the scheduler). Non-float
        leaves (masks, ints) stay on the indexing path: they are small.
        """
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
        if vg_fun is not None:
            def vg(x):
                return vg_fun(x, *gather(ids))
        else:
            def vg(x):
                return jax.vmap(lambda xi, ai: jax.value_and_grad(
                    lambda u: fun(u, *ai))(xi))(x, gather(ids))
        return vg

    ids0 = jnp.arange(B)
    carry0 = _init_carry(vg_at(ids0), x0_all[:B], gtol, m)
    state0 = (carry0, ids0, jnp.asarray(B, jnp.int32), jnp.ones(B, bool),
              x0_all, jnp.zeros(E, dtype), jnp.zeros(E, bool),
              jnp.zeros(E, jnp.int32))

    def cond(state):
        return jnp.any(state[3])         # any live slot

    def body(state):
        carry, slot_expert, next_expert, live, ox, of, oc, oi = state
        step = _make_step(vg_at(slot_expert), B, P,
                          dtype, max_iter, gtol, ftol, m,
                          max_linesearch_steps, recovery_steps)
        carry = step(carry)
        harvest = carry[8] & live

        def with_harvest(st):
            carry, slot_expert, next_expert, live, ox, of, oc, oi = st
            (it, x, f, g, S, Y, rho, gamma, done, iters, fail, t,
             backed) = carry
            idx = jnp.where(harvest, slot_expert, E)     # E rows are dropped
            ox = ox.at[idx].set(x, mode="drop")
            of = of.at[idx].set(f, mode="drop")
            oc = oc.at[idx].set(iters < max_iter, mode="drop")
            oi = oi.at[idx].set(iters, mode="drop")
            # refill freed slots from the queue (prefix-sum assignment)
            order = jnp.cumsum(harvest.astype(jnp.int32))
            new_id = next_expert + order - 1
            ok = harvest & (new_id < E)
            slot_expert = jnp.where(ok, new_id, slot_expert)
            live = (live & ~harvest) | ok
            next_expert = jnp.minimum(next_expert + order[-1], E)
            x = jnp.where(ok[:, None], x0_all[jnp.clip(new_id, 0, E - 1)], x)
            S = jnp.where(ok[None, :, None], 0.0, S)
            Y = jnp.where(ok[None, :, None], 0.0, Y)
            rho = jnp.where(ok[None, :], 0.0, rho)
            gamma = jnp.where(ok, jnp.ones_like(gamma), gamma)
            # no objective eval here: refilled slots bootstrap through the
            # NEXT regular iteration for free. With f=inf, g=0 the step body
            # produces d=-g=0, the Armijo test accepts the unchanged point on
            # its first trial (anything finite <= inf), and the iteration's
            # ordinary value_and_grad delivers the fresh (f0, g0) — while
            # every other slot advances normally in the same iteration.
            # iters=-1 so the bootstrap pass doesn't count against the
            # per-expert budget (keeps iteration counts identical to the
            # one-shot loop). s=0 => sy=0 => no history write; f-stagnation
            # can't trigger (|inf - f0| = inf > ftol).
            f = jnp.where(ok, jnp.asarray(jnp.inf, dtype), f)
            g = jnp.where(ok[:, None], 0.0, g)
            iters = jnp.where(ok, -1, iters)
            fail = jnp.where(ok, 0, fail)
            done = jnp.where(ok, False, done)
            t = jnp.where(ok, jnp.ones_like(t), t)
            backed = jnp.where(ok, False, backed)
            carry = (it, x, f, g, S, Y, rho, gamma, done, iters, fail, t,
                     backed)
            return carry, slot_expert, next_expert, live, ox, of, oc, oi

        state = (carry, slot_expert, next_expert, live, ox, of, oc, oi)
        return jax.lax.cond(jnp.any(harvest), with_harvest, lambda s: s,
                            state)

    state = jax.lax.while_loop(cond, body, state0)
    # state[0][0] = total pool iterations (= trials per slot), a diagnostic
    return state[4], state[5], state[6], state[7], state[0][0]


def batched_lbfgs_pool(fun, x0_all, args_all, slots, max_iter=500, gtol=1e-6,
                       ftol=1e-11, memory_size=10, max_linesearch_steps=12,
                       vg_fun=None, mesh=None, recovery_steps=None):
    """Minimise `fun` for E independent problems through a `slots`-wide
    device-resident pool (see block comment above).

    x0_all: [E, P]; args_all: pytree with [E, ...] leaves. Returns
    LBFGSResult with [E]-shaped fields. One program shape compiles per
    (slots, E) pair; per-expert results are bitwise identical to the one-shot
    batched loop.

    With `mesh` (a 1-d device mesh), experts shard over the mesh axis and
    each device runs its own `slots`-wide pool (`slots` is the per-device
    width — the HBM budget is per device). E is padded to a mesh multiple by
    duplicating leading experts; duplicates are dropped from the result.
    """
    E, P = x0_all.shape
    n_sh = int(mesh.size) if mesh is not None else 1
    if n_sh > 1:
        E_pad = int(-(-E // n_sh) * n_sh)
        x0_in = jnp.asarray(x0_all)
        args_in = jax.tree.map(jnp.asarray, tuple(args_all))
        if E_pad != E:
            pad = E_pad - E
            x0_in = jnp.concatenate([x0_in, x0_in[:pad]], axis=0)
            args_in = jax.tree.map(
                lambda a: jnp.concatenate([a, a[:pad]], axis=0), args_in)
        B = int(min(slots, E_pad // n_sh))
        x, f, conv, iters, nit = _lbfgs_pool_mesh_jit(
            fun, x0_in, args_in, B, max_iter, gtol, ftol, memory_size,
            max_linesearch_steps, vg_fun, mesh, recovery_steps=recovery_steps)
        return LBFGSResult(x=x[:E], fun=f[:E], converged=conv[:E],
                           iterations=iters[:E],
                           pool_iterations=jnp.max(nit))
    B = int(min(slots, E))
    x, f, conv, iters, nit = _lbfgs_pool_jit(
        fun, jnp.asarray(x0_all), jax.tree.map(jnp.asarray, tuple(args_all)),
        B, max_iter, gtol, ftol, memory_size, max_linesearch_steps,
        vg_fun=vg_fun, recovery_steps=recovery_steps)
    return LBFGSResult(x=x, fun=f, converged=conv, iterations=iters,
                       pool_iterations=nit)


# ---------------------------------------------------------------------------
# optax zoom-linesearch engine (per-element while inside vmap) — kept as a
# numerical cross-check; slow on TPU (batched-index gathers), fine on CPU.
# ---------------------------------------------------------------------------

def _optax_single(fun, x0, max_iter, gtol, ftol, memory_size,
                  max_linesearch_steps):
    opt = optax.lbfgs(
        memory_size=memory_size,
        linesearch=optax.scale_by_zoom_linesearch(
            max_linesearch_steps=max_linesearch_steps))
    value_and_grad = optax.value_and_grad_from_state(fun)
    f0, g0 = jax.value_and_grad(fun)(x0)
    state0 = opt.init(x0)

    def cond(carry):
        it, x, state, done, best_f, best_x, prev_f = carry
        return (it < max_iter) & (~done)

    def body(carry):
        it, x, state, done, best_f, best_x, prev_f = carry
        value, grad = value_and_grad(x, state=state)
        updates, new_state = opt.update(grad, state, x, value=value, grad=grad,
                                        value_fn=fun)
        new_x = optax.apply_updates(x, updates)
        finite = jnp.isfinite(value) & jnp.all(jnp.isfinite(new_x))
        improved = finite & (value < best_f)
        best_f = jnp.where(improved, value, best_f)
        best_x = jnp.where(improved, x, best_x)
        grad_small = jnp.max(jnp.abs(grad)) < gtol
        f_change = jnp.abs(prev_f - value) <= ftol * jnp.maximum(
            jnp.maximum(jnp.abs(prev_f), jnp.abs(value)), 1.0)
        new_done = grad_small | ((it > 0) & f_change) | (~finite)
        return it + 1, new_x, new_state, new_done, best_f, best_x, value

    init_best_f = jnp.where(jnp.isfinite(f0), f0, jnp.inf)
    carry0 = (jnp.asarray(0), x0, state0, jnp.asarray(False),
              init_best_f, x0, jnp.asarray(jnp.inf, dtype=f0.dtype))
    it, x, state, done, best_f, best_x, prev_f = jax.lax.while_loop(
        cond, body, carry0)
    f_final = fun(x)
    final_ok = jnp.isfinite(f_final) & jnp.all(jnp.isfinite(x))
    use_final = final_ok & (f_final < best_f)
    best_f = jnp.where(use_final, f_final, best_f)
    best_x = jnp.where(use_final, x, best_x)
    return best_x, best_f, done & (it <= max_iter), it


def _optax_fallback(fun, x0, args, max_iter, gtol, ftol, memory_size,
                    max_linesearch_steps):
    def run_one(x0_i, args_i):
        f = lambda x: fun(x, *args_i)
        return _optax_single(f, x0_i, max_iter, gtol, ftol, memory_size,
                             max_linesearch_steps)

    return jax.vmap(run_one)(x0, tuple(args))
