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

__all__ = ["batched_lbfgs", "LBFGSResult"]


class LBFGSResult(dict):
    """dict with attribute access: x, fun, converged, iterations."""

    def __getattr__(self, item):
        try:
            return self[item]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(item) from e


def _make_step(batched_value_and_grad, batched_value, B, P, dtype, max_iter,
               gtol, ftol, memory_size, max_linesearch_steps):
    """Build the per-iteration body over the L-BFGS carry tuple
    (it, x, f, g, S, Y, rho, gamma, done, iters, fail_cnt).

    `it` is the global scalar iteration (ring-pointer base); `iters` counts
    per-slot active steps, so slots (re)filled mid-run — the pool path — get
    correct per-expert budgets and statistics."""
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

    def linesearch(x, f, g, d, skip, t_init):
        """Batch Armijo backtracking by halving. Elements in `skip` (already
        converged) count as accepted immediately.

        Two alternatives were measured on real TPU and rejected
        (tpu_stuff/microbench_trip.py):
        - quadratic-interpolation trial steps break convergence under TPU
          f32 matmul noise (conv 1.00 -> 0.01);
        - evaluating all C candidate steps in one [C*B] call is NOT cheaper:
          the objective's cost scales linearly with batch (XLA Cholesky is
          ~N sequential column steps whose per-step cost is
          bandwidth-bound), so the sweep pays C full evals for one trip.
        """
        gd = jnp.sum(g * d, axis=-1)                       # [B]

        def cond(c):
            t, f_new, it, ok = c
            return (it < max_linesearch_steps) & jnp.any(~ok)

        def body(c):
            t, f_new, it, ok = c
            f_try = batched_value(x + t[:, None] * d)
            accept = jnp.isfinite(f_try) & (f_try <= f + 1e-4 * t * gd)
            newly = (~ok) & accept
            f_new = jnp.where(newly, f_try, f_new)
            t = jnp.where(ok | accept, t, t * 0.5)
            return t, f_new, it + 1, ok | accept

        t, f_new, it, ok = jax.lax.while_loop(
            cond, body, (t_init, f, 0, skip))
        return t, f_new, ok

    def body(carry):
        it, x, f, g, S, Y, rho, gamma, done, iters, fail_cnt = carry
        d = two_loop(g, S, Y, rho, gamma, it)
        gd = jnp.sum(g * d, axis=-1)
        bad_dir = ~jnp.isfinite(gd) | (gd >= 0)
        d = jnp.where(bad_dir[:, None], -g, d)

        # NOTE: warm-started trial steps (t_init = 2*previous accepted t)
        # were measured on real TPU and rejected: they cut evals/trip but
        # ~10% of experts stop converging (stuck at sub-unit steps under
        # TPU f32 objective noise), dragging whole batches to max_iter
        # (conv 1.00 -> 0.88). The unit first trial is robust.
        t_init = jnp.ones(B, dtype)
        t, f_ls, ls_ok = linesearch(x, f, g, d, done, t_init)
        ls_ok = ls_ok & (~done)   # done elements were skipped, not accepted
        x_new = x + t[:, None] * d
        f_new, g_new = batched_value_and_grad(x_new)

        s = x_new - x
        yv = g_new - g
        sy = jnp.sum(s * yv, axis=-1)
        s_norm = jnp.linalg.norm(s, axis=-1)
        y_norm = jnp.linalg.norm(yv, axis=-1)
        keep = ls_ok & (~done) & (sy > 1e-10 * s_norm * y_norm)

        ptr = jnp.mod(it, m)
        zero = jnp.zeros_like(s)
        S = jax.lax.dynamic_update_index_in_dim(
            S, jnp.where(keep[:, None], s, zero), ptr, axis=0)
        Y = jax.lax.dynamic_update_index_in_dim(
            Y, jnp.where(keep[:, None], yv, zero), ptr, axis=0)
        rho_new = jnp.where(keep, 1.0 / jnp.where(sy == 0, 1.0, sy), 0.0)
        rho = jax.lax.dynamic_update_index_in_dim(rho, rho_new, ptr, axis=0)
        yy = jnp.sum(yv * yv, axis=-1)
        gamma = jnp.where(keep & (yy > 0), sy / jnp.maximum(yy, 1e-300), gamma)

        grad_small = jnp.max(jnp.abs(g_new), axis=-1) < gtol
        # only treat f-stagnation as convergence on a full accepted step from
        # a finite point (pool-refilled slots carry f=inf through their
        # bootstrap pass: |inf - f0| <= ftol*inf would be vacuously true)
        full_step = t >= t_init - 1e-12
        f_change = full_step & jnp.isfinite(f) & (
            jnp.abs(f - f_new) <= ftol * jnp.maximum(
                jnp.maximum(jnp.abs(f), jnp.abs(f_new)), 1.0))
        fail = (~ls_ok) | ~jnp.isfinite(f_new)
        # first linesearch failure: reset that element's curvature history so
        # the next direction is steepest descent (the scipy recovery);
        # a second consecutive failure ends the element
        fail_cnt = jnp.where(fail & (~done), fail_cnt + 1, 0)
        reset = fail & (fail_cnt == 1) & (~done)
        rho = jnp.where(reset[None, :], 0.0, rho)
        gamma = jnp.where(reset, 1.0, gamma)
        hard_fail = fail & (fail_cnt >= 2)
        iters = iters + jnp.where(done, 0, 1)
        hit_cap = iters >= max_iter
        newly_done = (~done) & (grad_small | f_change | hard_fail | hit_cap)

        # freeze finished/failed experts
        adv = (~done) & (~fail)
        x = jnp.where(adv[:, None], x_new, x)
        f = jnp.where(adv, f_new, f)
        g = jnp.where(adv[:, None], g_new, g)
        done = done | newly_done
        return it + 1, x, f, g, S, Y, rho, gamma, done, iters, fail_cnt

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
            done0, jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32))


def _batch_lbfgs_loop(batched_value_and_grad, batched_value, x0, max_iter,
                      gtol, ftol, memory_size, max_linesearch_steps):
    """Core batch-level loop. x0: [B, P]. Returns (x, f, converged, iters)."""
    B, P = x0.shape
    body = _make_step(batched_value_and_grad, batched_value, B, P, x0.dtype,
                      max_iter, gtol, ftol, memory_size, max_linesearch_steps)

    def cond(carry):
        it, done = carry[0], carry[8]
        return (it < max_iter) & jnp.any(~done)

    carry0 = _init_carry(batched_value_and_grad, x0, gtol, memory_size)
    it, x, f, g, S, Y, rho, gamma, done, iters, fail_cnt = jax.lax.while_loop(
        cond, body, carry0)
    # slots that only exhausted their per-slot budget are not converged
    return x, f, done & (iters < max_iter), iters


@partial(jax.jit, static_argnames=("fun", "max_iter", "gtol", "ftol",
                                   "memory_size", "max_linesearch_steps",
                                   "engine", "value_fun", "vg_fun"))
def _batched_lbfgs_jit(fun, x0, args, max_iter, gtol, ftol,
                       memory_size, max_linesearch_steps, engine="custom",
                       value_fun=None, vg_fun=None):
    """value_fun, if given, overrides the vmapped `fun` for the *value-only*
    linesearch evaluations: value_fun(x [B, P], *args) -> [B]. Used to route
    trial-step objective values through a fused batch kernel (Pallas).
    vg_fun, if given, similarly overrides the per-iteration value_and_grad:
    vg_fun(x [B, P], *args) -> ([B], [B, P]) (the fused Pallas
    value+gradient kernel); otherwise autodiff through `fun`."""
    if engine == "optax":
        return _optax_fallback(fun, x0, args, max_iter, gtol, ftol,
                               memory_size, max_linesearch_steps)

    args = tuple(args)

    if value_fun is not None:
        def value(x):
            return value_fun(x, *args)
    else:
        def value(x):
            if args:
                return jax.vmap(lambda xi, ai: fun(xi, *ai))(x, args)
            return jax.vmap(fun)(x)

    if vg_fun is not None:
        def value_and_grad(x):
            return vg_fun(x, *args)
    else:
        def value_and_grad(x):
            if args:
                return jax.vmap(lambda xi, ai: jax.value_and_grad(
                    lambda u: fun(u, *ai))(xi))(x, args)
            return jax.vmap(jax.value_and_grad(fun))(x)

    return _batch_lbfgs_loop(value_and_grad, value, x0, max_iter, gtol, ftol,
                             memory_size, max_linesearch_steps)


def batched_lbfgs(fun, x0, args=(), max_iter=500, gtol=1e-6, ftol=1e-11,
                  memory_size=10, max_linesearch_steps=12, engine="custom"):
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
                                           max_linesearch_steps, engine)
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
                                   "value_fun", "vg_fun"))
def _lbfgs_pool_jit(fun, x0_all, args_all, slots, max_iter, gtol, ftol,
                    memory_size, max_linesearch_steps, value_fun=None,
                    vg_fun=None):
    E, P = x0_all.shape
    B = slots
    dtype = x0_all.dtype
    m = memory_size

    def gather(ids):
        return jax.tree.map(lambda a: a[ids], args_all)

    def vg_at(ids):
        if vg_fun is not None:
            def vg(x):
                return vg_fun(x, *gather(ids))
        else:
            def vg(x):
                return jax.vmap(lambda xi, ai: jax.value_and_grad(
                    lambda u: fun(u, *ai))(xi))(x, gather(ids))
        return vg

    def value_at(ids):
        if value_fun is not None:
            def value(x):
                return value_fun(x, *gather(ids))
        else:
            def value(x):
                return jax.vmap(lambda xi, ai: fun(xi, *ai))(x, gather(ids))
        return value

    ids0 = jnp.arange(B)
    carry0 = _init_carry(vg_at(ids0), x0_all[:B], gtol, m)
    state0 = (carry0, ids0, jnp.asarray(B, jnp.int32), jnp.ones(B, bool),
              x0_all, jnp.zeros(E, dtype), jnp.zeros(E, bool),
              jnp.zeros(E, jnp.int32))

    def cond(state):
        return jnp.any(state[3])         # any live slot

    def body(state):
        carry, slot_expert, next_expert, live, ox, of, oc, oi = state
        step = _make_step(vg_at(slot_expert), value_at(slot_expert), B, P,
                          dtype, max_iter, gtol, ftol, m,
                          max_linesearch_steps)
        carry = step(carry)
        harvest = carry[8] & live

        def with_harvest(st):
            carry, slot_expert, next_expert, live, ox, of, oc, oi = st
            it, x, f, g, S, Y, rho, gamma, done, iters, fail = carry
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
            carry = (it, x, f, g, S, Y, rho, gamma, done, iters, fail)
            return carry, slot_expert, next_expert, live, ox, of, oc, oi

        state = (carry, slot_expert, next_expert, live, ox, of, oc, oi)
        return jax.lax.cond(jnp.any(harvest), with_harvest, lambda s: s,
                            state)

    state = jax.lax.while_loop(cond, body, state0)
    return state[4], state[5], state[6], state[7]


def batched_lbfgs_pool(fun, x0_all, args_all, slots, max_iter=500, gtol=1e-6,
                       ftol=1e-11, memory_size=10, max_linesearch_steps=12,
                       value_fun=None, vg_fun=None):
    """Minimise `fun` for E independent problems through a `slots`-wide
    device-resident pool (see block comment above).

    x0_all: [E, P]; args_all: pytree with [E, ...] leaves. Returns
    LBFGSResult with [E]-shaped fields. One program shape compiles per
    (slots, E) pair; per-expert results are bitwise identical to the one-shot
    batched loop.
    """
    E, P = x0_all.shape
    B = int(min(slots, E))
    x, f, conv, iters = _lbfgs_pool_jit(
        fun, jnp.asarray(x0_all), jax.tree.map(jnp.asarray, tuple(args_all)),
        B, max_iter, gtol, ftol, memory_size, max_linesearch_steps,
        value_fun=value_fun, vg_fun=vg_fun)
    return LBFGSResult(x=x, fun=f, converged=conv, iterations=iters)


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
