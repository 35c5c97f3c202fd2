"""Where do rejected L-BFGS trials come from? (CPU, f32, bench shapes)

Drives the REAL ops/lbfgs._make_step body one jitted iteration at a time
over a one-shot batch (no pool), classifying every slot-iteration from
consecutive carries:
  accept        iters increased
  rej-nohist    rejected while the slot has no curvature history
                (steepest-descent phase: first steps + post-reset)
  rej-hist      rejected with curvature history (L-BFGS direction)
  fail          backtracking exhausted (t hit t_min): 12 wasted trials
  idle          slot already done

Run: JAX_PLATFORMS=cpu PYTHONPATH=. python -m tpu_stuff.linesearch_stats
"""

import numpy as np


def main(E=64, N=400, D=3, max_its=600):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from bench import make_workload
    from gpsat_tpu.models.batched import BatchedGPR, make_gpr_objective
    from gpsat_tpu.ops import lbfgs as lb
    from gpsat_tpu.ops.packing import ParamSpec, pack

    dtype = jnp.float32
    engine = BatchedGPR(
        coords_dim=D, kernel="Matern32",
        constraints={"lengthscales": {"low": [0.01] * D, "high": [50.0] * D},
                     "likelihood_variance": {"low": 1e-5, "high": 1.0}},
        optim_kwargs={"max_iter": 250, "gtol": 1e-5, "ftol": 1e-9},
        jitter=1e-6, dtype=dtype)

    X, z, _ = make_workload(E, N, 4, D)
    y = z - z.mean(axis=1, keepdims=True)
    mask = np.ones((E, N), dtype=bool)
    y_var = y.var(axis=1)
    init = engine._initial_params_batch(E, None, y_var=y_var, clamp=True)

    free = {n: jnp.asarray(init[n], dtype=dtype) for n in engine.free_names}
    bij = {n: engine.bijectors[n] for n in engine.free_names}
    spec = ParamSpec([(n, engine.param_shape(n)) for n in engine.free_names])
    u0 = jax.vmap(lambda fr: pack({n: bij[n].inverse(fr[n])
                                   for n in engine.free_names}, spec))(free)
    u0 = jnp.asarray(np.asarray(u0), dtype=dtype)
    bij_b = jax.tree.map(
        lambda a: jnp.broadcast_to(jnp.asarray(a, dtype=dtype),
                                   (E,) + np.asarray(a).shape), bij)
    fixed = {n: jnp.asarray(init[n], dtype=dtype)
             for n in engine.HYPER_NAMES if n not in engine.free_names}

    objective, _ = make_gpr_objective(engine.kernel, engine.free_names,
                                      engine.d)
    Xd = jnp.asarray(X, dtype); yd = jnp.asarray(y, dtype)
    md = jnp.asarray(mask)

    def vg(u):
        return jax.vmap(lambda ui, Xi, yi, mi, bi: jax.value_and_grad(
            lambda v: objective(v, Xi, yi, mi, bi, fixed))(ui))(
            u, Xd, yd, md, bij_b)

    P = u0.shape[1]
    ftry_log = []                       # per-iteration f_try [E]

    def vg_rec(u):
        f, g = vg(u)
        ftry_log.append(np.asarray(f))
        return f, g

    mls, rec = lb.linesearch_policy(dtype)
    body = lb._make_step(vg_rec, E, P, dtype, engine.max_iter, engine.gtol,
                         engine.ftol, 10, mls, rec)
    step = body                         # EAGER: lets vg_rec record f_try
    carry = _to_np(lb._init_carry(vg, u0, engine.gtol, 10))

    carry, stats, tot = drive_and_report(
        step, carry, engine.gtol, engine.max_iter, ftry_log,
        max_its=max_its, E=E)


def drive_and_report(step, carry, gtol, max_iter, ftry_log,
                     max_its=600, E=None):
    """Drive the eager step body, classify every slot-iteration,
    print the report. Shared by the GPR and SGPR probes."""
    E = E if E is not None else len(carry[2])
    stats = dict(accept=0, rej_nohist=0, rej_hist=0, fail=0, idle=0)
    t_at_accept = []
    per_iter = []
    tail = np.zeros(E, dtype=int)       # live trials since last accept
    rej_deltas = []                     # (tail position, |Δf|/max(|f|,1))
    post_fail_accepts = 0
    fail_gradratio = []
    conv_kind = {"grad": 0, "fstag": 0, "hard_fail": 0, "cap": 0}
    k = 0
    while k < max_its and not carry[8].all():
        new = _to_np(step(_tup(carry)))
        done_prev = carry[8]
        accept = new[9] > carry[9]
        fail = new[10] > carry[10]
        no_hist = ~(carry[6] > 0).any(axis=0)
        live = ~done_prev
        rej = live & ~accept & ~fail
        stats["accept"] += int(accept.sum())
        stats["rej_nohist"] += int((rej & no_hist).sum())
        stats["rej_hist"] += int((rej & ~no_hist).sum())
        stats["fail"] += int(fail.sum())
        stats["idle"] += int(done_prev.sum())
        t_at_accept += list(carry[11][accept])
        per_iter.append((int(accept.sum()), int(rej.sum()),
                         int(live.sum())))
        f_try = ftry_log[-1]
        f_before = carry[2]
        with np.errstate(invalid="ignore"):
            rd = np.abs(f_try - f_before) / np.maximum(np.abs(f_before), 1.0)
        rd = np.where(np.isfinite(f_try) & np.isfinite(f_before), rd, np.nan)
        for s in np.where(rej)[0]:
            if np.isfinite(rd[s]):
                rej_deltas.append((int(tail[s]), float(rd[s])))
        for s in np.where(fail)[0]:
            if np.isfinite(rd[s]):
                rej_deltas.append((int(tail[s]), float(rd[s])))
            fail_gradratio.append(float(np.abs(carry[3][s]).max()))
        post_fail_accepts += int((accept & (carry[10] >= 1)).sum())
        tail[live & ~accept] += 1
        newly = new[8] & ~done_prev
        if newly.any():
            gs = np.abs(new[3][newly]).max(axis=-1) < gtol
            hf = (new[10][newly] >= 2) & ~accept[newly]
            cap = new[9][newly] >= max_iter
            conv_kind["grad"] += int(gs.sum())
            conv_kind["hard_fail"] += int((hf & ~gs).sum())
            conv_kind["cap"] += int((cap & ~gs & ~hf).sum())
            conv_kind["fstag"] += int((~gs & ~hf & ~cap).sum())
        tail[accept] = 0
        carry = new
        k += 1

    tot_trials = sum(stats[s] for s in ("accept", "rej_nohist", "rej_hist",
                                        "fail"))
    print(f"iterations {k}  live-trials {tot_trials}  "
          f"trials/accept {tot_trials/max(stats['accept'],1):.2f}")
    for s, v in stats.items():
        print(f"  {s:10s} {v:6d}  ({v/max(tot_trials,1)*100:5.1f}% of live "
              f"trials)" if s != "idle" else f"  {s:10s} {v:6d}")
    ta = np.asarray(t_at_accept, dtype=float)
    if len(ta):
        print("accepted-step trial scales t: "
              + " ".join(f"p{q}={np.percentile(ta, q):.3g}"
                         for q in (10, 50, 90)))
    # first-10-iteration share of rejections
    head = per_iter[:10]
    rej_head = sum(r for _, r, _ in head)
    rej_all = stats["rej_nohist"] + stats["rej_hist"] + stats["fail"]
    print(f"rejections in first 10 iterations: {rej_head} / {rej_all} "
          f"({rej_head/max(rej_all,1)*100:.0f}%)")
    iters = carry[9]
    print(f"accepted steps per slot: mean {iters.mean():.1f} "
          f"p50 {np.percentile(iters, 50):.0f} max {iters.max()}")
    print(f"ENDGAME tail (live trials after last accept): total "
          f"{tail.sum()} = {tail.sum()/max(tot_trials,1)*100:.0f}% of live "
          f"trials; per-slot mean {tail.mean():.1f} p90 "
          f"{np.percentile(tail, 90):.0f} max {tail.max()}")
    print("convergence kinds:", conv_kind)
    if fail_gradratio:
        fg = np.array(fail_gradratio)
        print("at-fail |g|inf: " + " ".join(
            f"p{q}={np.percentile(fg, q):.2e}" for q in (10, 50, 90, 99)))
    print(f"accepts AFTER a slot's first fail (recovery value): "
          f"{post_fail_accepts} / {stats['accept']}")
    if len(ta):
        print(f"accepted t: min {ta.min():.3g}  frac<2^-6 "
              f"{(ta < 2**-6).mean()*100:.1f}%")
    # |f_try - f| on rejected trials by tail position: would a noise-floor
    # rejected-stagnation test have fired at the first post-accept trial?
    for lo, hi, lbl in ((0, 1, "tail=0"), (1, 2, "tail=1"), (2, 4, "tail 2-3"),
                        (4, 10**9, "tail>=4")):
        ds = np.array([d for tp, d in rej_deltas if lo <= tp < hi])
        if len(ds):
            print(f"rejected |df|/|f| at {lbl:8s}: n={len(ds):5d} "
                  + " ".join(f"p{q}={np.percentile(ds, q):.2e}"
                             for q in (10, 50, 90)))


    return carry, stats, tot_trials


def _to_np(c):
    return [np.asarray(x) for x in c]


def _tup(c):
    return tuple(c)


if __name__ == "__main__":
    main()
