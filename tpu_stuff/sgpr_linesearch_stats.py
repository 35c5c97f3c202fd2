"""SGPR linesearch classification (CPU, f32): why 2.5 trials/accept vs GPR 1.8?

Drives the REAL ops/lbfgs._make_step body one eager iteration at a time over
the collapsed-ELBO objective at (a scaled version of) the production profile
N=2000/M=500, classifying every slot-iteration — same report as
tpu_stuff/linesearch_stats.py (which this imports).

Round-3 CPU-probe-first lesson: every TPU policy iteration costs a 15-30 min
remote compile; the instrumented CPU f32 probe predicted every TPU outcome
correctly. Iterate policy here, then compile ONCE.

Run: JAX_PLATFORMS=cpu PYTHONPATH=. python -m tpu_stuff.sgpr_linesearch_stats
"""

import numpy as np

from tpu_stuff.linesearch_stats import _to_np, drive_and_report


def setup(E, N, M, D=3, dtype=None, seed=0):
    """Build (vg, u0, engine) for the SGPR collapsed ELBO at [E, N], M."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from bench import make_workload
    from gpsat_tpu.models.batched import BatchedSGPR, make_sgpr_objective
    from gpsat_tpu.ops.packing import ParamSpec, pack

    dtype = dtype or jnp.float32
    engine = BatchedSGPR(
        coords_dim=D, kernel="Matern32", num_inducing_points=M,
        constraints={"lengthscales": {"low": [0.01] * D, "high": [50.0] * D},
                     "likelihood_variance": {"low": 1e-5, "high": 1.0}},
        optim_kwargs={"max_iter": 250, "gtol": 1e-5, "ftol": 1e-9},
        jitter=1e-6, dtype=dtype)

    X, z, _ = make_workload(E, N, 4, D, seed=seed)
    y = z - z.mean(axis=1, keepdims=True)
    mask = np.ones((E, N), dtype=bool)
    Z, zmask = engine._build_inducing(X, mask)

    init = engine._initial_params_batch(E, None, y_var=y.var(axis=1),
                                        clamp=True)
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

    objective = make_sgpr_objective(engine.kernel, engine.free_names,
                                    engine.d, engine.jitter)
    Xd = jnp.asarray(X, dtype)
    yd = jnp.asarray(y, dtype)
    md = jnp.asarray(mask)
    Zd = jnp.asarray(Z, dtype)
    zmd = jnp.asarray(zmask)

    vg_one = jax.jit(jax.vmap(lambda ui, Xi, yi, mi, Zi, zmi, bi:
                              jax.value_and_grad(lambda v: objective(
                                  v, Xi, yi, mi, Zi, zmi, bi, fixed))(ui)))

    def vg(u):
        return vg_one(u, Xd, yd, md, Zd, zmd, bij_b)

    return vg, u0, engine


def main(E=16, N=1000, M=256, D=3, max_its=600, policy=None,
         ftol=None, seed=0):
    import jax.numpy as jnp
    from gpsat_tpu.ops import lbfgs as lb

    vg, u0, engine = setup(E, N, M, D, seed=seed)
    ftol = engine.ftol if ftol is None else ftol
    ftry_log = []

    def vg_rec(u):
        f, g = vg(u)
        ftry_log.append(np.asarray(f))
        return f, g

    mls, rec = policy or lb.linesearch_policy(jnp.float32, "sgpr")
    print(f"SGPR E={E} N={N} M={M} policy=(mls={mls}, rec={rec}) ftol={ftol:g} seed={seed}")
    step = lb._make_step(vg_rec, E, u0.shape[1], u0.dtype, engine.max_iter,
                         engine.gtol, ftol, 10, mls, rec)
    carry = _to_np(lb._init_carry(vg, u0, engine.gtol, 10))
    carry, stats, tot = drive_and_report(
        step, carry, engine.gtol, engine.max_iter, ftry_log,
        max_its=max_its, E=E)
    print(f"final f: mean {np.asarray(carry[2]).mean():.5f}")
    return carry, stats, tot


if __name__ == "__main__":
    main()
