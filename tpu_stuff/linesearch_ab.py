"""A/B: final NLML under the f32 linesearch policy (mls=8, max_fails=1)
vs the conservative f64-style policy (12, 2), same problems, f32.

Run: JAX_PLATFORMS=cpu PYTHONPATH=. python -m tpu_stuff.linesearch_ab
"""

import numpy as np


def run(E=64, N=400, D=3):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from bench import make_workload
    from gpsat_tpu.models.batched import BatchedGPR, make_gpr_objective
    from gpsat_tpu.ops.lbfgs import batched_lbfgs
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
    objective, _ = make_gpr_objective(engine.kernel, engine.free_names,
                                      engine.d)
    args = (jnp.asarray(X, dtype), jnp.asarray(y, dtype), jnp.asarray(mask),
            bij_b, fixed)

    out = {}
    for label, mls, rec in (("f32-policy", 8, 4), ("conservative", 12, 12)):
        res = batched_lbfgs(objective, u0, args=args, max_iter=250,
                            gtol=1e-5, ftol=1e-9,
                            max_linesearch_steps=mls, recovery_steps=rec)
        out[label] = np.asarray(res.fun)
        print(f"{label:13s} conv {np.mean(np.asarray(res.converged)):.3f} "
              f"iters mean {np.mean(np.asarray(res.iterations)):.1f} "
              f"f mean {out[label].mean():.4f}")
    d = out["f32-policy"] - out["conservative"]
    rel = d / np.maximum(np.abs(out["conservative"]), 1.0)
    print(f"final-NLML delta (f32-policy - conservative): "
          f"mean {rel.mean():+.2e} p90 {np.percentile(rel, 90):+.2e} "
          f"max {rel.max():+.2e}  (positive = worse)")
    assert np.percentile(rel, 90) < 5e-4, "quality regression beyond noise"


if __name__ == "__main__":
    run()
