"""Numerical-stability smoke test: near-duplicate points + jitter sweep.

TPU-first equivalent of the reference's `test_numerical_stability.py`
standalone driver (root of akpetty/GPSat), which builds a 400-point gridded
GPR with near-duplicate coordinates, raises the default jitter to 1e-4 and
checks the Cholesky/optimisation survives. Here the same stress is run
against the in-repo GPR expert across a jitter sweep and both float dtypes:

  - 20x20 grid with 1e-6-scale coordinate perturbations (near-duplicates —
    the reference's trick to provoke an ill-conditioned kernel matrix);
  - jitter in {0, 1e-8, 1e-6, 1e-4};
  - f64 (CPU default) and f32 (the TPU production dtype, where
    conditioning is ~16x tighter).

A configuration PASSES when the optimised NLML is finite and the posterior
at the training points is finite with non-negative variance.

Run: python -m examples.numerical_stability_check
"""

import numpy as np


def make_test_data(n_side=20, seed=42):
    """Smooth field on a near-duplicate grid (reference's construction:
    sin*cos thickness field + noise + 1e-6 coordinate perturbations)."""
    rng = np.random.default_rng(seed)
    g = np.linspace(-1.0, 1.0, n_side)
    gx, gy = np.meshgrid(g, g)
    z = 0.5 + 0.3 * np.sin(gx * 2.0) * np.cos(gy * 2.0)
    z = z + 0.1 * rng.standard_normal(z.shape)
    x = gx.ravel() + 1e-6 * rng.standard_normal(gx.size)
    y = gy.ravel() + 1e-6 * rng.standard_normal(gy.size)
    return np.stack([x, y], axis=1), z.ravel()


def run_case(coords, obs, jitter, dtype):
    """Run one (jitter, dtype) cell through the batched engine, which
    honours `dtype` end-to-end — the per-expert GPRModel canonicalises
    inputs to float64 (models/base.py:119-121), so it cannot exercise the
    f32 conditioning stress this driver exists for."""
    import jax.numpy as jnp
    from gpsat_tpu.models.batched import BatchedGPR
    engine = BatchedGPR(coords_dim=coords.shape[1], kernel="Matern32",
                        jitter=jitter,
                        dtype=jnp.float32 if dtype == np.float32
                        else jnp.float64,
                        optim_kwargs={"max_iter": 100})
    X = coords[None].astype(dtype)
    y = (obs - obs.mean())[None].astype(dtype)
    mask = np.ones((1, len(obs)), dtype=bool)
    out = engine.fit_predict(X, y, mask, Xs=X, optimise=True, predict=True)
    nlml = float(out["objective"][0])
    f = np.asarray(out["preds"]["f*"][0])
    v = np.asarray(out["preds"]["f*_var"][0])
    assert f.dtype == dtype, f"engine ran {f.dtype}, wanted {np.dtype(dtype)}"
    finite = (np.isfinite(nlml) and np.isfinite(f).all()
              and np.isfinite(v).all() and (v >= -1e-6).all())
    return bool(finite), nlml, bool(out["converged"][0])


def main():
    coords, obs = make_test_data()
    print(f"{len(obs)} near-duplicate points; field range "
          f"[{obs.min():.3f}, {obs.max():.3f}]")
    n_pass = 0
    cases = [(j, dt) for dt in (np.float64, np.float32)
             for j in (0.0, 1e-8, 1e-6, 1e-4)]
    for jitter, dtype in cases:
        finite, nlml, ok_opt = run_case(coords, obs, jitter, dtype)
        status = "PASS" if finite else "FAIL"
        n_pass += finite
        print(f"  jitter={jitter:>7.0e} dtype={np.dtype(dtype).name:<7} "
              f"{status}  nlml={nlml:12.5f} opt_success={ok_opt}")
    # jitter=0 f32 is ALLOWED to fail (that is the point of jitter); every
    # jittered configuration must pass
    jittered = len(cases) - 2
    assert n_pass >= jittered, \
        f"only {n_pass}/{len(cases)} stable; expected at least {jittered}"
    print(f"numerical_stability_check: OK ({n_pass}/{len(cases)} stable)")


if __name__ == "__main__":
    main()
