"""f64 optimiser-trajectory health: the eager-regrowth branch + parity.

Round-3 regression caught only by telemetry (VERDICT.md weak #6): the f32
clean-accept linesearch gating, applied to f64, caused step-size COLLAPSE —
the sharp f64 Armijo test rejects the grown trial, `backed` pins the warm
trial scale small, and slots crawl through hundreds of real-but-tiny
accepted steps (seasonal driver: 150-230 iterations/expert, 3-4x the
round-2 trajectories). Fixed in commit 012c22c by keeping eager 4x
regrowth on the f64 branch of ops/lbfgs._make_step.

Discrimination note (measured while building this test): on the synthetic
bench workload the collapse barely shows (healthy p90 57 vs reverted 66
iterations — it needs the seasonal driver's problem structure), so an
end-to-end iteration bound alone CANNOT catch the revert. The real
discriminator is the MECHANISM test below: one hand-built _make_step
iteration asserting f64 regrows a backtracked slot's trial scale 4x on
accept while f32 keeps it. The end-to-end fit then pins scipy-parity and a
loose catastrophic-collapse bound.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from gpsat_tpu.models.batched import BatchedGPR  # noqa: E402
from gpsat_tpu.ops import lbfgs as lb  # noqa: E402


@pytest.mark.parametrize("dtype,expected_growth", [
    (jnp.float64, 4.0),   # eager regrowth — the 012c22c fix
    (jnp.float32, 1.0),   # clean-accept gating keeps a backtracked t
])
def test_regrowth_policy_after_backtracked_accept(dtype, expected_growth):
    """One _make_step iteration on a quadratic: a slot with backed=True that
    ACCEPTS its trial must regrow t by `expected_growth`. Reverting the f64
    eager-regrowth branch makes the f64 case return t unchanged -> fail."""
    B, P = 2, 3
    t0 = 0.125

    def vg(x):
        return 0.5 * jnp.sum(x * x, axis=-1), x

    x = jnp.full((B, P), 0.3, dtype)
    f, g = vg(x)
    m = 10
    carry = (jnp.asarray(5, jnp.int32), x, f, g,
             jnp.zeros((m, B, P), dtype), jnp.zeros((m, B, P), dtype),
             jnp.zeros((m, B), dtype), jnp.ones(B, dtype),
             jnp.zeros(B, bool), jnp.zeros(B, jnp.int32),
             jnp.zeros(B, jnp.int32), jnp.full((B,), t0, dtype),
             jnp.ones(B, bool))                      # backed=True
    body = lb._make_step(vg, B, P, dtype, 100, 1e-12, 1e-15, m, 8, 4)
    new = body(carry)
    accept = np.asarray(new[9]) > 0
    assert accept.all(), "quadratic small-step trial must be accepted"
    t_new = np.asarray(new[11])
    np.testing.assert_allclose(
        t_new, min(1.0, t0 * expected_growth), rtol=1e-6,
        err_msg=f"{np.dtype(dtype).name} regrowth policy changed "
                "(f64 eager-regrowth branch reverted?)")


E, N, D = 12, 300, 3


def test_f64_fit_scipy_parity_and_sane_trajectories():
    """End-to-end f64 batch fit: objectives reach the scipy optimum and
    iteration counts stay far from the collapse regime (150-230/expert).
    One fit shared by both assertions (a single expensive f64 compile)."""
    import scipy.optimize

    X, z, _ = bench.make_workload(E, N, 4, D, seed=7)
    y = z - z.mean(axis=1, keepdims=True)
    mask = np.ones((E, N), dtype=bool)
    engine = BatchedGPR(
        coords_dim=D, kernel="Matern32",
        constraints={"lengthscales": {"low": [0.01] * D, "high": [50.0] * D},
                     "likelihood_variance": {"low": 1e-5, "high": 1.0}},
        optim_kwargs={"max_iter": 500, "gtol": 1e-5, "ftol": 1e-9},
        jitter=1e-6, dtype=jnp.float64)
    out = engine.fit_predict_many(X, y, mask, optimise=True, predict=False)

    iters = np.asarray(out["iterations"], dtype=float)
    p90 = float(np.percentile(iters, 90))
    # healthy p90 on this workload: ~57 (measured round 4); collapse regime
    # starts around 150 — bound well below it, above healthy variance
    assert p90 <= 110, (
        f"f64 trajectory bloat: p90 accepted iterations {p90:.0f} "
        f"(healthy ~57, collapse regime 150+); "
        f"per-expert {sorted(iters.astype(int))}")
    assert iters.max() < 500          # the cap must not be the bound

    ours = np.asarray(out["objective"], dtype=float)
    for i in range(0, E, 4):          # a subset: scipy solves are slow
        yi = y[i]
        x0 = np.concatenate([np.zeros(D),
                             [np.log(max(yi.var(), 1e-8))],
                             [np.log(max(0.1 * yi.var(), 1e-9))]])
        res = scipy.optimize.minimize(
            bench._np_nlml_grad, x0, args=(X[i], yi), jac=True,
            method="L-BFGS-B")
        assert ours[i] <= res.fun + 1e-3 * max(1.0, abs(res.fun)), (
            f"expert {i}: ours {ours[i]:.6f} vs scipy {res.fun:.6f}")


def test_linesearch_policy_table():
    """Pin the measured policy table (see linesearch_policy docstring):
    changing these constants changes compiled pool programs AND the
    quality/trial trade measured by the CPU probes."""
    from gpsat_tpu.ops.lbfgs import linesearch_policy

    assert linesearch_policy(jnp.float32, "gpr") == (8, 4)
    # n is a lower bound on the VALID (masked) per-expert size; N=256 is the
    # smallest measured-safe size for dropping the recovery chain
    assert linesearch_policy(jnp.float32, "gpr", n=150) == (8, 4)
    assert linesearch_policy(jnp.float32, "gpr", n=255) == (8, 4)
    assert linesearch_policy(jnp.float32, "gpr", n=256) == (8, 0)
    assert linesearch_policy(jnp.float32, "gpr", n=512) == (8, 0)
    assert linesearch_policy(jnp.float32, "sgpr") == (8, 0)
    assert linesearch_policy(jnp.float32, "sgpr", n=64) == (8, 0)
    # VFF/ASVGP: the GPR gate is NOT validated on the collapsed bound —
    # always keep the recovery chain in f32 (round-4 advisor finding)
    assert linesearch_policy(jnp.float32, "vff", n=2048) == (8, 4)
    assert linesearch_policy(jnp.float32, "vff") == (8, 4)
    assert linesearch_policy(jnp.float64, "gpr", n=512) == (12, 12)
    assert linesearch_policy(jnp.float64, "sgpr") == (12, 12)
    assert linesearch_policy(jnp.float64, "vff", n=2048) == (12, 12)


def test_min_valid_size_gates_policy():
    """fit_predict_many with small heavily-masked experts in a wide padded
    bucket must keep the recovery chain: the gate reads the min masked
    count, not the padded width (round-4 advisor finding)."""
    from gpsat_tpu.models.batched import _min_valid_size

    mask = np.zeros((4, 512), dtype=bool)
    mask[:, :150] = True                      # small experts, wide bucket
    assert _min_valid_size(mask, 512) == 128  # quantized below-gate value
    mask[:, :400] = True
    assert _min_valid_size(mask, 512) == 256  # quantized at-gate value
    assert _min_valid_size(None, 512) == 512
