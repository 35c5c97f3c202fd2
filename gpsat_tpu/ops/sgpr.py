"""Masked Titsias collapsed-ELBO sparse GPR (SGPR), batched via vmap.

The reference's production model (GPSat/models/gpflow_models.py:666-901,
used by IS2_GPSat_train.py:354): M inducing points summarise N observations;
O(N M^2) compute, O(N M) memory.

Masking scheme extends gpsat_tpu.ops.gpr: data mask zeroes Kuf columns and y;
inducing mask zeroes Kuu cross-terms and Kuf rows with a unit diagonal on the
padded inducing block, so padded inducing rows contribute exactly nothing to
the ELBO or the posterior.
"""

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from gpsat_tpu.ops.kernels import kernel_fn

__all__ = ["elbo", "neg_elbo", "predict", "DEFAULT_JITTER"]

DEFAULT_JITTER = 1e-6


def _common(params, X, y, mask, Z, zmask, kernel, jitter, kernel_kwargs):
    k = kernel_fn(kernel)
    kk = kernel_kwargs or {}
    m = mask.astype(X.dtype)
    zm = zmask.astype(X.dtype)
    sn2 = params["likelihood_variance"]
    sigma = jnp.sqrt(sn2)

    Kuu = k(Z, Z, params["lengthscales"], params["kernel_variance"], **kk)
    Kuu = Kuu * (zm[:, None] * zm[None, :]) + jnp.diag(
        jnp.where(zmask, jitter, 1.0))
    Lu = jnp.linalg.cholesky(Kuu)

    Kuf = k(Z, X, params["lengthscales"], params["kernel_variance"], **kk)
    Kuf = Kuf * (zm[:, None] * m[None, :])

    A = jsl.solve_triangular(Lu, Kuf, lower=True) / sigma      # [M, N]
    AAT = A @ A.T
    M = Z.shape[0]
    B = AAT + jnp.eye(M, dtype=X.dtype)
    LB = jnp.linalg.cholesky(B)
    y_m = y * m
    Aerr = (A @ y_m) / sigma                                   # [M]
    c = jsl.solve_triangular(LB, Aerr, lower=True)
    return m, zm, sn2, Lu, LB, A, AAT, c, y_m


def elbo(params, X, y, mask, Z, zmask, kernel="Matern32",
         jitter=DEFAULT_JITTER, kernel_kwargs=None):
    """Collapsed Titsias ELBO of one (padded) expert.

    Equals GPflow SGPR.elbo() for the valid subset (zero mean function).
    """
    m, zm, sn2, Lu, LB, A, AAT, c, y_m = _common(
        params, X, y, mask, Z, zmask, kernel, jitter, kernel_kwargs)
    n = jnp.sum(m)
    kdiag_sum = params["kernel_variance"] * n   # stationary kernels
    out = -0.5 * n * jnp.log(2.0 * jnp.pi)
    out -= jnp.sum(jnp.log(jnp.diagonal(LB)))
    out -= 0.5 * n * jnp.log(sn2)
    out -= 0.5 * jnp.sum(y_m * y_m) / sn2
    out += 0.5 * jnp.sum(c * c)
    out -= 0.5 * (kdiag_sum / sn2 - jnp.trace(AAT))
    return out


def neg_elbo(params, X, y, mask, Z, zmask, kernel="Matern32",
             jitter=DEFAULT_JITTER, kernel_kwargs=None):
    return -elbo(params, X, y, mask, Z, zmask, kernel, jitter, kernel_kwargs)


def predict(params, X, y, mask, Z, zmask, Xs, kernel="Matern32",
            jitter=DEFAULT_JITTER, kernel_kwargs=None):
    """SGPR posterior mean/variance at Xs [P, D]; keys as the reference
    ('f*', 'f*_var', 'y_var')."""
    k = kernel_fn(kernel)
    kk = kernel_kwargs or {}
    m, zm, sn2, Lu, LB, A, AAT, c, y_m = _common(
        params, X, y, mask, Z, zmask, kernel, jitter, kernel_kwargs)
    Kus = k(Z, Xs, params["lengthscales"], params["kernel_variance"], **kk)
    Kus = Kus * zm[:, None]
    tmp1 = jsl.solve_triangular(Lu, Kus, lower=True)
    tmp2 = jsl.solve_triangular(LB, tmp1, lower=True)
    mean = tmp2.T @ c
    kss = params["kernel_variance"]
    f_var = jnp.maximum(kss + jnp.sum(tmp2 * tmp2, axis=0)
                        - jnp.sum(tmp1 * tmp1, axis=0), 0.0)
    return {"f*": mean, "f*_var": f_var, "y_var": f_var + sn2}
