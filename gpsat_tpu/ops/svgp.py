"""Masked whitened SVGP (Hensman et al. 2013) — ELBO + posterior.

The reference's big-data model (GPSat/models/gpflow_models.py:904-1310):
variational distribution q(u) = N(q_mu, L_q L_q^T) over M inducing values,
whitened parameterisation (GPflow default), Gaussian likelihood.

Masking: data mask weights the per-point expected log-likelihood; padded
inducing rows carry q_mu = 0 and unit q_sqrt diagonal so their KL contribution
is exactly zero, and masked Kuf/Kus rows remove them from the posterior.
"""

import jax.numpy as jnp
import jax.scipy.linalg as jsl

from gpsat_tpu.ops.kernels import kernel_fn

__all__ = ["elbo", "neg_elbo", "predict", "marginals", "DEFAULT_JITTER",
           "make_q_sqrt", "q_sqrt_raw_init", "natgrad_step"]

DEFAULT_JITTER = 1e-6


def q_sqrt_raw_init(M, dtype=jnp.float64):
    """Raw (unconstrained) init for q_sqrt: identity."""
    return jnp.eye(M, dtype=dtype)


def make_q_sqrt(raw, zmask):
    """Raw [M, M] -> masked lower-triangular factor with unit diagonal on
    padded inducing rows."""
    L = jnp.tril(raw)
    zm = zmask.astype(raw.dtype)
    L = L * (zm[:, None] * zm[None, :])
    diag_fix = jnp.where(zmask, 0.0, 1.0)
    return L + jnp.diag(diag_fix)


def _whitened_marginals(params, q_mu, q_sqrt, Z, zmask, Xs, smask=None,
                        kernel="Matern32", jitter=DEFAULT_JITTER,
                        kernel_kwargs=None):
    """Marginal posterior mean/var at Xs for whitened q: f = K_su Lu^{-T} v."""
    k = kernel_fn(kernel)
    kk = kernel_kwargs or {}
    zm = zmask.astype(Z.dtype)
    Kuu = k(Z, Z, params["lengthscales"], params["kernel_variance"], **kk)
    Kuu = Kuu * (zm[:, None] * zm[None, :]) + jnp.diag(
        jnp.where(zmask, jitter, 1.0))
    Lu = jnp.linalg.cholesky(Kuu)
    Kus = k(Z, Xs, params["lengthscales"], params["kernel_variance"], **kk)
    Kus = Kus * zm[:, None]
    A = jsl.solve_triangular(Lu, Kus, lower=True)       # [M, P]
    mean = A.T @ (q_mu * zm)
    SA = q_sqrt.T @ A                                   # [M, P]
    kss = params["kernel_variance"]
    var = jnp.maximum(kss - jnp.sum(A * A, axis=0)
                      + jnp.sum(SA * SA, axis=0), 0.0)
    return mean, var


def elbo(params, q_mu, q_sqrt_raw, X, y, mask, Z, zmask, kernel="Matern32",
         jitter=DEFAULT_JITTER, kernel_kwargs=None, scale=1.0):
    """Whitened SVGP ELBO (Gaussian likelihood) for one padded expert.

    `scale` multiplies the data term (N_total / minibatch size when
    minibatching). Equals GPflow SVGP.elbo() for the valid subset.
    """
    q_sqrt = make_q_sqrt(q_sqrt_raw, zmask)
    mean, var = _whitened_marginals(params, q_mu, q_sqrt, Z, zmask, X,
                                    kernel=kernel, jitter=jitter,
                                    kernel_kwargs=kernel_kwargs)
    sn2 = params["likelihood_variance"]
    m = mask.astype(X.dtype)
    # E_q[log N(y | f, sn2)] per point
    exp_ll = (-0.5 * jnp.log(2.0 * jnp.pi * sn2)
              - 0.5 * ((y - mean) ** 2 + var) / sn2)
    data_term = scale * jnp.sum(exp_ll * m)

    # KL(q || N(0, I)) in whitened space:
    # 0.5 * (|m|^2 + |L|_F^2 - M - 2 sum log|L_ii|); padded rows carry m = 0
    # and unit diagonal, so their contribution cancels exactly against the
    # -M count and log(1) = 0.
    zm = zmask.astype(X.dtype)
    qm = q_mu * zm
    M_total = q_mu.shape[0]
    diag = jnp.abs(jnp.diagonal(q_sqrt)) + 1e-300
    kl = 0.5 * (jnp.sum(qm * qm) + jnp.sum(q_sqrt * q_sqrt) - M_total
                - 2.0 * jnp.sum(jnp.log(diag)))
    return data_term - kl


def neg_elbo(params, q_mu, q_sqrt_raw, X, y, mask, Z, zmask, **kwargs):
    return -elbo(params, q_mu, q_sqrt_raw, X, y, mask, Z, zmask, **kwargs)


def natgrad_step(params, q_mu, q_sqrt_raw, X, y, mask, Z, zmask, gamma,
                 kernel="Matern32", jitter=DEFAULT_JITTER, kernel_kwargs=None,
                 scale=1.0):
    """One natural-gradient step on (q_mu, q_sqrt) at fixed hyperparameters.

    Reference behaviour: gpflow.optimizers.NaturalGradient on the variational
    pair, invoked before each Adam step when natural_gradients=True
    (GPSat/models/gpflow_models.py:1190-1214). For a Gaussian likelihood the
    generic natural gradient in expectation parameters reduces to a closed
    conjugate update in whitened precision space,

        Lambda_new = (1-gamma) Lambda + gamma (I + A W A^T / sn2)
        eta_new    = (1-gamma) eta    + gamma (A W y / sn2)

    with A = Lu^{-1} Kuf, W the data mask (times the minibatch `scale`),
    Lambda = S^{-1}, eta = S^{-1} q_mu. gamma=1 jumps straight to the optimal
    q(u) given the current hyperparameters (the collapsed Titsias bound).
    Padded inducing rows stay exactly at the N(0, 1) prior.
    """
    k = kernel_fn(kernel)
    kk = kernel_kwargs or {}
    M = q_mu.shape[0]
    zm = zmask.astype(Z.dtype)
    m = mask.astype(X.dtype)

    Kuu = k(Z, Z, params["lengthscales"], params["kernel_variance"], **kk)
    Kuu = Kuu * (zm[:, None] * zm[None, :]) + jnp.diag(
        jnp.where(zmask, jitter, 1.0))
    Lu = jnp.linalg.cholesky(Kuu)
    Kuf = k(Z, X, params["lengthscales"], params["kernel_variance"], **kk)
    Kuf = Kuf * (zm[:, None] * m[None, :])
    A = jsl.solve_triangular(Lu, Kuf, lower=True)          # [M, N]

    sn2 = params["likelihood_variance"]
    Aw = A * m[None, :]
    C = scale * (Aw @ A.T) / sn2                           # [M, M]
    b = scale * (A @ (m * y)) / sn2                        # [M]

    L = make_q_sqrt(q_sqrt_raw, zmask)
    eye = jnp.eye(M, dtype=Z.dtype)
    lam_old = jsl.cho_solve((L, True), eye)                # S^{-1}
    eta_old = jsl.cho_solve((L, True), q_mu * zm)          # S^{-1} q_mu

    lam_new = (1.0 - gamma) * lam_old + gamma * (eye + C)
    lam_new = 0.5 * (lam_new + lam_new.T)
    Lp = jnp.linalg.cholesky(lam_new)
    eta_new = (1.0 - gamma) * eta_old + gamma * b
    m_new = jsl.cho_solve((Lp, True), eta_new)
    S_new = jsl.cho_solve((Lp, True), eye)
    S_new = 0.5 * (S_new + S_new.T)
    L_new = jnp.linalg.cholesky(S_new)
    return m_new * zm, L_new


def marginals(params, q_mu, q_sqrt_raw, Z, zmask, Xs, kernel="Matern32",
              jitter=DEFAULT_JITTER, kernel_kwargs=None):
    q_sqrt = make_q_sqrt(q_sqrt_raw, zmask)
    return _whitened_marginals(params, q_mu, q_sqrt, Z, zmask, Xs,
                               kernel=kernel, jitter=jitter,
                               kernel_kwargs=kernel_kwargs)


def predict(params, q_mu, q_sqrt_raw, Z, zmask, Xs, kernel="Matern32",
            jitter=DEFAULT_JITTER, kernel_kwargs=None):
    """Posterior at Xs; keys as the reference ('f*', 'f*_var', 'y_var')."""
    mean, var = marginals(params, q_mu, q_sqrt_raw, Z, zmask, Xs,
                          kernel=kernel, jitter=jitter,
                          kernel_kwargs=kernel_kwargs)
    return {"f*": mean, "f*_var": var,
            "y_var": var + params["likelihood_variance"]}
