"""Multi-output GPR with a linear forward-model likelihood.

Re-design of the reference's experimental multioutput stack
(GPSat/models/multioutput/gpr.py:14, likelihoods.py:40, utils.py:31):
L latent GPs g_q mixed by a coregionalization matrix W [L, Q] give
f(x) = W g(x) [L]; observations are y = H f(x) + eps [P] with a linear
measurement operator H [P, L] and noise covariance R [P, P]. The joint
observation covariance over N points is

    C[(n,p),(n',p')] = (H W diag(k_q(x_n, x_n')) W^T H^T)[p,p'] + d_nn' R[p,p']

and both the marginal likelihood and the latent posterior are dense Gaussian
algebra over the stacked [N*P] observation vector. Masked + vmap friendly.
"""

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from gpsat_tpu.ops.kernels import kernel_fn

__all__ = ["latent_kernel_stack", "observation_cov", "log_marginal_likelihood",
           "predict_f", "predict_y", "svgp_latent_marginals", "svgp_kl",
           "linear_var_exp", "nonlinear_var_exp", "svgp_elbo",
           "svgp_predict_f", "svgp_predict_y", "mvn_log_density"]


def latent_kernel_stack(params, X1, X2, kernel="Matern32"):
    """[Q, N1, N2] stack of latent kernels; params: lengthscales [Q, D],
    kernel_variance [Q]."""
    k = kernel_fn(kernel)
    return k(X1[None, :, :], X2[None, :, :], params["lengthscales"],
             params["kernel_variance"])


def _mixed_cov(params, W, H, X1, X2, kernel):
    """[N1, P, N2, P] covariance of Hf between two input sets."""
    Kq = latent_kernel_stack(params, X1, X2, kernel)       # [Q, N1, N2]
    A = H @ W                                              # [P, Q]
    # C[n,p,m,p'] = sum_q A[p,q] A[p',q] Kq[q,n,m]
    return jnp.einsum("pq,rq,qnm->npmr", A, A, Kq)


def observation_cov(params, W, H, R, X, mask, kernel="Matern32"):
    """Stacked [N*P, N*P] observation covariance with masking: padded rows get
    zero cross-covariance and identity diagonal blocks."""
    N = X.shape[0]
    P = H.shape[0]
    C = _mixed_cov(params, W, H, X, X, kernel)             # [N, P, N, P]
    m = mask.astype(X.dtype)
    C = C * (m[:, None, None, None] * m[None, None, :, None])
    # add R on valid diagonal blocks, identity on padded ones
    eyeN = jnp.eye(N, dtype=X.dtype)
    Rblk = jnp.einsum("nm,pr->npmr", eyeN * m[:, None] * m[None, :], R)
    Iblk = jnp.einsum("nm,pr->npmr", eyeN * (1 - m)[:, None] * (1 - m)[None, :],
                      jnp.eye(P, dtype=X.dtype))
    C = C + Rblk + Iblk
    return C.reshape(N * P, N * P)


def log_marginal_likelihood(params, W, H, R, X, Y, mask, kernel="Matern32",
                            jitter=0.0):
    """log p(Y) for Y [N, P]; equals the reference's MultioutputGPR
    log_marginal_likelihood (gpr.py:41) for the valid subset."""
    N, P = Y.shape
    C = observation_cov(params, W, H, R, X, mask, kernel)
    C = C + jitter * jnp.eye(N * P, dtype=X.dtype)
    y = (Y * mask.astype(X.dtype)[:, None]).reshape(N * P)
    L = jnp.linalg.cholesky(C)
    alpha = jsl.cho_solve((L, True), y)
    n_valid = jnp.sum(mask) * P
    return -0.5 * (y @ alpha) - jnp.sum(jnp.log(jnp.diagonal(L))) \
        - 0.5 * n_valid * jnp.log(2.0 * jnp.pi)


def predict_f(params, W, H, R, X, Y, mask, Xs, kernel="Matern32", jitter=0.0,
              full_output_cov=False):
    """Latent-f posterior at Xs: mean [Ns, L], var [Ns, L] (or [Ns, L, L]).

    Matches the reference's multioutput_conditional (utils.py:120)."""
    N, P = Y.shape
    Ns = Xs.shape[0]
    L_dim = W.shape[0]
    C = observation_cov(params, W, H, R, X, mask, kernel)
    C = C + jitter * jnp.eye(N * P, dtype=X.dtype)
    y = (Y * mask.astype(X.dtype)[:, None]).reshape(N * P)
    Lc = jnp.linalg.cholesky(C)
    alpha = jsl.cho_solve((Lc, True), y)

    # cov between latent f at Xs and observations: [Ns, L, N, P]
    Kq_sn = latent_kernel_stack(params, Xs, X, kernel)     # [Q, Ns, N]
    A = H @ W                                              # [P, Q]
    Kfy = jnp.einsum("lq,pq,qsm->slmp", W, A, Kq_sn)
    Kfy = Kfy * mask.astype(X.dtype)[None, None, :, None]
    Kfy2 = Kfy.reshape(Ns * L_dim, N * P)

    mean = (Kfy2 @ alpha).reshape(Ns, L_dim)
    V = jsl.solve_triangular(Lc, Kfy2.T, lower=True)       # [N*P, Ns*L]
    # prior latent cov at Xs (block-diagonal over points)
    Kq_ss = latent_kernel_stack(params, Xs, Xs, kernel)
    prior = jnp.einsum("lq,rq,qss->slr", W, W,
                       Kq_ss * jnp.eye(Ns, dtype=Kq_ss.dtype)[None, :, :])
    expl = (V.T @ V).reshape(Ns, L_dim, Ns, L_dim)
    expl_diag = jnp.einsum("slsr->slr", expl)
    cov = prior - expl_diag
    if full_output_cov:
        return mean, cov
    var = jnp.maximum(jnp.einsum("sll->sl", cov), 0.0)
    return mean, var


def predict_y(params, W, H, R, X, Y, mask, Xs, kernel="Matern32", jitter=0.0):
    """Observation-space posterior: mean H f, cov H Sigma H^T + R diagonals."""
    mean_f, cov_f = predict_f(params, W, H, R, X, Y, mask, Xs, kernel, jitter,
                              full_output_cov=True)
    mean_y = mean_f @ H.T
    cov_y = jnp.einsum("pl,slr,mr->spm", H, cov_f, H) + R[None, :, :]
    return mean_y, cov_y


# ---------------------------------------------------------------------------
# Multioutput SVGP (reference: MultioutputSVGP, GPSat/models/multioutput/
# gpr.py:82, with ForwardModelLikelihood variants, likelihoods.py:40,146).
#
# Design: Q independent latent GPs g_q with shared inducing locations Z [M, D]
# (GPflow SharedIndependentInducingVariables), mixed by W [L, Q] into the
# latent field f = W g (LinearCoregionalization). Whitened variational
# posterior q(v_q) = N(q_mu[:, q], L_q L_q^T), q_sqrt [Q, M, M]. Observations
# y = h(x, f) + eps, eps ~ N(0, R [P, P]):
#   - linear h: analytic variational expectations (likelihoods.py:127-144)
#   - nonlinear h: Monte-Carlo quadrature (likelihoods.py:148-210), sampling
#     in g-space (Fcov = W diag(g_var) W^T, so f = W g with independent
#     per-latent marginal draws is an exact sampler — no [L, L] Cholesky).
# ---------------------------------------------------------------------------


def _masked_q_sqrt(raw, zmask):
    """[Q, M, M] raw -> masked lower-triangular factors, unit diag on pads."""
    zm = zmask.astype(raw.dtype)
    L = jnp.tril(raw) * (zm[None, :, None] * zm[None, None, :])
    return L + jnp.eye(raw.shape[-1], dtype=raw.dtype)[None] * (1.0 - zm)[None, :]


def svgp_latent_marginals(params, q_mu, q_sqrt_raw, Z, zmask, Xs,
                          kernel="Matern32", jitter=1e-6):
    """Whitened per-latent marginal posteriors at Xs.

    params: lengthscales [Q, D], kernel_variance [Q]; q_mu [M, Q];
    q_sqrt_raw [Q, M, M]; Z [M, D] shared across latents. Returns
    (g_mean [Ns, Q], g_var [Ns, Q]).
    """
    zm = zmask.astype(Z.dtype)
    Kuu = latent_kernel_stack(params, Z, Z, kernel)           # [Q, M, M]
    Kuu = Kuu * (zm[:, None] * zm[None, :])[None] + jnp.diag(
        jnp.where(zmask, jitter, 1.0))[None]
    Lu = jnp.linalg.cholesky(Kuu)                             # [Q, M, M]
    Kus = latent_kernel_stack(params, Z, Xs, kernel) * zm[None, :, None]
    A = jax.vmap(lambda l, k: jsl.solve_triangular(l, k, lower=True))(Lu, Kus)
    Lq = _masked_q_sqrt(q_sqrt_raw, zmask)                    # [Q, M, M]
    mean = jnp.einsum("qmn,mq->nq", A, q_mu * zm[:, None])
    SA = jnp.einsum("qkm,qkn->qmn", Lq, A)                    # L^T A, [Q, M, Ns]
    var = (params["kernel_variance"][None, :]
           - jnp.sum(A * A, axis=1).T + jnp.sum(SA * SA, axis=1).T)
    return mean, jnp.maximum(var, 0.0)


def svgp_kl(q_mu, q_sqrt_raw, zmask):
    """Sum over latents of KL(q(v_q) || N(0, I)); padded rows contribute 0."""
    zm = zmask.astype(q_mu.dtype)
    Lq = _masked_q_sqrt(q_sqrt_raw, zmask)
    qm = q_mu * zm[:, None]
    M = q_mu.shape[0]
    diag = jnp.abs(jnp.diagonal(Lq, axis1=-2, axis2=-1)) + 1e-300
    per_latent = 0.5 * (jnp.sum(qm * qm, axis=0)
                        + jnp.sum(Lq * Lq, axis=(-2, -1)) - M
                        - 2.0 * jnp.sum(jnp.log(diag), axis=-1))
    return jnp.sum(per_latent)


def mvn_log_density(Y, mu, R_chol):
    """log N(Y | mu, R) for batched rows Y, mu [..., P]; R_chol = chol(R).
    Reference: multivariate_gaussian_log_density (multioutput/utils.py:74)."""
    P = Y.shape[-1]
    diff = Y - mu                                             # [..., P]
    flat = diff.reshape(-1, P).T                              # [P, K]
    sol = jsl.solve_triangular(R_chol, flat, lower=True)
    maha = jnp.sum(sol ** 2, axis=0).reshape(diff.shape[:-1])
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(R_chol)))
    return -0.5 * (P * jnp.log(2.0 * jnp.pi) + logdet + maha)


def linear_var_exp(Fmu, g_var, W, H, R, Y):
    """Analytic E_q[log N(y | H W g, R)] per data point.

    Fmu [N, L] latent-field mean (W g_mean), g_var [N, Q] latent marginal
    variances, H [P, L], R [P, P]. Matches LinearModelLikelihood
    ._variational_expectations (likelihoods.py:127-144):
    -(P/2)log 2pi - 0.5 log|R| - 0.5 (y-HFmu)^T R^-1 (y-HFmu)
    - 0.5 tr(R^-1 H Fcov H^T), with Fcov = W diag(g_var) W^T.
    """
    P = H.shape[0]
    Rc = jnp.linalg.cholesky(R)
    HFmu = Fmu @ H.T                                          # [N, P]
    ll = mvn_log_density(Y, HFmu, Rc)
    # tr(R^-1 (HW) diag(g_var) (HW)^T) = sum_q g_var[:, q] * s_q,
    # s_q = (HW)_q^T R^-1 (HW)_q
    HW = H @ W                                                # [P, Q]
    sol = jsl.cho_solve((Rc, True), HW)                       # R^-1 HW
    s = jnp.sum(HW * sol, axis=0)                             # [Q]
    return ll - 0.5 * (g_var @ s)


def nonlinear_var_exp(h, X, g_mean, g_var, W, R, Y, key, num_samples):
    """Monte-Carlo E_q[log N(y | h(x, f), R)] per data point.

    h(X [N, D], F [N, L]) -> [N, P] is a user JAX function (the ForwardModel
    of NonlinearModelLikelihood, likelihoods.py:148). Samples g ~ N(g_mean,
    diag(g_var)) [S, N, Q], maps f = g W^T, averages log densities over S.
    """
    S = num_samples
    N, Q = g_var.shape
    Rc = jnp.linalg.cholesky(R)
    eps = jax.random.normal(key, (S, N, Q), dtype=g_var.dtype)
    g = g_mean[None] + jnp.sqrt(g_var)[None] * eps            # [S, N, Q]
    f = g @ W.T                                               # [S, N, L]
    lp = jax.vmap(lambda fs: mvn_log_density(Y, h(X, fs), Rc))(f)
    return jnp.mean(lp, axis=0)                               # [N]


def svgp_elbo(params, W, R, q_mu, q_sqrt_raw, X, Y, mask, Z, zmask,
              H=None, h=None, kernel="Matern32", jitter=1e-6, scale=1.0,
              key=None, num_samples=100):
    """Multioutput SVGP ELBO (reference: MultioutputSVGP.elbo, gpr.py:120).

    Provide H [P, L] for the linear likelihood, or a callable h(X, F) for the
    Monte-Carlo nonlinear likelihood (with `key`). `mask` [N] weights data
    rows; `scale` is the minibatch factor N_total/N_batch.
    """
    g_mean, g_var = svgp_latent_marginals(params, q_mu, q_sqrt_raw, Z, zmask,
                                          X, kernel=kernel, jitter=jitter)
    m = mask.astype(X.dtype)
    if h is not None:
        assert key is not None, "nonlinear likelihood needs a PRNG key"
        ve = nonlinear_var_exp(h, X, g_mean, g_var, W, R, Y, key, num_samples)
    else:
        ve = linear_var_exp(g_mean @ W.T, g_var, W, H, R, Y)
    return scale * jnp.sum(ve * m) - svgp_kl(q_mu, q_sqrt_raw, zmask)


def svgp_predict_f(params, W, q_mu, q_sqrt_raw, Z, zmask, Xs,
                   kernel="Matern32", jitter=1e-6, full_output_cov=False):
    """Latent-field posterior at Xs: mean [Ns, L]; var [Ns, L] or cov
    [Ns, L, L] (Fcov = W diag(g_var) W^T)."""
    g_mean, g_var = svgp_latent_marginals(params, q_mu, q_sqrt_raw, Z, zmask,
                                          Xs, kernel=kernel, jitter=jitter)
    mean = g_mean @ W.T
    if full_output_cov:
        cov = jnp.einsum("lq,nq,rq->nlr", W, g_var, W)
        return mean, cov
    var = (W ** 2) @ g_var.T                                  # [L, Ns]
    return mean, var.T


def svgp_predict_y(params, W, H, R, q_mu, q_sqrt_raw, Z, zmask, Xs,
                   kernel="Matern32", jitter=1e-6):
    """Observation-space posterior for the linear likelihood: H f + eps."""
    mean, cov = svgp_predict_f(params, W, q_mu, q_sqrt_raw, Z, zmask, Xs,
                               kernel=kernel, jitter=jitter,
                               full_output_cov=True)
    mean_y = mean @ H.T
    cov_y = jnp.einsum("pl,nlr,mr->npm", H, cov, H) + R[None]
    return mean_y, cov_y
