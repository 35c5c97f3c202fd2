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

import jax.numpy as jnp
import jax.scipy.linalg as jsl

from gpsat_tpu.ops.kernels import kernel_fn

__all__ = ["latent_kernel_stack", "observation_cov", "log_marginal_likelihood",
           "predict_f", "predict_y"]


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
                       Kq_ss * jnp.eye(Ns)[None, :, :])    # [Ns, L, L]
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
