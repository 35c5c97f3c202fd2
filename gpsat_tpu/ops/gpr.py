"""Masked exact Gaussian-process regression, batched via vmap.

The math mirrors Rasmussen & Williams Algorithm 2.1 — the same algorithm the
reference implements per-expert in NumPy (GPSat/models/pure_python_gpr.py:509)
and via GPflow (GPSat/models/gpflow_models.py:153) — but with *padding masks*
so experts with different data counts can share one compiled computation.

Masking scheme: for an expert with n valid of N padded rows
  K~ = (m m^T) * K(X, X)   with invalid rows/cols zeroed,
  A  = K~ + diag(where(m, sigma_n^2, 1))
giving A = blockdiag(K_valid + sigma_n^2 I, I_pad). Its Cholesky is the valid
Cholesky plus an identity block, the log-determinant picks up exactly 0 from
the padding, and solves against zero-padded right-hand sides stay exact. The
masked NLML therefore *equals* the unpadded NLML bit-for-bit in exact
arithmetic.
"""

from functools import partial

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from gpsat_tpu.ops.kernels import kernel_fn

__all__ = ["nlml", "nlml_fused", "predict", "cholesky_masked",
           "DEFAULT_KERNEL"]

DEFAULT_KERNEL = "Matern32"


def _mask_kernel_matrix(K, mask, noise, jitter=0.0):
    """Apply padding mask and add noise/identity diagonal (see module doc)."""
    m = mask.astype(K.dtype)
    K = K * (m[:, None] * m[None, :])
    diag = jnp.where(mask, noise + jitter, 1.0)
    return K + jnp.diag(diag)


def cholesky_masked(params, X, mask, kernel=DEFAULT_KERNEL, jitter=0.0,
                    kernel_kwargs=None):
    """Cholesky of the masked noisy kernel matrix; [N, N] lower triangular."""
    k = kernel_fn(kernel)
    K = k(X, X, params["lengthscales"], params["kernel_variance"],
          **(kernel_kwargs or {}))
    A = _mask_kernel_matrix(K, mask, params["likelihood_variance"], jitter)
    return jnp.linalg.cholesky(A)


def nlml(params, X, y, mask, kernel=DEFAULT_KERNEL, jitter=0.0,
         kernel_kwargs=None):
    """Negative log marginal likelihood of one (padded) expert.

    Parameters
    ----------
    params : dict with 'lengthscales' [D], 'kernel_variance' [], 'likelihood_variance' []
    X : [N, D] padded coordinates
    y : [N] padded (de-meaned, scaled) observations
    mask : [N] bool validity mask

    Equals GPflow's -log_marginal_likelihood for the valid subset.
    """
    m = mask.astype(X.dtype)
    y = y * m
    L = cholesky_masked(params, X, mask, kernel, jitter, kernel_kwargs)
    alpha = jsl.cho_solve((L, True), y)
    n_valid = jnp.sum(m)
    quad = 0.5 * jnp.dot(y, alpha)
    logdet = jnp.sum(jnp.log(jnp.diagonal(L)))
    return quad + logdet + 0.5 * n_valid * jnp.log(2.0 * jnp.pi)


def predict(params, X, y, mask, Xs, kernel=DEFAULT_KERNEL, jitter=0.0,
            kernel_kwargs=None):
    """Posterior mean / variance at prediction points Xs [P, D].

    Returns dict with 'f*' (latent mean), 'f*_var' (latent variance) and
    'y_var' (latent + likelihood variance) — the reference's prediction keys
    (GPSat/models/gpflow_models.py:232-238).
    """
    kk = kernel_kwargs or {}
    k = kernel_fn(kernel)
    m = mask.astype(X.dtype)
    y = y * m
    L = cholesky_masked(params, X, mask, kernel, jitter, kernel_kwargs)
    alpha = jsl.cho_solve((L, True), y)
    Ks = k(X, Xs, params["lengthscales"], params["kernel_variance"], **kk) * m[:, None]
    f_mean = Ks.T @ alpha
    v = jsl.solve_triangular(L, Ks, lower=True)
    prior_var = params["kernel_variance"]
    f_var = jnp.maximum(prior_var - jnp.sum(v * v, axis=0), 0.0)
    return {"f*": f_mean, "f*_var": f_var,
            "y_var": f_var + params["likelihood_variance"]}


# ---------------------------------------------------------------------------
# fused NLML with analytic adjoint
# ---------------------------------------------------------------------------
#
# Autodiff through `nlml` differentiates the Cholesky itself, which XLA
# lowers to a chain of blocked triangular solves per gradient evaluation.
# The adjoint of the NLML has a closed form (Rasmussen & Williams eq. 5.9):
#     dNLML/dA = 0.5 (A^{-1} - alpha alpha^T),  alpha = A^{-1} y~
# so the backward pass needs only ONE triangular inverse + one MXU matmul,
# and the per-hyperparameter gradients follow from a VJP through the
# *kernel build only* (elementwise VPU work, generic over every kernel in
# ops/kernels.py — no per-kernel hand formulas). This replaces the
# reference's per-expert analytic-gradient NumPy NLML
# (GPSat/models/pure_python_gpr.py:439-506) in spirit, but stays exact for
# all kernels because the chain rule through K(theta) is still autodiff.


def _build_A(params, X, maskf, jitter, kernel, kernel_kwargs=None):
    """Masked noisy kernel matrix from a float mask (differentiable)."""
    k = kernel_fn(kernel)
    K = k(X, X, params["lengthscales"], params["kernel_variance"],
          **(kernel_kwargs or {}))
    K = K * (maskf[:, None] * maskf[None, :])
    diag = maskf * (params["likelihood_variance"] + jitter) + (1.0 - maskf)
    return K + jnp.diag(diag)


def _nlml_value(params, X, y, maskf, kernel, jitter):
    """One bordered Cholesky computes factor AND solve.

    chol([[A, y~],[y~^T, c]]) = [[L, 0],[z^T, s]] with z = L^{-1} y~, so
    appending y~ as a border row/col folds the forward substitution into the
    factorisation — on TPU a vector triangular solve costs almost as much as
    the whole Cholesky (pure latency; tpu_stuff/microbench_chain.py), so this
    nearly halves the value-only evaluation. c just needs c > y~^T A^{-1} y~;
    since lambda_min(A) >= min(noise+jitter, 1), c = y~.y~/min(noise,1)+1 is
    safe. The border never enters the value (diag/row slices stop at N).
    """
    A = _build_A(params, X, maskf, jitter, kernel)
    N = A.shape[-1]
    pad = 8
    yt = y * maskf
    noise = params["likelihood_variance"] + jitter
    c = jnp.dot(yt, yt) / jnp.minimum(noise, 1.0) + 1.0
    border_diag = jnp.concatenate(
        [jnp.reshape(c, (1,)).astype(A.dtype),
         jnp.ones((pad - 1,), A.dtype)])
    Aext = jnp.pad(A, ((0, pad), (0, pad)))
    Aext = Aext.at[:N, N].set(yt).at[N, :N].set(yt)
    Aext = Aext.at[jnp.arange(N, N + pad), jnp.arange(N, N + pad)].set(
        border_diag)
    Lext = jnp.linalg.cholesky(Aext)
    L = Lext[:N, :N]
    z = Lext[N, :N]
    quad = 0.5 * jnp.dot(z, z)
    logdet = jnp.sum(jnp.log(jnp.diagonal(L)))
    val = quad + logdet + 0.5 * jnp.sum(maskf) * jnp.log(2.0 * jnp.pi)
    return val, (L, z)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def nlml_fused(params, X, y, maskf, kernel=DEFAULT_KERNEL, jitter=0.0):
    """`nlml` with a float mask and an analytic VJP.

    Value path: one Cholesky + one vector solve. Gradient path: one
    triangular inverse + one matmul + a VJP through the kernel build.
    Numerically identical to `nlml` (same factorisation); gradients agree
    with autodiff to float tolerance.
    """
    return _nlml_value(params, X, y, maskf, kernel, jitter)[0]


def _nlml_fused_fwd(params, X, y, maskf, kernel, jitter):
    val, (L, z) = _nlml_value(params, X, y, maskf, kernel, jitter)
    return val, (params, X, y, maskf, L, z)


def _nlml_fused_bwd(kernel, jitter, res, g):
    params, X, y, maskf, L, z = res
    N = L.shape[-1]
    alpha = jsl.solve_triangular(L, z, lower=True, trans=1)
    W = jsl.solve_triangular(L, jnp.eye(N, dtype=L.dtype), lower=True)
    Kinv = W.T @ W
    Q = Kinv - jnp.outer(alpha, alpha)
    Abar = (0.5 * g) * Q
    _, vjp = jax.vjp(
        lambda p, xx, mm: _build_A(p, xx, mm, jitter, kernel), params, X, maskf)
    gp, gX, gm = vjp(Abar)
    gy = g * (maskf * alpha)
    # mask also enters through y~ = y*m and the 0.5*n*log(2pi) term
    gm = gm + g * (y * alpha) + g * 0.5 * jnp.log(2.0 * jnp.pi)
    return gp, gX, gy, gm


nlml_fused.defvjp(_nlml_fused_fwd, _nlml_fused_bwd)


# ---------------------------------------------------------------------------
# batched wrappers (vmap over a leading expert axis)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("kernel",))
def nlml_batched(params, X, y, mask, kernel=DEFAULT_KERNEL, jitter=0.0):
    """params leaves have leading batch dim B; X [B,N,D], y [B,N], mask [B,N]."""
    return jax.vmap(lambda p, x, yy, mm: nlml(p, x, yy, mm, kernel, jitter))(
        params, X, y, mask)


@partial(jax.jit, static_argnames=("kernel",))
def predict_batched(params, X, y, mask, Xs, kernel=DEFAULT_KERNEL, jitter=0.0):
    """Xs [B,P,D]; returns dict of [B,P] arrays."""
    return jax.vmap(lambda p, x, yy, mm, xs: predict(p, x, yy, mm, xs, kernel, jitter))(
        params, X, y, mask, Xs)
