"""Variational Fourier Features (Hensman, Durrande & Solin 2017) — masked,
batchable, JAX.

Re-design of the reference's VFF stack (GPSat/vff.py:14-676, adapted there
from st--/VFF): inter-domain inducing variables are Fourier projections of the
GP on a box [a, b]^D with a separable product of 1-D Matern kernels. Per-dim
Kuu has closed structured form diag + low-rank; the D-dim Kuu is their
Kronecker product and Kuf is a row-wise Khatri-Rao product of per-dim
sinusoid features. The collapsed (Titsias) bound then needs one Cholesky of
P = Kuu + Kuf Kfu / sigma^2 of size M_total = prod_d (2 m_d - 1).

Unlike the reference (TF structured-matrix classes + precomputed statics),
everything here is pure functions of (params, data, mask, domain) so the same
code path serves autodiff hyperparameter optimisation and batched vmapping;
the per-dim blocks are built dense (M_d is small) and the Kronecker products
are materialised once per evaluation.
"""

from functools import reduce

import jax.numpy as jnp
import jax.scipy.linalg as jsl

__all__ = ["kuu_dense", "kuf", "elbo", "neg_elbo", "predict", "num_features",
           "DEFAULT_JITTER"]

DEFAULT_JITTER = 1e-8

_SUPPORTED = ("Matern12", "Matern32", "Matern52")


def num_features(m):
    """Per-dim inducing count: m cosines (incl. omega=0) + (m-1) sines."""
    return 2 * int(m) - 1


def _omegas(m, a, b):
    # dtype-anchored to the domain bounds: a bare jnp.arange is int64 under
    # jax_enable_x64 and a weak-float multiply promotes it to float64, which
    # silently dragged the WHOLE per-dim block math (and its [2m-1, 2m-1]
    # LU/inv/slogdet) to f64 — emulated ~100x slow on TPU at best, and an
    # outright compile error for f64 LuDecomposition on v5e
    ms = jnp.arange(m, dtype=jnp.result_type(a, b))
    return 2.0 * jnp.pi * ms / (b - a)


def kuu_dense(kernel, lengthscale, variance, a, b, m, jitter=0.0):
    """Dense per-dim Kuu [2m-1, 2m-1] from the closed-form spectra
    (formulas: VFF paper Table 1; reference: GPSat/vff.py:381-457)."""
    om = _omegas(m, a, b)
    om_sin = om[1:]
    span = b - a
    dt = jnp.result_type(lengthscale, variance, a, b)

    if kernel == "Matern12":
        lam = 1.0 / lengthscale
        two_or_four = jnp.where(om == 0, 2.0, 4.0)
        d_cos = span * (lam**2 + om**2) / lam / variance / two_or_four
        v_cos = jnp.ones(m, dt) / jnp.sqrt(variance)
        K_cos = jnp.diag(d_cos) + jnp.outer(v_cos, v_cos)
        d_sin = span * (lam**2 + om_sin**2) / lam / variance / 4.0
        K_sin = jnp.diag(d_sin)
    elif kernel == "Matern32":
        lam = jnp.sqrt(3.0) / lengthscale
        four_or_eight = jnp.where(om == 0, 4.0, 8.0)
        d_cos = span * (lam**2 + om**2) ** 2 / lam**3 / variance / four_or_eight
        v_cos = jnp.ones(m, dt) / jnp.sqrt(variance)
        K_cos = jnp.diag(d_cos) + jnp.outer(v_cos, v_cos)
        d_sin = span * (lam**2 + om_sin**2) ** 2 / lam**3 / variance / 8.0
        v_sin = om_sin / lam / jnp.sqrt(variance)
        K_sin = jnp.diag(d_sin) + jnp.outer(v_sin, v_sin)
    elif kernel == "Matern52":
        lam = jnp.sqrt(5.0) / lengthscale
        sixteen_or_32 = jnp.where(om == 0, 16.0, 32.0)
        v1 = (3.0 * (om / lam) ** 2 - 1.0) / jnp.sqrt(8.0 * variance)
        v2 = jnp.ones(m, dt) / jnp.sqrt(variance)
        d_cos = 3.0 * span / sixteen_or_32 / lam**5 / variance \
            * (lam**2 + om**2) ** 3
        K_cos = jnp.diag(d_cos) + jnp.outer(v1, v1) + jnp.outer(v2, v2)
        v_sin = jnp.sqrt(3.0) * om_sin / lam / jnp.sqrt(variance)
        d_sin = 3.0 * span / 32.0 / lam**5 / variance \
            * (lam**2 + om_sin**2) ** 3
        K_sin = jnp.diag(d_sin) + jnp.outer(v_sin, v_sin)
    else:
        raise NotImplementedError(
            f"VFF supports {_SUPPORTED}, got: {kernel}")

    M = num_features(m)
    out = jnp.zeros((M, M), dtype=K_cos.dtype)
    out = out.at[:m, :m].set(K_cos)
    out = out.at[m:, m:].set(K_sin)
    return out + jitter * jnp.eye(M, dtype=K_cos.dtype)


def kuf(kernel, lengthscale, x, a, b, m):
    """Per-dim feature matrix [2m-1, N]: cos/sin evaluations with boundary
    corrections outside [a, b] (reference: GPSat/vff.py:457-518)."""
    om = _omegas(m, a, b)
    om_sin = om[1:]
    Kcos = jnp.cos(om[:, None] * (x[None, :] - a))
    Ksin = jnp.sin(om_sin[:, None] * (x[None, :] - a))

    lt_a = x < a
    gt_b = x > b
    if kernel == "Matern12":
        edge_a = jnp.exp(-jnp.abs(x - a) / lengthscale)
        edge_b = jnp.exp(-jnp.abs(x - b) / lengthscale)
        Kcos = jnp.where(lt_a[None, :], edge_a[None, :], Kcos)
        Kcos = jnp.where(gt_b[None, :], edge_b[None, :], Kcos)
        Ksin = jnp.where((lt_a | gt_b)[None, :], 0.0, Ksin)
    elif kernel == "Matern32":
        arg_a = jnp.sqrt(3.0) * jnp.abs(x - a) / lengthscale
        arg_b = jnp.sqrt(3.0) * jnp.abs(x - b) / lengthscale
        Kcos = jnp.where(lt_a[None, :], ((1 + arg_a) * jnp.exp(-arg_a))[None, :],
                         Kcos)
        Kcos = jnp.where(gt_b[None, :], ((1 + arg_b) * jnp.exp(-arg_b))[None, :],
                         Kcos)
        edge_sa = (x - a)[None, :] * jnp.exp(-arg_a)[None, :] * om_sin[:, None]
        edge_sb = (x - b)[None, :] * jnp.exp(-arg_b)[None, :] * om_sin[:, None]
        Ksin = jnp.where(lt_a[None, :], edge_sa, Ksin)
        Ksin = jnp.where(gt_b[None, :], edge_sb, Ksin)
    # Matern52: edges not implemented in the reference either
    #           (vff.py:500-515 asserts in-domain); in-domain values are exact
    return jnp.concatenate([Kcos, Ksin], axis=0)


def _khatri_rao_rows(mats):
    """Row-wise Kronecker stack: [M1,N],[M2,N] -> [M1*M2,N]
    (reference: make_kvs, GPSat/vff.py:528-559)."""
    def two(A, B):
        return (A[:, None, :] * B[None, :, :]).reshape(
            A.shape[0] * B.shape[0], A.shape[1])
    return reduce(two, mats)


def _kron(mats):
    def two(A, B):
        return (A[:, None, :, None] * B[None, :, None, :]).reshape(
            A.shape[0] * B.shape[0], A.shape[1] * B.shape[1])
    return reduce(two, mats)


def _common(params, X, y, mask, a, b, ms, kernel, jitter):
    """Shared quantities for elbo/predict. params: lengthscales [D],
    kernel_variance [D] (per-dim), likelihood_variance scalar."""
    D = X.shape[1]
    ls = jnp.broadcast_to(jnp.atleast_1d(params["lengthscales"]), (D,))
    kv = jnp.broadcast_to(jnp.atleast_1d(params["kernel_variance"]), (D,))
    sn2 = params["likelihood_variance"]
    mf = mask.astype(X.dtype)

    Kuf_d = [kuf(kernel, ls[i], X[:, i], a[i], b[i], ms[i]) for i in range(D)]
    Kuf = _khatri_rao_rows(Kuf_d) * mf[None, :]
    Kuu_d = [kuu_dense(kernel, ls[i], kv[i], a[i], b[i], ms[i], jitter=jitter)
             for i in range(D)]
    Kuu = _kron(Kuu_d)
    y_m = y * mf

    KufY = Kuf @ y_m
    KufKfu = Kuf @ Kuf.T
    P = KufKfu / sn2 + Kuu
    L = jnp.linalg.cholesky(P)
    c = jsl.solve_triangular(L, KufY, lower=True) / sn2
    return D, ls, kv, sn2, mf, Kuu_d, Kuu, Kuf, y_m, L, c


def elbo(params, X, y, mask, a, b, ms, kernel="Matern32",
         jitter=DEFAULT_JITTER):
    """Collapsed VFF bound (reference: GPR_kron.elbo, GPSat/vff.py:612-644)."""
    D, ls, kv, sn2, mf, Kuu_d, Kuu, Kuf, y_m, L, c = _common(
        params, X, y, mask, a, b, ms, kernel, jitter)
    n = jnp.sum(mf)
    kdiag_total = jnp.prod(kv)          # separable stationary product kernel

    log_det_P = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    M_total = Kuu.shape[0]
    # logdet(kron(A_d)) = sum_d (M_total / M_d) logdet(A_d)
    kuu_logdet = 0.0
    for Ad in Kuu_d:
        Md = Ad.shape[0]
        sign, ld = jnp.linalg.slogdet(Ad)
        kuu_logdet = kuu_logdet + (M_total / Md) * ld

    Kuu_inv = _kron([jnp.linalg.inv(Ad) for Ad in Kuu_d])
    KufKfu = Kuf @ Kuf.T

    out = -0.5 * n * jnp.log(2.0 * jnp.pi * sn2)
    out -= 0.5 * log_det_P
    out += 0.5 * kuu_logdet
    out -= 0.5 * jnp.sum(y_m * y_m) / sn2
    out += 0.5 * jnp.sum(c * c)
    out -= 0.5 * kdiag_total * n / sn2
    out += 0.5 * jnp.sum(Kuu_inv * KufKfu) / sn2
    return out


def neg_elbo(params, X, y, mask, a, b, ms, kernel="Matern32",
             jitter=DEFAULT_JITTER):
    return -elbo(params, X, y, mask, a, b, ms, kernel, jitter)


def predict(params, X, y, mask, Xs, a, b, ms, kernel="Matern32",
            jitter=DEFAULT_JITTER):
    """Posterior at Xs (reference: GPR_kron.predict_f, GPSat/vff.py:645)."""
    D, ls, kv, sn2, mf, Kuu_d, Kuu, Kuf, y_m, L, c = _common(
        params, X, y, mask, a, b, ms, kernel, jitter)
    Kus_d = [kuf(kernel, ls[i], Xs[:, i], a[i], b[i], ms[i]) for i in range(D)]
    Kus = _khatri_rao_rows(Kus_d)
    tmp = jsl.solve_triangular(L, Kus, lower=True)
    mean = tmp.T @ c
    Kuu_inv = _kron([jnp.linalg.inv(Ad) for Ad in Kuu_d])
    KiKus = Kuu_inv @ Kus
    var = jnp.prod(kv) + jnp.sum(tmp * tmp, axis=0) \
        - jnp.sum(KiKus * Kus, axis=0)
    var = jnp.maximum(var, 0.0)
    return {"f*": mean, "f*_var": var, "y_var": var + sn2}
