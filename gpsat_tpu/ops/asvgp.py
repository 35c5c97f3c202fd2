"""Actually-Sparse Variational GP features (B-spline inducing functions) —
masked, batchable, JAX.

Re-design of the reference's optional ASVGP backend
(GPSat/models/asvgp_model.py:18-214, which wraps the unvendored external
clone github.com/HJakeCunningham/ASVGP): inter-domain inducing variables are
RKHS projections of the GP onto uniform B-spline basis functions on a box
[a, b]^D. By the reproducing property Kuf[m, i] = phi_m(x_i) — a banded,
*hyperparameter-free* feature matrix — and Kuu[m, n] = <phi_m, phi_n>_H is a
banded Gram matrix under the Matern RKHS inner product. The D-dim model is
the Kronecker product over per-dim bases with the same collapsed (Titsias)
bound as VFF (ops/vff.py).

Math: the Matern-p RKHS inner product on [a, b] is
    <f, g> = pref(lam, s2) * sum_r binom(p+1, r) lam^{2(p+1-r)} Int f^(r) g^(r)
             + jets(a)^T Qa jets(a-g) + jets(b)^T Qb jets(b-g)
with pref = 1/(2 lam s2), 1/(4 lam^3 s2), 3/(16 lam^5 s2) for p = 0, 1, 2 and
boundary quadratic forms Q derived from the minimal-norm tail extension
(validated against the reproducing property <k(x,.), k(y,.)> = k(x, y) in
tests/test_asvgp.py). For uniform B-splines on integer-standardised knots the
integrals Int phi_i^(r) phi_j^(r) and boundary jets are *constants* scaled by
powers of the knot spacing h, so Kuu(theta) is a cheap differentiable
combination of fixed matrices — per-expert domains and autodiff both work.

Basis: degree-k cardinal B-splines matched to the Matern order (reference
mapping: asvgp_model.py:154-165 — B1/Matern12, B2/Matern32, B3/Matern52 with
our degree = spline number), m basis functions per dim spanning m - k uniform
intervals on [a, b] (supports overhang the boundary).
"""

from functools import lru_cache, reduce

import numpy as np
import jax.numpy as jnp
import jax.scipy.linalg as jsl

__all__ = ["kuu_dense", "kuf", "elbo", "neg_elbo", "predict",
           "spline_degree", "DEFAULT_JITTER"]

DEFAULT_JITTER = 1e-8

_DEGREE = {"Matern12": 1, "Matern32": 2, "Matern52": 3}
_SUPPORTED = tuple(_DEGREE)


def spline_degree(kernel):
    """B-spline degree matched to the Matern RKHS order."""
    if kernel not in _DEGREE:
        raise NotImplementedError(
            f"ASVGP supports {_SUPPORTED}, got: {kernel}")
    return _DEGREE[kernel]


def cardinal_bspline(p, t, xp=jnp):
    """Cardinal B-spline B_p(t), support [0, p+1] (Cox–de Boor recursion)."""
    def B(k, u):
        if k == 0:
            return xp.where((u >= 0) & (u < 1), 1.0, 0.0)
        return (u * B(k - 1, u) + (k + 1 - u) * B(k - 1, u - 1)) / k
    return B(p, t)


def cardinal_bspline_deriv(p, t, r, xp=jnp):
    """r-th derivative of B_p: finite differences of B_{p-r}."""
    from math import comb
    if r == 0:
        return cardinal_bspline(p, t, xp)
    out = None
    for i in range(r + 1):
        term = ((-1) ** i * comb(r, i)) * cardinal_bspline(p - r, t - i, xp)
        out = term if out is None else out + term
    return out


@lru_cache(maxsize=None)
def _standard_grams(m, degree):
    """Hyperparameter-free spline constants on integer knots (numpy f64).

    Returns (G, Ja, Jb): G [degree+1, m, m] with G[r] = Int_0^{m-degree}
    B^(r)_i B^(r)_j du on standardised coordinates; Ja/Jb [degree+1, m]
    boundary jets at u = 0 and u = m - degree. Exact via Gauss–Legendre
    (2*degree+2 points per unit interval covers the piecewise-polynomial
    integrands of degree <= 2*degree).
    """
    p = degree
    ni = m - p
    assert ni >= 1, f"need m > degree ({m} <= {p})"
    q, w = np.polynomial.legendre.leggauss(2 * p + 2)
    # nodes in every unit interval [e, e+1]
    u = (np.arange(ni)[:, None] + (q[None, :] + 1.0) / 2.0).reshape(-1)
    wts = np.tile(w / 2.0, ni)
    j = np.arange(m)
    G = np.empty((p + 1, m, m))
    for r in range(p + 1):
        # Phi[r][n, j] = B^(r)_p(u_n - j + p)
        Phi = cardinal_bspline_deriv(p, u[:, None] - j[None, :] + p, r, xp=np)
        G[r] = (Phi * wts[:, None]).T @ Phi
    # jets only up to order p-1 enter the boundary forms (continuous there)
    Ja = np.empty((p, m))
    Jb = np.empty((p, m))
    for r in range(p):
        Ja[r] = cardinal_bspline_deriv(p, 0.0 - j + p, r, xp=np)
        Jb[r] = cardinal_bspline_deriv(p, float(ni) - j + p, r, xp=np)
    return G, Ja, Jb


def _boundary_q(kernel, lam):
    """Boundary quadratic form Q [p, p] (in jets f, f', ... f^(p-1)) at the
    *right* boundary, times s2 (the 1/s2 factor is applied by the caller).
    Derived symbolically from the minimal-energy tail extension; at the left
    boundary odd-derivative entries flip sign."""
    one = jnp.ones((), dtype=jnp.result_type(lam))
    if kernel == "Matern12":
        return (0.5 * one).reshape(1, 1), 1
    if kernel == "Matern32":
        q01 = 1.0 / (4.0 * lam)
        return jnp.stack([
            jnp.stack([0.5 * one, q01]),
            jnp.stack([q01, 1.0 / (2.0 * lam ** 2)]),
        ]), 2
    # Matern52
    q00 = 9.0 / 16.0 * one
    q01 = 9.0 / (16.0 * lam)
    q02 = 3.0 / (16.0 * lam ** 2)
    q11 = 3.0 / (2.0 * lam ** 2)
    q12 = 9.0 / (16.0 * lam ** 3)
    q22 = 9.0 / (16.0 * lam ** 4)
    return jnp.stack([
        jnp.stack([q00, q01, q02]),
        jnp.stack([q01, q11, q12]),
        jnp.stack([q02, q12, q22]),
    ]), 3


# python floats, NOT np.sqrt scalars: a numpy f64 scalar is a STRONG type in
# jax promotion, so `np.sqrt(3.0) / lengthscale_f32` silently promoted lam —
# and through it every Kuu block and the collapsed bound — to float64
# (emulated ~100x slow on TPU; f64 LU is not even implemented on v5e)
_LAM_MULT = {"Matern12": 1.0, "Matern32": float(np.sqrt(3.0)),
             "Matern52": float(np.sqrt(5.0))}
_PREF_C = {"Matern12": 2.0, "Matern32": 4.0, "Matern52": 16.0 / 3.0}


def kuu_dense(kernel, lengthscale, variance, a, b, m, jitter=0.0):
    """Per-dim Kuu [m, m]: the B-spline Gram matrix under the Matern RKHS
    inner product on [a, b]. Differentiable in lengthscale/variance/a/b."""
    from math import comb
    p = spline_degree(kernel)
    G_np, Ja_np, Jb_np = _standard_grams(int(m), p)
    ni = int(m) - p
    h = (b - a) / ni
    lam = _LAM_MULT[kernel] / lengthscale
    pref = 1.0 / (_PREF_C[kernel] * lam ** (2 * p - 1) * variance)
    dt = jnp.result_type(lengthscale, variance, h)

    out = jnp.zeros((int(m), int(m)), dtype=dt)
    for r in range(p + 1):
        w_r = comb(p, r) * lam ** (2 * (p - r))
        out = out + (pref * w_r * h ** (1 - 2 * r)) * jnp.asarray(G_np[r], dt)

    Q, nj = _boundary_q(kernel, lam)
    sign = jnp.asarray([(-1.0) ** r for r in range(nj)], dt)
    Qa = Q * (sign[:, None] * sign[None, :])
    for r in range(nj):
        for s in range(nj):
            ja = jnp.asarray(Ja_np[r][:, None] * Ja_np[s][None, :], dt)
            jb = jnp.asarray(Jb_np[r][:, None] * Jb_np[s][None, :], dt)
            hs = h ** (-(r + s))
            out = out + (Qa[r, s] * hs / variance) * ja \
                      + (Q[r, s] * hs / variance) * jb
    return out + jitter * jnp.eye(int(m), dtype=dt)


def kuf(kernel, x, a, b, m):
    """Per-dim feature matrix [m, N]: phi_j(x_i) = B_p((x-a)/h - j + p).
    Hyperparameter-free (reproducing property); zero outside the support."""
    p = spline_degree(kernel)
    ni = int(m) - p
    h = (b - a) / ni
    u = (x - a) / h
    j = jnp.arange(int(m), dtype=x.dtype)
    return cardinal_bspline(p, u[None, :] - j[:, None] + p).astype(x.dtype)


def _khatri_rao_rows(mats):
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
    """Shared quantities for elbo/predict (same collapsed-bound plumbing as
    ops/vff.py:_common). params: lengthscales [D], kernel_variance [D]
    (per-dim), likelihood_variance scalar."""
    D = X.shape[1]
    ls = jnp.broadcast_to(jnp.atleast_1d(params["lengthscales"]), (D,))
    kv = jnp.broadcast_to(jnp.atleast_1d(params["kernel_variance"]), (D,))
    sn2 = params["likelihood_variance"]
    mf = mask.astype(X.dtype)

    Kuf_d = [kuf(kernel, X[:, i], a[i], b[i], ms[i]) for i in range(D)]
    Kuf = _khatri_rao_rows(Kuf_d) * mf[None, :]
    Kuu_d = [kuu_dense(kernel, ls[i], kv[i], a[i], b[i], ms[i], jitter=jitter)
             for i in range(D)]
    y_m = y * mf

    KufY = Kuf @ y_m
    KufKfu = Kuf @ Kuf.T
    P = KufKfu / sn2 + _kron(Kuu_d)
    L = jnp.linalg.cholesky(P)
    c = jsl.solve_triangular(L, KufY, lower=True) / sn2
    return D, ls, kv, sn2, mf, Kuu_d, Kuf, KufKfu, y_m, L, c


def elbo(params, X, y, mask, a, b, ms, kernel="Matern32",
         jitter=DEFAULT_JITTER):
    """Collapsed bound; same structure as the VFF GPR_kron bound
    (reference: GPSat/vff.py:612-644, shared by the external ASVGP GPR_kron)."""
    D, ls, kv, sn2, mf, Kuu_d, Kuf, KufKfu, y_m, L, c = _common(
        params, X, y, mask, a, b, ms, kernel, jitter)
    n = jnp.sum(mf)
    kdiag_total = jnp.prod(kv)

    log_det_P = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    M_total = int(np.prod([Ad.shape[0] for Ad in Kuu_d]))
    kuu_logdet = 0.0
    for Ad in Kuu_d:
        Md = Ad.shape[0]
        _, ld = jnp.linalg.slogdet(Ad)
        kuu_logdet = kuu_logdet + (M_total / Md) * ld

    Kuu_inv = _kron([jnp.linalg.inv(Ad) for Ad in Kuu_d])

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
    """Posterior at Xs. Points outside the spline domain fall back to the
    prior (their features are zero) — size the domain to cover predictions."""
    D, ls, kv, sn2, mf, Kuu_d, Kuf, KufKfu, y_m, L, c = _common(
        params, X, y, mask, a, b, ms, kernel, jitter)
    Kus_d = [kuf(kernel, Xs[:, i], a[i], b[i], ms[i]) for i in range(D)]
    Kus = _khatri_rao_rows(Kus_d)
    tmp = jsl.solve_triangular(L, Kus, lower=True)
    mean = tmp.T @ c
    Kuu_inv = _kron([jnp.linalg.inv(Ad) for Ad in Kuu_d])
    KiKus = Kuu_inv @ Kus
    var = jnp.prod(kv) + jnp.sum(tmp * tmp, axis=0) \
        - jnp.sum(KiKus * Kus, axis=0)
    var = jnp.maximum(var, 0.0)
    return {"f*": mean, "f*_var": var, "y_var": var + sn2}
