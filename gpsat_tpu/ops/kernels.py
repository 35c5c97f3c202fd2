"""Batched stationary covariance functions.

Covers the reference's GPflow kernel string set
(reference: GPSat/models/gpflow_models.py:73-75): Cosine, Exponential,
Matern12, Matern32, Matern52, RationalQuadratic, RBF/SquaredExponential.

All functions accept arbitrary leading batch dimensions:
    X1: [..., N, D], X2: [..., M, D], lengthscales: [..., D] or scalar,
    variance: [...] scalar per batch element.

Distances are computed by direct differencing (O(N*M*D) on the VPU) rather
than the matmul expansion — for the small D (2-4) of this domain that is both
faster in wall-clock terms than an MXU round-trip and free of the catastrophic
cancellation the expansion suffers at large coordinate values.
"""

import jax.numpy as jnp

__all__ = ["kernel_fn", "KERNEL_NAMES", "scaled_squared_distance", "kernel_diag"]


def scaled_squared_distance(X1, X2, lengthscales):
    """r2[..., n, m] = sum_d ((X1[..., n, d] - X2[..., m, d]) / ls[..., d])^2."""
    ls = jnp.asarray(lengthscales)
    if ls.ndim == 0:
        ls = ls[None]
    x1 = X1 / ls[..., None, :]
    x2 = X2 / ls[..., None, :]
    diff = x1[..., :, None, :] - x2[..., None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def _r(r2):
    # clamped sqrt keeping gradients finite at r=0 (same trick as GPflow)
    return jnp.sqrt(jnp.maximum(r2, 1e-36))


def _matern12(r2):
    return jnp.exp(-_r(r2))


def _matern32(r2):
    r = _r(r2) * jnp.sqrt(3.0)
    return (1.0 + r) * jnp.exp(-r)


def _matern52(r2):
    r = _r(r2) * jnp.sqrt(5.0)
    return (1.0 + r + r**2 / 3.0) * jnp.exp(-r)


def _rbf(r2):
    return jnp.exp(-0.5 * r2)


def _exponential(r2):
    # GPflow Exponential: exp(-r/2)
    return jnp.exp(-0.5 * _r(r2))


_ISOTROPIC = {
    "Matern12": _matern12,
    "Matern32": _matern32,
    "Matern52": _matern52,
    "RBF": _rbf,
    "SquaredExponential": _rbf,
    "Exponential": _exponential,
}

KERNEL_NAMES = sorted(list(_ISOTROPIC) + ["RationalQuadratic", "Cosine"])

# GPyTorch-config compatibility: the reference exposes Matern smoothness as
# a model hyperparameter nu in {0.5, 1.5, 2.5}
# (reference: GPSat/models/gpytorch_models.py:230-248, kernel_kwargs
# {'smoothness': 1.5} at gpytorch_models.py:499). Our kernels are static
# compiled programs, so smoothness selects the Matern order at engine
# construction instead of being a runtime tensor attribute.
_SMOOTHNESS_TO_KERNEL = {0.5: "Matern12", 1.5: "Matern32", 2.5: "Matern52"}


def kernel_from_smoothness(smoothness, kernel="Matern32"):
    """Map a GPyTorch-style Matern `smoothness` (nu) to a kernel name.

    Exact matches 0.5/1.5/2.5 select Matern12/32/52. Other values warn and
    round to the nearest supported order (GPyTorch itself only implements
    half-integer nu). A non-Matern `kernel` together with `smoothness`
    warns and keeps the named kernel.
    """
    import warnings

    nu = float(smoothness)
    if kernel not in ("Matern12", "Matern32", "Matern52"):
        warnings.warn(
            f"smoothness={nu} ignored: kernel {kernel!r} is not a Matern "
            "family kernel", stacklevel=2)
        return kernel
    if nu in _SMOOTHNESS_TO_KERNEL:
        return _SMOOTHNESS_TO_KERNEL[nu]
    nearest = min(_SMOOTHNESS_TO_KERNEL, key=lambda k: abs(k - nu))
    warnings.warn(
        f"smoothness={nu} is not a supported Matern order "
        f"(0.5/1.5/2.5); using nearest: {_SMOOTHNESS_TO_KERNEL[nearest]}",
        stacklevel=2)
    return _SMOOTHNESS_TO_KERNEL[nearest]


def kernel_fn(name):
    """Return k(X1, X2, lengthscales, variance, **kw) for the named kernel."""
    if name in _ISOTROPIC:
        shape_fn = _ISOTROPIC[name]

        def k(X1, X2, lengthscales, variance, **kwargs):
            r2 = scaled_squared_distance(X1, X2, lengthscales)
            return jnp.asarray(variance)[..., None, None] * shape_fn(r2)

        k.__name__ = f"kernel_{name}"
        return k

    if name == "RationalQuadratic":
        def k(X1, X2, lengthscales, variance, alpha=1.0, **kwargs):
            r2 = scaled_squared_distance(X1, X2, lengthscales)
            alpha = jnp.asarray(alpha)
            base = jnp.power(1.0 + r2 / (2.0 * alpha[..., None, None]),
                             -alpha[..., None, None])
            return jnp.asarray(variance)[..., None, None] * base
        return k

    if name == "Cosine":
        def k(X1, X2, lengthscales, variance, **kwargs):
            # GPflow Cosine: cos(2*pi * sum_d (x1_d - x2_d)/ls_d) (signed sum)
            ls = jnp.asarray(lengthscales)
            if ls.ndim == 0:
                ls = ls[None]
            x1 = X1 / ls[..., None, :]
            x2 = X2 / ls[..., None, :]
            d = jnp.sum(x1[..., :, None, :] - x2[..., None, :, :], axis=-1)
            return jnp.asarray(variance)[..., None, None] * jnp.cos(2.0 * jnp.pi * d)
        return k

    raise NotImplementedError(
        f"kernel: {name} not implemented; available: {KERNEL_NAMES}")


def kernel_diag(name, X, lengthscales, variance, **kwargs):
    """diag(k(X, X)): for all stationary kernels here this is `variance`."""
    n = X.shape[-2]
    return jnp.broadcast_to(jnp.asarray(variance)[..., None], (*jnp.shape(variance), n)) \
        if jnp.ndim(variance) else jnp.full((n,), variance, dtype=X.dtype)
