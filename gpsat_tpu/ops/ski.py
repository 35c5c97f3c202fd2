"""Structured-kernel-interpolation (SKI / KISS-GP) ops.

Reference parity: GPyTorchKISSGPModel (GPSat/models/gpytorch_models.py:321),
which wraps gpytorch's GridInterpolationKernel — the kernel is approximated
as K(X1, X2) ~= W1 Kg W2^T where Kg is the exact kernel on a regular grid and
W are cubic-convolution interpolation weights (Keys 1981, a = -1/2; the same
stencil gpytorch's Interpolation module uses).

TPU-first shape choices: the interpolation matrices are built *dense*
([N, G] per dim, row-wise Kronecker product across dims) by evaluating the
piecewise cubic at every grid node — no scatter/sort, pure vectorised
elementwise work, and every downstream contraction is a plain MXU matmul.
Local experts are small (N <= a few thousand, grid M <= a few thousand), so
dense SKI is both exact-to-the-method and fast; the O(N + M) sparse-MVM
machinery gpytorch needs at N ~ 1e6 has no payoff at expert scale.

Weights reproduce function values exactly at grid nodes and sum to 1 per row
(partition of unity), so SKI -> exact GPR as the grid refines.
"""

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np

from gpsat_tpu.ops.gpr import _mask_kernel_matrix
from gpsat_tpu.ops.kernels import kernel_fn

__all__ = ["choose_grid_size", "make_grid", "interp_weights_1d",
           "interp_matrix", "grid_points", "ski_nlml", "ski_predict"]


def choose_grid_size(X, ratio=1.0, min_size=8):
    """Per-dim grid size heuristic: ratio * N^(1/d) (gpytorch's
    choose_grid_size), floored so the cubic stencil always has support."""
    X = np.asarray(X)
    n, d = X.shape
    return max(int(ratio * n ** (1.0 / d)), min_size)


def make_grid(X, grid_size, pad_cells=2):
    """Regular per-dim grids covering the data plus `pad_cells` cells of
    margin each side (the cubic stencil reads 2 nodes beyond the sample).

    Returns (starts [d], steps [d]) for `grid_size` nodes per dim, in X's
    float dtype — numpy f64 scalars are STRONG types in jax promotion, so
    f64 grid anchors would silently drag an f32 model's whole SKI algebra
    (W, Zg, Gram, solves) up to float64 on TPU.
    """
    X = np.asarray(X)
    dt = X.dtype if np.issubdtype(X.dtype, np.floating) else np.float64
    X = X.astype(np.float64, copy=False)
    lo = X.min(axis=0)
    hi = X.max(axis=0)
    span = np.maximum(hi - lo, 1e-12)
    inner = grid_size - 1 - 2 * pad_cells
    assert inner >= 1, f"grid_size {grid_size} too small for pad {pad_cells}"
    steps = span / inner
    starts = lo - pad_cells * steps
    return starts.astype(dt), steps.astype(dt)


def _keys_cubic(u):
    """Keys (1981) cubic-convolution kernel, a = -1/2; support |u| < 2."""
    au = jnp.abs(u)
    inner = (1.5 * au - 2.5) * au * au + 1.0
    outer = ((-0.5 * au + 2.5) * au - 4.0) * au + 2.0
    return jnp.where(au <= 1.0, inner, jnp.where(au < 2.0, outer, 0.0))


def interp_weights_1d(x, start, step, grid_size):
    """Dense cubic interpolation weights: [N, grid_size] for 1-d samples."""
    u = (x[:, None] - (start + step * jnp.arange(grid_size))[None, :]) / step
    return _keys_cubic(u)


def interp_matrix(X, starts, steps, grid_size):
    """Row-wise Kronecker product of per-dim weights: [N, grid_size**d]."""
    n, d = X.shape
    W = interp_weights_1d(X[:, 0], starts[0], steps[0], grid_size)
    for j in range(1, d):
        Wj = interp_weights_1d(X[:, j], starts[j], steps[j], grid_size)
        W = (W[:, :, None] * Wj[:, None, :]).reshape(n, -1)
    return W


def grid_points(starts, steps, grid_size, d):
    """Full grid as [grid_size**d, d] points (C order, matching
    interp_matrix's Kronecker layout)."""
    axes = [starts[j] + steps[j] * jnp.arange(grid_size) for j in range(d)]
    mesh = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack([m.reshape(-1) for m in mesh], axis=-1)


def _ski_gram(params, W, Zg, kernel, kernel_kwargs=None):
    k = kernel_fn(kernel)
    Kg = k(Zg, Zg, params["lengthscales"], params["kernel_variance"],
           **(kernel_kwargs or {}))
    return W @ Kg @ W.T, Kg


def ski_nlml(params, X, y, mask, W, Zg, kernel, jitter=0.0,
             kernel_kwargs=None):
    """Masked NLML with the SKI kernel (same masking scheme as ops/gpr.nlml;
    reference math: Rasmussen & Williams Algorithm 2.1)."""
    maskf = mask.astype(X.dtype)
    K, _ = _ski_gram(params, W, Zg, kernel, kernel_kwargs)
    A = _mask_kernel_matrix(K, maskf > 0, params["likelihood_variance"],
                            jitter)
    L = jnp.linalg.cholesky(A)
    ym = y * maskf
    z = jsl.solve_triangular(L, ym, lower=True)
    n_valid = jnp.sum(maskf)
    return (0.5 * jnp.sum(z * z)
            + jnp.sum(jnp.log(jnp.diagonal(L)))
            + 0.5 * n_valid * jnp.log(2.0 * jnp.pi))


def ski_predict(params, X, y, mask, Xs, W, Zg, starts, steps, grid_size,
                kernel, jitter=0.0, kernel_kwargs=None):
    """Posterior mean/variance at Xs under the SKI kernel. The cross- and
    test-covariances use the same interpolation (Ks = W Kg Ws^T,
    kss_diag = diag(Ws Kg Ws^T)) so train and test see one model."""
    maskf = mask.astype(X.dtype)
    K, Kg = _ski_gram(params, W, Zg, kernel, kernel_kwargs)
    A = _mask_kernel_matrix(K, maskf > 0, params["likelihood_variance"],
                            jitter)
    L = jnp.linalg.cholesky(A)
    Ws = interp_matrix(Xs, starts, steps, grid_size)
    Ks = (W @ Kg @ Ws.T) * maskf[:, None]
    alpha = jsl.cho_solve((L, True), y * maskf)
    f_mean = Ks.T @ alpha
    v = jsl.solve_triangular(L, Ks, lower=True)
    kss = jnp.sum((Ws @ Kg) * Ws, axis=1)
    f_var = jnp.maximum(kss - jnp.sum(v * v, axis=0), 0.0)
    return {"f*": f_mean, "f*_var": f_var,
            "y_var": f_var + params["likelihood_variance"]}
