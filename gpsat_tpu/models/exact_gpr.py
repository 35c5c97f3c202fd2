"""Exact GPR local-expert model (JAX; reference parity: GPflowGPRModel,
GPSat/models/gpflow_models.py:26-663 and PurePythonGPR,
GPSat/models/pure_python_gpr.py:15).

Hyperparameters: lengthscales [D], kernel_variance, likelihood_variance.
Optimisation: batched L-BFGS on the NLML in unconstrained (bijected) space.
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from gpsat_tpu.models.base import BaseGPRModel
from gpsat_tpu.ops import gpr_math
from gpsat_tpu.ops.kernels import kernel_fn, KERNEL_NAMES
from gpsat_tpu.ops.lbfgs import batched_lbfgs
from gpsat_tpu.ops.packing import ParamSpec, pack, unpack
from gpsat_tpu.ops.transforms import Softplus, Sigmoid, get_bijector


def move_within_bounds(vals, low, high, tol):
    """Clamp values into [low+tol, high-tol]; tol capped at half the narrowest
    width (reference: GPSat/models/gpflow_models.py:470-486)."""
    vals = np.atleast_1d(np.asarray(vals, dtype=float)).copy()
    low = np.broadcast_to(np.asarray(low, dtype=float), vals.shape)
    high = np.broadcast_to(np.asarray(high, dtype=float), vals.shape)
    half_min_width = np.min(high - low) / 2
    tol = min(tol, half_min_width)
    vals = np.where(vals > high - tol, high - tol, vals)
    vals = np.where(vals < low + tol, low + tol, vals)
    return vals


@lru_cache(maxsize=None)
def make_gpr_objective(kernel, free_names, d):
    """NLML objective over a flat unconstrained vector of the free parameters.

    Static args (kernel, free param names, coord dim) key the compile cache;
    bijectors and fixed parameter values are traced pytree arguments, so
    changing bounds or data never recompiles.
    """
    shapes = {"lengthscales": (d,), "kernel_variance": (), "likelihood_variance": ()}
    spec = ParamSpec([(n, shapes[n]) for n in free_names])

    def objective(u, X, y, mask, bijectors, fixed):
        free = unpack(u, spec)
        params = dict(fixed)
        for n in free_names:
            params[n] = bijectors[n].forward(free[n])
        # fused NLML: analytic adjoint (one tri-inverse + matmul) instead of
        # autodiff through the Cholesky; values/grads agree to float tolerance
        return gpr_math.nlml_fused(params, X, y, mask.astype(X.dtype),
                                   kernel, 0.0)

    return objective, spec


@lru_cache(maxsize=None)
def make_gpr_value_fun(kernel, free_names, d):
    """Batch-level value-only objective through the fused Pallas NLML value
    kernel (ops/pallas_gpr.py). No longer on the L-BFGS hot path — every
    trial now evaluates value_and_grad (ops/lbfgs._make_step) — but kept as
    the cheap bulk NLML evaluator (diagnostics, objective reporting).
    Cached so repeated host-level jit calls see one stable callable."""
    _, spec = make_gpr_objective(kernel, free_names, d)
    from gpsat_tpu.ops.pallas_gpr import nlml_value_batched

    def value_fun(u, X, y, mask, bijectors, fixed):
        def to_params(ui, bi, fi):
            free = unpack(ui, spec)
            params = dict(fi)
            for n in free_names:
                params[n] = bi[n].forward(free[n])
            return params
        params = jax.vmap(to_params)(u, bijectors, fixed)
        return nlml_value_batched(params, X, y, mask.astype(X.dtype),
                                  kernel, 0.0)

    return value_fun


@lru_cache(maxsize=None)
def make_gpr_vg_fun(kernel, free_names, d):
    """Batch-level value_and_grad objective through the fused Pallas
    value+gradient NLML kernel (ops/pallas_gpr.nlml_vg_batched); replaces the
    per-iteration XLA adjoint evaluation in the L-BFGS loop. The chain rule
    through the constraint bijectors runs in XLA via a vjp of the
    (elementwise) unconstrained->parameter map."""
    _, spec = make_gpr_objective(kernel, free_names, d)
    from gpsat_tpu.ops.pallas_gpr import nlml_vg_batched

    all_names = ("lengthscales", "kernel_variance", "likelihood_variance")

    def vg_fun(u, X, y, mask, bijectors, fixed):
        def to_params(u_all):
            def one(ui, bi, fi):
                free = unpack(ui, spec)
                params = dict(fi)
                for n in free_names:
                    params[n] = bi[n].forward(free[n])
                return params
            return jax.vmap(one)(u_all, bijectors, fixed)

        params, pullback = jax.vjp(to_params, u)
        val, gparams = nlml_vg_batched(params, X, y, mask.astype(X.dtype),
                                       kernel, 0.0)
        # cotangents must mirror the params pytree exactly (incl. dtype)
        cot = {n: jnp.asarray(gparams[n], jnp.result_type(params[n])).reshape(
            jnp.shape(params[n])) for n in all_names}
        (gu,) = pullback(cot)
        return jnp.asarray(val, u.dtype), gu

    return vg_fun


def _tree_add_batch_dim(tree):
    return jax.tree.map(lambda a: jnp.asarray(a)[None], tree)


class GPRModel(BaseGPRModel):
    """Exact Gaussian-process regression expert."""

    def __init__(self,
                 data=None,
                 coords_col=None,
                 obs_col=None,
                 coords=None,
                 obs=None,
                 coords_scale=None,
                 obs_scale=None,
                 obs_mean=None,
                 verbose=False,
                 *,
                 kernel="Matern32",
                 kernel_kwargs=None,
                 noise_variance=None,
                 likelihood_variance=None,
                 jitter=0.0,
                 **kwargs):
        super().__init__(data=data, coords_col=coords_col, obs_col=obs_col,
                         coords=coords, obs=obs, coords_scale=coords_scale,
                         obs_scale=obs_scale, obs_mean=obs_mean, verbose=verbose)

        kernel_kwargs = dict(kernel_kwargs or {})
        if "smoothness" in kernel_kwargs:
            # GPyTorch-config compatibility (gpytorch_models.py:230):
            # smoothness selects the Matern order of the compiled kernel
            from gpsat_tpu.ops.kernels import kernel_from_smoothness
            kernel = kernel_from_smoothness(
                kernel_kwargs.pop("smoothness"), kernel)
        assert kernel in KERNEL_NAMES, \
            f"kernel: {kernel} not in available kernels: {KERNEL_NAMES}"
        self.kernel = kernel
        self.jitter = float(jitter)
        d = self.coords.shape[1]
        self._lengthscales = np.asarray(
            kernel_kwargs.pop("lengthscales", np.ones(d)), dtype=float)
        if self._lengthscales.ndim == 0:
            self._lengthscales = np.full(d, float(self._lengthscales))
        # data-driven default initial variances (same scheme as the batched
        # engine) — avoids the degenerate zero-signal optimum the reference's
        # fixed kv=1 init can fall into
        y_var = float(np.var(self.obs[:, 0])) if len(self.obs) > 1 else 1.0
        y_var = max(y_var, 1e-10)
        self._kernel_variance = float(kernel_kwargs.pop("variance", y_var))
        if likelihood_variance is None:
            likelihood_variance = (0.1 * y_var) if noise_variance is None \
                else noise_variance
        self._likelihood_variance = float(likelihood_variance)
        self.kernel_kwargs = kernel_kwargs  # e.g. alpha for RationalQuadratic

        # unconstrained-space bijectors per parameter (GPflow-style positive default)
        self.transforms = {n: Softplus() for n in self.param_names}
        self._last_opt_success = None

    # -- param_names + getters/setters --------------------------------------

    @property
    def param_names(self):
        return ["lengthscales", "kernel_variance", "likelihood_variance"]

    def get_lengthscales(self):
        return self._lengthscales.copy()

    def set_lengthscales(self, lengthscales):
        ls = np.asarray(lengthscales, dtype=float)
        if ls.ndim == 0:
            ls = np.full(self.coords.shape[1], float(ls))
        assert len(ls) == self.coords.shape[1], \
            "lengthscales must align to dim of coords"
        self._lengthscales = ls

    def get_kernel_variance(self):
        return float(self._kernel_variance)

    def set_kernel_variance(self, kernel_variance):
        self._kernel_variance = float(np.asarray(kernel_variance).reshape(-1)[0])

    def get_likelihood_variance(self):
        return float(self._likelihood_variance)

    def set_likelihood_variance(self, likelihood_variance):
        self._likelihood_variance = float(np.asarray(likelihood_variance).reshape(-1)[0])

    # -- constraints ---------------------------------------------------------

    def _set_constraint(self, name, low, high, move_within_tol=True, tol=1e-8,
                        scale=False, scale_magnitude=None):
        low = np.atleast_1d(np.asarray(low, dtype=float))
        high = np.atleast_1d(np.asarray(high, dtype=float))
        assert np.all(low <= high), "all high values must be >= low"
        if scale:
            if scale_magnitude is None:
                low = low / self.coords_scale[0, :]
                high = high / self.coords_scale[0, :]
            else:
                low = low / scale_magnitude
                high = high / scale_magnitude
        cur = np.atleast_1d(self.get_parameters(name)[name])
        if move_within_tol:
            cur = move_within_bounds(cur, low, high, tol)
            self.set_parameters(**{name: cur if name == "lengthscales" else cur[0]})
        if name == "lengthscales":
            self.transforms[name] = Sigmoid(low=jnp.asarray(low), high=jnp.asarray(high))
        else:
            # scalar parameters keep 0-d bounds so shapes stay scalar under vmap
            self.transforms[name] = Sigmoid(low=jnp.asarray(low[0]),
                                            high=jnp.asarray(high[0]))

    def set_lengthscales_constraints(self, low, high, move_within_tol=True,
                                     tol=1e-8, scale=False, scale_magnitude=None):
        self._set_constraint("lengthscales", low, high, move_within_tol, tol,
                             scale, scale_magnitude)

    def set_kernel_variance_constraints(self, low, high, move_within_tol=True,
                                        tol=1e-8, scale=False, scale_magnitude=None):
        self._set_constraint("kernel_variance", low, high, move_within_tol, tol,
                             scale, scale_magnitude)

    def set_likelihood_variance_constraints(self, low, high, move_within_tol=True,
                                            tol=1e-8, scale=False,
                                            scale_magnitude=None):
        self._set_constraint("likelihood_variance", low, high, move_within_tol,
                             tol, scale, scale_magnitude)

    # -- objective / fit / predict -------------------------------------------

    def _param_dict(self):
        return {"lengthscales": jnp.asarray(self._lengthscales),
                "kernel_variance": jnp.asarray(self._kernel_variance),
                "likelihood_variance": jnp.asarray(self._likelihood_variance)}

    def get_objective_function_value(self):
        """Negative log marginal likelihood at current parameters."""
        val = gpr_math.nlml(self._param_dict(), jnp.asarray(self.coords),
                            jnp.asarray(self.obs[:, 0]),
                            jnp.ones(len(self.obs), dtype=bool),
                            kernel=self.kernel, jitter=self.jitter)
        return float(val)

    def optimise_parameters(self, max_iter=1000, fixed_params=None,
                            gtol=1e-6, ftol=1e-11, **opt_kwargs):
        """L-BFGS on the NLML; returns True when converged
        (reference: GPSat/models/gpflow_models.py:291-330)."""
        if fixed_params is None:
            fixed_params = []
        free_names = tuple(n for n in self.param_names if n not in fixed_params)
        if len(free_names) == 0:
            return True
        d = self.coords.shape[1]
        objective, spec = make_gpr_objective(self.kernel, free_names, d)

        params = self._param_dict()
        free = {n: params[n] for n in free_names}
        fixed = {n: params[n] for n in self.param_names if n not in free_names}
        bijectors = {n: self.transforms[n] for n in free_names}
        u0 = pack({n: bijectors[n].inverse(free[n]) for n in free_names}, spec)

        args = (jnp.asarray(self.coords)[None],
                jnp.asarray(self.obs[:, 0])[None],
                jnp.ones(len(self.obs), dtype=bool)[None],
                _tree_add_batch_dim(bijectors),
                _tree_add_batch_dim(fixed))
        res = batched_lbfgs(objective, u0[None], args=args, max_iter=max_iter,
                            gtol=gtol, ftol=ftol)

        opt = unpack(res.x[0], spec)
        for n in free_names:
            val = np.asarray(self.transforms[n].forward(opt[n]))
            if n == "lengthscales":
                self.set_lengthscales(val)
            else:
                self.set_parameters(**{n: float(val)})
        self._last_opt_success = bool(res.converged[0])
        return self._last_opt_success

    def predict(self, coords, full_cov=False, apply_scale=True, **kwargs):
        """Posterior at given coords; keys match the reference
        (GPSat/models/gpflow_models.py:232-272)."""
        import pandas as pd
        if isinstance(coords, (pd.Series, pd.DataFrame)):
            coords = coords[self.coords_col].values if self.coords_col is not None \
                else coords.values
        coords = np.asarray(coords, dtype=float)
        if coords.ndim == 1:
            coords = coords[None, :]
        if apply_scale:
            coords = coords / self.coords_scale

        params = self._param_dict()
        X = jnp.asarray(self.coords)
        y = jnp.asarray(self.obs[:, 0])
        mask = jnp.ones(len(self.obs), dtype=bool)
        out = gpr_math.predict(params, X, y, mask, jnp.asarray(coords),
                               kernel=self.kernel, jitter=self.jitter)
        result = {"f*": np.asarray(out["f*"]),
                  "f*_var": np.asarray(out["f*_var"]),
                  "y_var": np.asarray(out["y_var"])}

        if full_cov:
            k = kernel_fn(self.kernel)
            Xs = jnp.asarray(coords)
            Kss = k(Xs, Xs, params["lengthscales"], params["kernel_variance"],
                    **self.kernel_kwargs)
            L = gpr_math.cholesky_masked(params, X, mask, self.kernel, self.jitter)
            Ks = k(X, Xs, params["lengthscales"], params["kernel_variance"],
                   **self.kernel_kwargs)
            import jax.scipy.linalg as jsl
            v = jsl.solve_triangular(L, Ks, lower=True)
            f_cov = np.asarray(Kss - v.T @ v)
            y_cov = f_cov.copy()
            np.fill_diagonal(y_cov, np.diag(y_cov) + self._likelihood_variance)
            result["f*_cov"] = f_cov
            result["y_cov"] = y_cov

        f_bar = self.obs_mean[:, 0]
        if len(f_bar) != len(result["f*"]):
            assert len(f_bar) == 1
            result["f_bar"] = np.repeat(f_bar, len(result["f*"]))
        else:
            result["f_bar"] = f_bar
        return result
