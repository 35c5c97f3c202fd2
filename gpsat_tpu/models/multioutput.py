"""Multi-output forward-model GPR expert
(reference: GPSat/models/multioutput/gpr.py:14 MultioutputGPR — experimental,
not wired into the reference factory either; kept API-compatible with
BaseGPRModel so it can slot into custom drivers).

Observation model: y = H f(x) + eps, eps ~ N(0, R); f = W g with Q latent GPs.
Use cases: multi-satellite fusion with per-instrument measurement operators
and noise covariances (e.g. radar + laser freeboard).
"""

import numpy as np
import jax
import jax.numpy as jnp

from gpsat_tpu.models.base import BaseGPRModel
from gpsat_tpu.ops import multioutput as mo
from gpsat_tpu.ops.lbfgs import batched_lbfgs
from gpsat_tpu.ops.packing import ParamSpec, pack, unpack
from gpsat_tpu.ops.transforms import Softplus  # default param transform


class MultioutputGPRModel(BaseGPRModel):
    """Exact multi-output GPR with a linear measurement operator."""

    def __init__(self, data=None, coords_col=None, obs_col=None, coords=None,
                 obs=None, coords_scale=None, obs_scale=None, obs_mean=None,
                 verbose=False, *,
                 kernel="Matern32",
                 num_latent_gps=None,
                 W=None, H=None, R=None,
                 kernel_kwargs=None,
                 jitter=1e-8, **kwargs):
        super().__init__(data=data, coords_col=coords_col, obs_col=obs_col,
                         coords=coords, obs=obs, coords_scale=coords_scale,
                         obs_scale=obs_scale, obs_mean=obs_mean,
                         verbose=verbose)
        P = self.obs.shape[1]
        if W is None:
            assert num_latent_gps is not None or H is not None, \
                "provide W, H or num_latent_gps"
            L = H.shape[1] if H is not None else (num_latent_gps or P)
            W = np.eye(L)
        self.W = np.asarray(W, dtype=float)           # [L, Q]
        L, Q = self.W.shape
        self.H = np.eye(P, L) if H is None else np.asarray(H, dtype=float)
        assert self.H.shape == (P, L), f"H must be [P={P}, L={L}]"
        self.R = 0.1 * np.eye(P) if R is None else np.asarray(R, dtype=float)
        assert self.R.shape == (P, P)
        self.kernel = kernel
        self.jitter = float(jitter)
        self.num_latent_gps = Q

        kernel_kwargs = dict(kernel_kwargs or {})
        d = self.coords.shape[1]
        ls = np.asarray(kernel_kwargs.get("lengthscales", np.ones((Q, d))),
                        dtype=float)
        if ls.ndim == 1:
            ls = np.broadcast_to(ls, (Q, d)).copy()
        self._lengthscales = ls                      # [Q, D]
        kv = np.asarray(kernel_kwargs.get("variance", np.ones(Q)), dtype=float)
        self._kernel_variance = np.broadcast_to(np.atleast_1d(kv), (Q,)).copy()
        self.transforms = {n: Softplus() for n in self.param_names}

    @property
    def param_names(self):
        return ["lengthscales", "kernel_variance"]

    def get_lengthscales(self):
        return self._lengthscales.copy()

    def set_lengthscales(self, lengthscales):
        ls = np.asarray(lengthscales, dtype=float)
        self._lengthscales = ls.reshape(self._lengthscales.shape)

    def get_kernel_variance(self):
        return self._kernel_variance.copy()

    def set_kernel_variance(self, kernel_variance):
        kv = np.atleast_1d(np.asarray(kernel_variance, dtype=float))
        self._kernel_variance = np.broadcast_to(
            kv, self._kernel_variance.shape).copy()

    def _args(self):
        return (jnp.asarray(self.W), jnp.asarray(self.H), jnp.asarray(self.R),
                jnp.asarray(self.coords), jnp.asarray(self.obs),
                jnp.ones(len(self.obs), dtype=bool))

    def _param_dict(self):
        return {"lengthscales": jnp.asarray(self._lengthscales),
                "kernel_variance": jnp.asarray(self._kernel_variance)}

    def get_objective_function_value(self):
        """Negative log marginal likelihood of the stacked observations."""
        W, H, R, X, Y, m = self._args()
        return -float(mo.log_marginal_likelihood(
            self._param_dict(), W, H, R, X, Y, m, kernel=self.kernel,
            jitter=self.jitter))

    def optimise_parameters(self, max_iter=500, fixed_params=None, gtol=1e-6,
                            ftol=1e-11, **kwargs):
        if fixed_params is None:
            fixed_params = []
        Q, d = self._lengthscales.shape
        free_names = tuple(n for n in self.param_names if n not in fixed_params)
        shapes = {"lengthscales": (Q, d), "kernel_variance": (Q,)}
        spec = ParamSpec([(n, shapes[n]) for n in free_names])
        W, H, R, X, Y, m = self._args()
        bij = {n: self.transforms[n] for n in free_names}
        params = self._param_dict()
        fixed = {n: params[n] for n in self.param_names if n not in free_names}
        kernel, jitter = self.kernel, self.jitter

        def objective(u, W, H, R, X, Y, m, bijectors, fixed_v):
            free = unpack(u, spec)
            p = dict(fixed_v)
            for n in free_names:
                p[n] = bijectors[n].forward(free[n])
            return -mo.log_marginal_likelihood(p, W, H, R, X, Y, m,
                                               kernel=kernel, jitter=jitter)

        u0 = pack({n: bij[n].inverse(params[n]) for n in free_names}, spec)
        add_b = lambda t: jax.tree.map(lambda a: jnp.asarray(a)[None], t)
        res = batched_lbfgs(objective, u0[None],
                            args=(W[None], H[None], R[None], X[None], Y[None],
                                  m[None], add_b(bij), add_b(fixed)),
                            max_iter=max_iter, gtol=gtol, ftol=ftol)
        opt = unpack(res.x[0], spec)
        for n in free_names:
            getattr(self, f"set_{n}")(np.asarray(self.transforms[n].forward(opt[n])))
        self._last_opt_success = bool(res.converged[0])
        return self._last_opt_success

    def predict(self, coords, full_cov=False, apply_scale=True,
                latent=True, **kwargs):
        """Posterior of the latent field f at coords; dict with 'f*' [Ns, L],
        'f*_var' [Ns, L] and observation-space 'y*'/'y_var' when latent=False
        is also desired."""
        import pandas as pd
        if isinstance(coords, (pd.Series, pd.DataFrame)):
            coords = coords[self.coords_col].values if self.coords_col is not None \
                else coords.values
        coords = np.asarray(coords, dtype=float)
        if coords.ndim == 1:
            coords = coords[None, :]
        if apply_scale:
            coords = coords / self.coords_scale
        W, H, R, X, Y, m = self._args()
        mean, var = mo.predict_f(self._param_dict(), W, H, R, X, Y, m,
                                 jnp.asarray(coords), kernel=self.kernel,
                                 jitter=self.jitter)
        out = {"f*": np.asarray(mean), "f*_var": np.asarray(var)}
        ym, yc = mo.predict_y(self._param_dict(), W, H, R, X, Y, m,
                              jnp.asarray(coords), kernel=self.kernel,
                              jitter=self.jitter)
        out["y*"] = np.asarray(ym)
        out["y_var"] = np.asarray(np.einsum("spp->sp", np.asarray(yc)))
        f_bar = np.atleast_1d(self.obs_mean[0])
        out["f_bar"] = np.broadcast_to(f_bar, (len(coords), len(f_bar))).copy()
        return out
