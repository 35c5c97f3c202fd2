"""KISS-GP (SKI) local-expert model.

Reference parity: GPyTorchKISSGPModel (GPSat/models/gpytorch_models.py:321),
an exact-GPR variant whose kernel is replaced by structured kernel
interpolation over an auto-sized regular grid
(gpytorch.kernels.GridInterpolationKernel with
gpytorch.utils.grid.choose_grid_size). Hyperparameters, constraints and the
optimise/predict API are identical to GPRModel; only the Gram matrices go
through the SKI approximation (ops/ski.py).
"""

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from gpsat_tpu.models.exact_gpr import GPRModel, _tree_add_batch_dim
from gpsat_tpu.ops import ski
from gpsat_tpu.ops.lbfgs import batched_lbfgs
from gpsat_tpu.ops.packing import ParamSpec, pack, unpack


@lru_cache(maxsize=None)
def _make_ski_objective(kernel, free_names, d):
    """NLML over the flat unconstrained vector, SKI Gram; W/Zg are traced."""
    shapes = {"lengthscales": (d,), "kernel_variance": (),
              "likelihood_variance": ()}
    spec = ParamSpec([(n, shapes[n]) for n in free_names])

    def objective(u, X, y, mask, W, Zg, bijectors, fixed):
        free = unpack(u, spec)
        params = dict(fixed)
        for n in free_names:
            params[n] = bijectors[n].forward(free[n])
        return ski.ski_nlml(params, X, y, mask, W, Zg, kernel)

    return objective, spec


class KISSGPModel(GPRModel):
    """Exact-GPR expert with a grid-interpolation (SKI) kernel.

    Two execution modes:
    - dense (default at expert scale): [N, G] interpolation matrices and
      dense Gram algebra — exact-to-the-method, MXU-friendly, fastest when
      N and G^d are a few thousand;
    - structured (`structured=True`, or auto when N * G^d exceeds
      `structured_threshold` elements): never materialises W or Kg —
      BTTB FFT grid-kernel MVMs, sparse stencil interpolation, CG solves
      and stochastic-trace Adam training (ops/ski_structured) — the
      machinery gpytorch uses at the N the reference reaches for KISS.
    """

    def __init__(self, *args, grid_size=None, grid_ratio=1.0,
                 structured=None, structured_threshold=2**24, **kwargs):
        super().__init__(*args, **kwargs)
        d = self.coords.shape[1]
        if grid_size is None:
            grid_size = ski.choose_grid_size(self.coords, ratio=grid_ratio)
        self.grid_size = int(grid_size)
        self._starts, self._steps = ski.make_grid(self.coords, self.grid_size)
        if structured is None:
            structured = (len(self.coords) * self.grid_size ** d
                          > structured_threshold)
        self.structured = bool(structured)
        if self.structured:
            from gpsat_tpu.ops.ski_structured import SparseInterp
            self._interp = SparseInterp(self.coords, self._starts,
                                        self._steps, self.grid_size)
            self._Zg = None
            self._W = None
            return
        self._Zg = ski.grid_points(jnp.asarray(self._starts),
                                   jnp.asarray(self._steps),
                                   self.grid_size, d)
        self._W = ski.interp_matrix(jnp.asarray(self.coords),
                                    jnp.asarray(self._starts),
                                    jnp.asarray(self._steps), self.grid_size)

    def get_objective_function_value(self):
        if self.structured:
            # data-fit half of the NLML (0.5 y^T K^-1 y + const); the logdet
            # needs stochastic Lanczos at structured scale — report the CG
            # quadratic form like gpytorch's diagnostic loss
            from gpsat_tpu.ops.ski_structured import cg_solve, ski_matvec
            d = self.coords.shape[1]
            y = jnp.asarray(self.obs[:, 0])
            params = self._param_dict()
            mv = lambda v: ski_matvec(params, self._interp, self._steps,
                                      self.grid_size, self.kernel, d, v,
                                      self.jitter)
            alpha = cg_solve(mv, y[None], tol=1e-6, max_iter=200)[0]
            return float(0.5 * jnp.sum(y * alpha)
                         + 0.5 * len(y) * np.log(2 * np.pi))
        val = ski.ski_nlml(self._param_dict(), jnp.asarray(self.coords),
                           jnp.asarray(self.obs[:, 0]),
                           jnp.ones(len(self.obs), dtype=bool),
                           self._W, self._Zg, self.kernel, self.jitter)
        return float(val)

    def optimise_parameters(self, max_iter=1000, fixed_params=None,
                            gtol=1e-6, ftol=1e-11, iterations=30, lr=0.1,
                            **opt_kwargs):
        if fixed_params is None:
            fixed_params = []
        if self.structured:
            # gpytorch-style fixed-iteration Adam with stochastic trace
            # gradients (reference: gpytorch_models.py:181 Adam lr=0.1)
            from gpsat_tpu.ops.ski_structured import ski_fit_adam
            free_names = [n for n in self.param_names
                          if n not in fixed_params]
            params = self._param_dict()
            p0 = {n: params[n] for n in free_names}
            bij = {n: self.transforms[n] for n in free_names}
            opt_params, self._interp = ski_fit_adam(
                p0, bij, self.coords, self.obs[:, 0], self._starts,
                self._steps, self.grid_size, self.kernel,
                jitter=max(self.jitter, 1e-6), iterations=int(iterations),
                lr=lr)
            for n in free_names:
                val = np.asarray(opt_params[n])
                if n == "lengthscales":
                    self.set_lengthscales(val)
                else:
                    self.set_parameters(**{n: float(val)})
            self._last_opt_success = all(
                np.isfinite(np.asarray(v)).all()
                for v in opt_params.values())
            return self._last_opt_success
        free_names = tuple(n for n in self.param_names
                           if n not in fixed_params)
        if len(free_names) == 0:
            return True
        d = self.coords.shape[1]
        objective, spec = _make_ski_objective(self.kernel, free_names, d)

        params = self._param_dict()
        free = {n: params[n] for n in free_names}
        fixed = {n: params[n] for n in self.param_names
                 if n not in free_names}
        bijectors = {n: self.transforms[n] for n in free_names}
        u0 = pack({n: bijectors[n].inverse(free[n]) for n in free_names},
                  spec)

        args = (jnp.asarray(self.coords)[None],
                jnp.asarray(self.obs[:, 0])[None],
                jnp.ones(len(self.obs), dtype=bool)[None],
                self._W[None], self._Zg[None],
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
        import pandas as pd
        if isinstance(coords, (pd.Series, pd.DataFrame)):
            coords = coords[self.coords_col].values \
                if self.coords_col is not None else coords.values
        coords = np.asarray(coords, dtype=float)
        if coords.ndim == 1:
            coords = coords[None, :]
        if apply_scale:
            coords = coords / self.coords_scale

        if self.structured:
            from gpsat_tpu.ops.ski_structured import ski_predict_cg
            out = ski_predict_cg(
                self._param_dict(), self._interp, self.coords,
                self.obs[:, 0], coords, self._starts, self._steps,
                self.grid_size, self.kernel,
                jitter=max(self.jitter, 1e-6))
            result = {"f*": np.asarray(out["f*"]),
                      "f*_var": np.asarray(out["f*_var"]),
                      "y_var": np.asarray(out["y_var"])}
            f_bar = self.obs_mean[:, 0]
            if len(f_bar) != len(result["f*"]):
                assert len(f_bar) == 1
                result["f_bar"] = np.repeat(f_bar, len(result["f*"]))
            else:
                result["f_bar"] = f_bar
            return result

        out = ski.ski_predict(
            self._param_dict(), jnp.asarray(self.coords),
            jnp.asarray(self.obs[:, 0]),
            jnp.ones(len(self.obs), dtype=bool), jnp.asarray(coords),
            self._W, self._Zg, jnp.asarray(self._starts),
            jnp.asarray(self._steps), self.grid_size, self.kernel,
            self.jitter)
        result = {"f*": np.asarray(out["f*"]),
                  "f*_var": np.asarray(out["f*_var"]),
                  "y_var": np.asarray(out["y_var"])}

        f_bar = self.obs_mean[:, 0]
        if len(f_bar) != len(result["f*"]):
            assert len(f_bar) == 1
            result["f_bar"] = np.repeat(f_bar, len(result["f*"]))
        else:
            result["f_bar"] = f_bar
        return result
