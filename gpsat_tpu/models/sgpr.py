"""Sparse GPR (Titsias) local-expert model
(reference parity: GPflowSGPRModel, GPSat/models/gpflow_models.py:666-901).

Inducing points default to a random subset of the (scaled) training inputs —
the reference's selection method (gpflow_models.py:807-819) but with an
explicit seed (the reference used unseeded np.random.shuffle; SURVEY.md §7
flags the missing seed).
"""

import numpy as np
import jax
import jax.numpy as jnp

from gpsat_tpu.models.exact_gpr import GPRModel
from gpsat_tpu.ops import sgpr as sgpr_math
from gpsat_tpu.ops.lbfgs import batched_lbfgs
from gpsat_tpu.ops.packing import ParamSpec, pack, unpack


def select_inducing(coords, num_inducing, seed=42):
    """Random-subset inducing points (M x D); all points when n <= M."""
    n = len(coords)
    if n <= num_inducing:
        return np.asarray(coords, dtype=float).copy()
    rng = np.random.default_rng(seed)
    idx = rng.permutation(n)[:num_inducing]
    return np.asarray(coords, dtype=float)[idx]


class SGPRModel(GPRModel):
    """Titsias sparse-GPR expert: O(N M^2) compute, O(N M) memory."""

    def __init__(self, *args, num_inducing_points=500, inducing_seed=42,
                 jitter=sgpr_math.DEFAULT_JITTER, **kwargs):
        kwargs.setdefault("jitter", jitter)
        super().__init__(*args, **kwargs)
        self.num_inducing_points = num_inducing_points
        self.inducing_points = select_inducing(self.coords,
                                               num_inducing_points,
                                               seed=inducing_seed)

    @property
    def param_names(self):
        return super().param_names + ["inducing_points"]

    def get_inducing_points(self):
        return np.asarray(self.inducing_points).copy()

    def set_inducing_points(self, inducing_points):
        self.inducing_points = np.asarray(inducing_points, dtype=float)

    def set_inducing_points_constraints(self, **kwargs):
        # inducing locations are unconstrained; accept and ignore
        pass

    def _sgpr_args(self):
        Z = jnp.asarray(self.inducing_points)
        return (jnp.asarray(self.coords), jnp.asarray(self.obs[:, 0]),
                jnp.ones(len(self.obs), dtype=bool), Z,
                jnp.ones(len(Z), dtype=bool))

    def get_objective_function_value(self):
        """The ELBO (positive), matching the reference's SGPR semantics
        (gpflow_models.py:864: returns elbo, not its negative)."""
        X, y, m, Z, zm = self._sgpr_args()
        return float(sgpr_math.elbo(self._param_dict(), X, y, m, Z, zm,
                                    kernel=self.kernel, jitter=self.jitter))

    def optimise_parameters(self, train_inducing_points=False, max_iter=1000,
                            fixed_params=None, gtol=1e-6, ftol=1e-11,
                            **opt_kwargs):
        if fixed_params is None:
            fixed_params = []
        hyper_names = tuple(n for n in ("lengthscales", "kernel_variance",
                                        "likelihood_variance")
                            if n not in fixed_params)
        d = self.coords.shape[1]
        M = len(self.inducing_points)
        entries = [(n, (d,) if n == "lengthscales" else ()) for n in hyper_names]
        if train_inducing_points:
            entries.append(("inducing_points", (M, d)))
        spec = ParamSpec(entries)
        X, y, m, Z, zm = self._sgpr_args()
        bij = {n: self.transforms[n] for n in hyper_names}
        kernel, jitter = self.kernel, self.jitter
        names = tuple(n for n, _ in spec.entries)

        def objective(u, X, y, m, Z, zm, bijectors, fixed):
            free = unpack(u, spec)
            params = dict(fixed)
            for n in hyper_names:
                params[n] = bijectors[n].forward(free[n])
            Z_use = free.get("inducing_points", Z)
            return sgpr_math.neg_elbo(params, X, y, m, Z_use, zm,
                                      kernel=kernel, jitter=jitter)

        params = self._param_dict()
        fixed = {n: params[n] for n in ("lengthscales", "kernel_variance",
                                        "likelihood_variance")
                 if n not in hyper_names}
        u0_parts = {n: bij[n].inverse(params[n]) for n in hyper_names}
        if train_inducing_points:
            u0_parts["inducing_points"] = Z
        u0 = pack(u0_parts, spec)

        def add_b(tree):
            return jax.tree.map(lambda a: jnp.asarray(a)[None], tree)

        res = batched_lbfgs(objective, u0[None],
                            args=(X[None], y[None], m[None], Z[None], zm[None],
                                  add_b(bij), add_b(fixed)),
                            max_iter=max_iter, gtol=gtol, ftol=ftol)
        opt = unpack(res.x[0], spec)
        for n in hyper_names:
            val = np.asarray(self.transforms[n].forward(opt[n]))
            if n == "lengthscales":
                self.set_lengthscales(val)
            else:
                self.set_parameters(**{n: float(val)})
        if train_inducing_points:
            self.set_inducing_points(np.asarray(opt["inducing_points"]))
        self._last_opt_success = bool(res.converged[0])
        return self._last_opt_success

    def predict(self, coords, full_cov=False, apply_scale=True, **kwargs):
        import pandas as pd
        if isinstance(coords, (pd.Series, pd.DataFrame)):
            coords = coords[self.coords_col].values if self.coords_col is not None \
                else coords.values
        coords = np.asarray(coords, dtype=float)
        if coords.ndim == 1:
            coords = coords[None, :]
        if apply_scale:
            coords = coords / self.coords_scale
        X, y, m, Z, zm = self._sgpr_args()
        out = sgpr_math.predict(self._param_dict(), X, y, m, Z, zm,
                                jnp.asarray(coords), kernel=self.kernel,
                                jitter=self.jitter)
        result = {k: np.asarray(v) for k, v in out.items()}
        f_bar = self.obs_mean[:, 0]
        result["f_bar"] = np.repeat(f_bar, len(result["f*"])) \
            if len(f_bar) == 1 else f_bar
        return result
