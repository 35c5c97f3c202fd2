"""SVGP local-expert model (reference parity: GPflowSVGPModel,
GPSat/models/gpflow_models.py:904-1310).

Whitened variational parameterisation, Adam optimisation with the reference's
early-stopping semantics (check ELBO every `check_every` steps, stop when it
has not improved for `persistence` steps). Variational parameters use the
reference's names and shapes: inducing_mean q_mu [M, 1], inducing_chol
q_sqrt [1, M, M].
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from gpsat_tpu.models.sgpr import SGPRModel
from gpsat_tpu.ops import svgp as svgp_math


class SVGPModel(SGPRModel):
    """Sparse variational GP expert: O(B M^2 + M^3) per step."""

    def __init__(self, *args, num_inducing_points=None, minibatch_size=None,
                 jitter=svgp_math.DEFAULT_JITTER, **kwargs):
        # num_inducing None -> inducing = data points (reference behaviour,
        # gpflow_models.py:1056-1064)
        super().__init__(*args, num_inducing_points=(
            num_inducing_points if num_inducing_points is not None else 10**9),
            jitter=jitter, **kwargs)
        self.num_inducing_points = num_inducing_points
        self.minibatch_size = minibatch_size
        M = len(self.inducing_points)
        self._q_mu = np.zeros(M)
        self._q_sqrt_raw = np.eye(M)

    @property
    def param_names(self):
        return ["lengthscales", "kernel_variance", "likelihood_variance",
                "inducing_points", "inducing_mean", "inducing_chol"]

    def get_inducing_mean(self):
        return self._q_mu.copy()[:, None]            # [M, 1] like the reference

    def set_inducing_mean(self, q_mu):
        self._q_mu = np.asarray(q_mu, dtype=float).reshape(-1)

    def set_inducing_mean_constraints(self, **kwargs):
        pass

    def get_inducing_chol(self):
        return np.tril(self._q_sqrt_raw)[None, :, :]  # [1, M, M] like the reference

    def set_inducing_chol(self, q_sqrt):
        q = np.asarray(q_sqrt, dtype=float)
        if q.ndim == 3:
            q = q[0]
        self._q_sqrt_raw = q

    def set_inducing_chol_constraints(self, **kwargs):
        pass

    def _svgp_args(self):
        Z = jnp.asarray(self.inducing_points)
        return (jnp.asarray(self.coords), jnp.asarray(self.obs[:, 0]),
                jnp.ones(len(self.obs), dtype=bool), Z,
                jnp.ones(len(Z), dtype=bool))

    def get_objective_function_value(self):
        """The ELBO (reference: gpflow_models.py:1101 minibatch-averaged; here
        exact full-batch)."""
        X, y, m, Z, zm = self._svgp_args()
        return float(svgp_math.elbo(self._param_dict(), jnp.asarray(self._q_mu),
                                    jnp.asarray(self._q_sqrt_raw), X, y, m, Z,
                                    zm, kernel=self.kernel, jitter=self.jitter))

    def optimise_parameters(self, train_inducing_points=False,
                            natural_gradients=False, fixed_params=None,
                            gamma=0.1, learning_rate=1e-2, max_iter=10_000,
                            persistence=100, check_every=10, early_stop=True,
                            verbose=False, **kwargs):
        """Adam on hyperparameters + variational parameters with the
        reference's plateau early stop (gpflow_models.py:1117-1245)."""
        if fixed_params is None:
            fixed_params = []
        hyper_names = tuple(n for n in ("lengthscales", "kernel_variance",
                                        "likelihood_variance")
                            if n not in fixed_params)
        train_qm = "inducing_mean" not in fixed_params
        train_qs = "inducing_chol" not in fixed_params

        X, y, m, Z, zm = self._svgp_args()
        params = self._param_dict()
        bij = {n: self.transforms[n] for n in hyper_names}
        fixed = {n: params[n] for n in ("lengthscales", "kernel_variance",
                                        "likelihood_variance")
                 if n not in hyper_names}
        kernel, jitter = self.kernel, self.jitter

        theta0 = {
            "u": {n: bij[n].inverse(params[n]) for n in hyper_names},
            "qm": jnp.asarray(self._q_mu),
            "qs": jnp.asarray(self._q_sqrt_raw),
        }

        def unpack_theta(theta):
            p = dict(fixed)
            for n in hyper_names:
                p[n] = bij[n].forward(theta["u"][n])
            return p

        def loss(theta):
            p = unpack_theta(theta)
            qm = theta["qm"] if (train_qm and not natural_gradients) \
                else jax.lax.stop_gradient(theta["qm"])
            qs = theta["qs"] if (train_qs and not natural_gradients) \
                else jax.lax.stop_gradient(theta["qs"])
            return svgp_math.neg_elbo(p, qm, qs, X, y, m, Z, zm, kernel=kernel,
                                      jitter=jitter)

        opt = optax.adam(learning_rate)
        state = opt.init(theta0)

        @jax.jit
        def step(theta, state):
            if natural_gradients:
                # natgrad on (q_mu, q_sqrt) precedes the Adam step
                # (reference: gpflow_models.py:1204-1214)
                qm_n, qs_n = svgp_math.natgrad_step(
                    unpack_theta(theta), theta["qm"], theta["qs"], X, y, m,
                    Z, zm, gamma, kernel=kernel, jitter=jitter)
                ok = jnp.isfinite(qm_n).all() & jnp.isfinite(qs_n).all()
                if train_qm:
                    theta = {**theta, "qm": jnp.where(ok, qm_n, theta["qm"])}
                if train_qs:
                    theta = {**theta, "qs": jnp.where(ok, qs_n, theta["qs"])}
            v, g = jax.value_and_grad(loss)(theta)
            updates, state = opt.update(g, state)
            return optax.apply_updates(theta, updates), state, v

        theta = theta0
        max_elbo, max_count = -np.inf, 0
        stopped_early, opt_success = False, np.nan
        for it in range(int(max_iter)):
            theta, state, v = step(theta, state)
            if it % check_every == 0:
                elbo_now = -float(v)
                if np.isnan(elbo_now):
                    stopped_early, opt_success = True, False
                    break
                if verbose:
                    print(f"step: {it}, elbo: {elbo_now:.2f}")
                if elbo_now > max_elbo and early_stop:
                    max_elbo, max_count = elbo_now, 0
                else:
                    max_count += check_every
                    if max_count >= persistence and early_stop:
                        stopped_early, opt_success = True, True
                        break

        p_final = unpack_theta(theta)
        for n in hyper_names:
            val = np.asarray(p_final[n])
            if n == "lengthscales":
                self.set_lengthscales(val)
            else:
                self.set_parameters(**{n: float(val)})
        self._q_mu = np.asarray(theta["qm"])
        self._q_sqrt_raw = np.asarray(theta["qs"])
        self._last_opt_success = opt_success if stopped_early else np.nan
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
        _, _, _, Z, zm = self._svgp_args()
        out = svgp_math.predict(self._param_dict(), jnp.asarray(self._q_mu),
                                jnp.asarray(self._q_sqrt_raw), Z, zm,
                                jnp.asarray(coords), kernel=self.kernel,
                                jitter=self.jitter)
        result = {k: np.asarray(v) for k, v in out.items()}
        f_bar = self.obs_mean[:, 0]
        result["f_bar"] = np.repeat(f_bar, len(result["f*"])) \
            if len(f_bar) == 1 else f_bar
        return result
