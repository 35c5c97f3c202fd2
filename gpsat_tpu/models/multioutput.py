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


class MultioutputSVGPModel(BaseGPRModel):
    """Sparse variational multi-output GP with a forward-model likelihood
    (reference: MultioutputSVGP, GPSat/models/multioutput/gpr.py:82).

    Observation model y = h(x, f) + eps, eps ~ N(0, R); f = W g with Q latent
    GPs sharing M inducing locations. `forward_model` selects the likelihood:
    an [P, L] array/None gives the analytic linear likelihood
    (LinearModelLikelihood, likelihoods.py:40); a callable h(X, F) -> [N, P]
    gives the Monte-Carlo nonlinear likelihood (NonlinearModelLikelihood,
    likelihoods.py:148) with `num_mc_samples` draws.
    """

    def __init__(self, data=None, coords_col=None, obs_col=None, coords=None,
                 obs=None, coords_scale=None, obs_scale=None, obs_mean=None,
                 verbose=False, *,
                 kernel="Matern32",
                 num_latent_gps=None,
                 W=None, H=None, R=None,
                 forward_model=None,
                 num_inducing_points=None,
                 num_mc_samples=100,
                 mc_seed=0,
                 inducing_seed=42,
                 kernel_kwargs=None,
                 jitter=1e-6, **kwargs):
        super().__init__(data=data, coords_col=coords_col, obs_col=obs_col,
                         coords=coords, obs=obs, coords_scale=coords_scale,
                         obs_scale=obs_scale, obs_mean=obs_mean,
                         verbose=verbose)
        P = self.obs.shape[1]
        self.h = None
        if callable(forward_model):
            self.h = forward_model
            assert num_latent_gps is not None, \
                "num_latent_gps required with a nonlinear forward model"
            L = num_latent_gps if W is None else np.asarray(W).shape[0]
        elif forward_model is not None:
            H = np.asarray(forward_model, dtype=float)
            L = H.shape[1]
        elif H is not None:
            H = np.asarray(H, dtype=float)
            L = H.shape[1]
        else:
            L = num_latent_gps or P
        if W is None:
            W = np.eye(L, num_latent_gps or L)
        self.W = np.asarray(W, dtype=float)            # [L, Q]
        L, Q = self.W.shape
        self.H = None
        if self.h is None:
            self.H = np.eye(P, L) if H is None else np.asarray(H, dtype=float)
            assert self.H.shape == (P, L), f"H must be [P={P}, L={L}]"
        self.R = 0.1 * np.eye(P) if R is None else np.asarray(R, dtype=float)
        assert self.R.shape == (P, P)
        self.kernel = kernel
        self.jitter = float(jitter)
        self.num_latent_gps = Q
        self.num_mc_samples = int(num_mc_samples)
        self.mc_seed = int(mc_seed)

        # seeded random-subset inducing locations (reference pattern:
        # gpflow_models.py:807-819 / gpr.py __main__ shuffle-take-M)
        N = len(self.coords)
        M = N if num_inducing_points is None else min(int(num_inducing_points), N)
        rng = np.random.default_rng(inducing_seed)
        self.inducing_points = self.coords[rng.permutation(N)[:M]].copy()
        self._q_mu = np.zeros((M, Q))
        self._q_sqrt_raw = np.broadcast_to(np.eye(M), (Q, M, M)).copy()

        kernel_kwargs = dict(kernel_kwargs or {})
        d = self.coords.shape[1]
        ls = np.asarray(kernel_kwargs.get("lengthscales", np.ones((Q, d))),
                        dtype=float)
        if ls.ndim <= 1:
            ls = np.broadcast_to(ls, (Q, d)).copy()
        self._lengthscales = ls
        kv = np.asarray(kernel_kwargs.get("variance", np.ones(Q)), dtype=float)
        self._kernel_variance = np.broadcast_to(np.atleast_1d(kv), (Q,)).copy()
        self.transforms = {"lengthscales": Softplus(),
                           "kernel_variance": Softplus()}

    # -- parameter surface ---------------------------------------------------

    @property
    def param_names(self):
        return ["lengthscales", "kernel_variance", "inducing_points",
                "inducing_mean", "inducing_chol"]

    get_lengthscales = MultioutputGPRModel.get_lengthscales
    set_lengthscales = MultioutputGPRModel.set_lengthscales
    get_kernel_variance = MultioutputGPRModel.get_kernel_variance
    set_kernel_variance = MultioutputGPRModel.set_kernel_variance

    def get_inducing_points(self):
        return self.inducing_points.copy()

    def set_inducing_points(self, Z):
        self.inducing_points = np.asarray(Z, dtype=float).reshape(
            self.inducing_points.shape)

    def get_inducing_mean(self):
        return self._q_mu.copy()

    def set_inducing_mean(self, q_mu):
        self._q_mu = np.asarray(q_mu, dtype=float).reshape(self._q_mu.shape)

    def get_inducing_chol(self):
        return np.stack([np.tril(q) for q in self._q_sqrt_raw])

    def set_inducing_chol(self, q_sqrt):
        self._q_sqrt_raw = np.asarray(q_sqrt, dtype=float).reshape(
            self._q_sqrt_raw.shape)

    def _param_dict(self):
        return {"lengthscales": jnp.asarray(self._lengthscales),
                "kernel_variance": jnp.asarray(self._kernel_variance)}

    def _args(self):
        N, M = len(self.coords), len(self.inducing_points)
        return (jnp.asarray(self.W), jnp.asarray(self.R),
                jnp.asarray(self.coords), jnp.asarray(self.obs),
                jnp.ones(N, dtype=bool), jnp.asarray(self.inducing_points),
                jnp.ones(M, dtype=bool))

    def _elbo_kwargs(self, key=None):
        kw = dict(kernel=self.kernel, jitter=self.jitter)
        if self.h is not None:
            kw.update(h=self.h, num_samples=self.num_mc_samples,
                      key=key if key is not None
                      else jax.random.PRNGKey(self.mc_seed))
        else:
            kw.update(H=jnp.asarray(self.H))
        return kw

    def get_objective_function_value(self):
        """The ELBO (MC-estimated with the fixed seed for nonlinear h)."""
        W, R, X, Y, m, Z, zm = self._args()
        return float(mo.svgp_elbo(
            self._param_dict(), W, R, jnp.asarray(self._q_mu),
            jnp.asarray(self._q_sqrt_raw), X, Y, m, Z, zm,
            **self._elbo_kwargs()))

    def optimise_parameters(self, max_iter=2000, learning_rate=1e-2,
                            fixed_params=None, check_every=10,
                            persistence=100, early_stop=True, verbose=False,
                            **kwargs):
        """Adam on (hypers, q_mu, q_sqrt) with the reference's plateau early
        stop; the MC key advances per iteration for the nonlinear
        likelihood."""
        import optax
        if fixed_params is None:
            fixed_params = []
        free_names = tuple(n for n in ("lengthscales", "kernel_variance")
                           if n not in fixed_params)
        train_qm = "inducing_mean" not in fixed_params
        train_qs = "inducing_chol" not in fixed_params
        W, R, X, Y, m, Z, zm = self._args()
        params = self._param_dict()
        bij = {n: self.transforms[n] for n in free_names}
        fixed = {n: params[n] for n in ("lengthscales", "kernel_variance")
                 if n not in free_names}

        theta0 = {"u": {n: bij[n].inverse(params[n]) for n in free_names},
                  "qm": jnp.asarray(self._q_mu),
                  "qs": jnp.asarray(self._q_sqrt_raw)}

        def unpack_theta(theta):
            p = dict(fixed)
            for n in free_names:
                p[n] = bij[n].forward(theta["u"][n])
            return p

        def loss(theta, key):
            p = unpack_theta(theta)
            qm = theta["qm"] if train_qm else jax.lax.stop_gradient(theta["qm"])
            qs = theta["qs"] if train_qs else jax.lax.stop_gradient(theta["qs"])
            return -mo.svgp_elbo(p, W, R, qm, qs, X, Y, m, Z, zm,
                                 **self._elbo_kwargs(key=key))

        opt = optax.adam(learning_rate)
        state = opt.init(theta0)

        @jax.jit
        def step(theta, state, key):
            v, g = jax.value_and_grad(loss)(theta, key)
            updates, state = opt.update(g, state)
            return optax.apply_updates(theta, updates), state, v

        theta = theta0
        key = jax.random.PRNGKey(self.mc_seed)
        max_elbo, max_count = -np.inf, 0
        stopped_early, opt_success = False, np.nan
        for it in range(int(max_iter)):
            key, sub = jax.random.split(key)
            theta, state, v = step(theta, state, sub)
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
        for n in free_names:
            getattr(self, f"set_{n}")(np.asarray(p_final[n]))
        self._q_mu = np.asarray(theta["qm"])
        self._q_sqrt_raw = np.asarray(theta["qs"])
        self._last_opt_success = opt_success if stopped_early else np.nan
        return self._last_opt_success

    def predict(self, coords, full_cov=False, apply_scale=True, **kwargs):
        """Latent-field posterior f at coords ('f*', 'f*_var' [Ns, L]);
        observation-space 'y*'/'y_var' added for the linear likelihood."""
        import pandas as pd
        if isinstance(coords, (pd.Series, pd.DataFrame)):
            coords = coords[self.coords_col].values if self.coords_col is not None \
                else coords.values
        coords = np.asarray(coords, dtype=float)
        if coords.ndim == 1:
            coords = coords[None, :]
        if apply_scale:
            coords = coords / self.coords_scale
        W, R, X, Y, m, Z, zm = self._args()
        mean, var = mo.svgp_predict_f(
            self._param_dict(), W, jnp.asarray(self._q_mu),
            jnp.asarray(self._q_sqrt_raw), Z, zm, jnp.asarray(coords),
            kernel=self.kernel, jitter=self.jitter)
        out = {"f*": np.asarray(mean), "f*_var": np.asarray(var)}
        if self.H is not None:
            ym, yc = mo.svgp_predict_y(
                self._param_dict(), W, jnp.asarray(self.H), R,
                jnp.asarray(self._q_mu), jnp.asarray(self._q_sqrt_raw), Z, zm,
                jnp.asarray(coords), kernel=self.kernel, jitter=self.jitter)
            out["y*"] = np.asarray(ym)
            out["y_var"] = np.asarray(np.einsum("npp->np", np.asarray(yc)))
        f_bar = np.atleast_1d(self.obs_mean[0])
        out["f_bar"] = np.broadcast_to(f_bar, (len(coords), len(f_bar))).copy()
        return out
