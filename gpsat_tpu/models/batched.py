"""Batched expert engines — fit + predict for a whole padded bucket of local
experts in one compiled device program.

This is the component that structurally replaces the reference's sequential
per-expert loop (reference: GPSat/local_experts.py:930: build model, scipy
optimise, predict, destroy — once per expert). Here a bucket of B experts with
identical padded shapes is optimised by one vmapped L-BFGS and predicted in one
masked batched posterior evaluation; buckets shard over the device mesh on the
experts axis.
"""

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from gpsat_tpu.models.exact_gpr import (make_gpr_objective,
                                        make_gpr_vg_fun,
                                        move_within_bounds)
from gpsat_tpu.ops import gpr_math
from gpsat_tpu.ops.lbfgs import (_batched_lbfgs_jit,
                                  linesearch_policy)
from gpsat_tpu.ops.packing import pack, unpack
from gpsat_tpu.ops.transforms import Sigmoid, Softplus

__all__ = ["BatchedGPR"]


def _min_valid_size(mask, n_padded):
    """Smallest per-expert VALID (masked) data count in the bucket, for the
    linesearch_policy recovery gate — quantized to the policy breakpoint
    (256) so buckets that share a policy also share a jit trace."""
    if mask is None:
        return int(n_padded)
    n_min = int(np.asarray(mask).sum(axis=1).min())
    return 256 if n_min >= 256 else 128


@partial(jax.jit, static_argnames=("kernel", "free_names", "d", "optimise",
                                   "do_predict", "max_iter", "gtol", "ftol",
                                   "compute_fval", "ls_n"))
def _gpr_fit_predict(u0, X, y, mask, Xs, bijectors, fixed, *, kernel,
                     free_names, d, optimise, do_predict, max_iter, gtol,
                     ftol, compute_fval=True, ls_n=None):
    """One device program: (optional) batched L-BFGS fit + masked batched
    posterior prediction for a [B, N(, P)] bucket."""
    objective, spec = make_gpr_objective(kernel, free_names, d)

    if optimise and free_names:
        # every L-BFGS trial evaluates value_and_grad; route it through the
        # fused Pallas value+gradient kernel when the platform/kernel
        # supports it (kernel build + blocked Cholesky + triangular inverse
        # + analytic gradient reductions in one VMEM-resident program);
        # unsupported configurations fall back to the XLA adjoint path.
        from gpsat_tpu.ops.pallas_gpr import pallas_vg_supported
        vg_fun = make_gpr_vg_fun(kernel, free_names, d) \
            if pallas_vg_supported(kernel, d, X.shape[1]) else None
        # ls_n is the min VALID (masked) size across the bucket, computed by
        # the caller on the host; the padded width is only a fallback for
        # direct unmasked use (linesearch_policy gates the recovery chain on
        # the smallest expert actually present, not the bucket width)
        mls, rec = linesearch_policy(
            X.dtype, "gpr", n=X.shape[1] if ls_n is None else ls_n)
        u, fval, conv, iters = _batched_lbfgs_jit(
            objective, u0, (X, y, mask, bijectors, fixed), max_iter, gtol,
            ftol, 10, mls, "custom", vg_fun=vg_fun, recovery_steps=rec)
    else:
        u = u0
        if compute_fval:
            fval = jax.vmap(lambda ui, xi, yi, mi, bi, fi:
                            objective(ui, xi, yi, mi, bi, fi))(
                u0, X, y, mask, bijectors, fixed)
        else:
            # prediction-fill path: the caller discards fval — skipping the
            # vmapped bordered-Cholesky objective avoids its [B,N,N] HBM
            # temporaries (at N_pad=1024 each is ~4.3 GB on 16 GB v5e)
            fval = jnp.zeros(u0.shape[0], dtype=X.dtype)
        conv = jnp.zeros(u0.shape[0], dtype=bool)
        iters = jnp.zeros(u0.shape[0], dtype=jnp.int32)

    def constrained(ui, bi, fi):
        free = unpack(ui, spec)
        params = dict(fi)
        for n in free_names:
            params[n] = bi[n].forward(free[n])
        return params

    params = jax.vmap(constrained)(u, bijectors, fixed)

    if do_predict:
        # the fused Pallas prediction kernel replaces the XLA batched
        # Cholesky + triangular-solve chain (pure latency on TPU) when the
        # platform/kernel supports it
        from gpsat_tpu.ops.pallas_gpr import (pallas_predict_supported,
                                              posterior_predict_batched)
        if pallas_predict_supported(kernel, d, X.shape[1], Xs.shape[1]):
            preds = posterior_predict_batched(
                params, X, y, mask.astype(X.dtype), Xs, kernel, 0.0)
            preds = {k: jnp.asarray(v, X.dtype) for k, v in preds.items()}
        else:
            preds = jax.vmap(
                lambda p, xi, yi, mi, xsi:
                gpr_math.predict(p, xi, yi, mi, xsi, kernel=kernel))(
                params, X, y, mask, Xs)
    else:
        preds = {}
    return params, fval, conv, iters, preds


class BatchedGPR:
    """Configured batched exact-GPR engine for the scheduler.

    Holds the *shared* per-run configuration (kernel, initial values,
    constraint bijectors, scales); `fit_predict` consumes padded bucket
    arrays. Per-expert initial parameters (e.g. loaded smoothed
    hyperparameters) may override the shared initial values.
    """

    HYPER_NAMES = ("lengthscales", "kernel_variance", "likelihood_variance")
    model_name = "GPRModel"
    linesearch_kind = "gpr"     # ops/lbfgs.linesearch_policy family

    def __init__(self, coords_dim, kernel="Matern32", kernel_kwargs=None,
                 noise_variance=None, likelihood_variance=None,
                 constraints=None, coords_scale=None, optim_kwargs=None,
                 jitter=0.0, dtype=None, **unused):
        self.d = int(coords_dim)
        self.kernel = kernel
        if dtype is None:
            # f64 is host-only: TPUs emulate it ~100x slower. Scaled coords +
            # jitter keep f32 Cholesky well-conditioned on device.
            dtype = jnp.float64 if jax.devices()[0].platform == "cpu"                 else jnp.float32
        self.dtype = dtype if not isinstance(dtype, str) else jnp.dtype(dtype).type
        if jitter == 0.0 and self.dtype == jnp.float32:
            jitter = 1e-6
        kernel_kwargs = dict(kernel_kwargs or {})
        if "smoothness" in kernel_kwargs:
            # GPyTorch-config compatibility (gpytorch_models.py:230):
            # smoothness selects the Matern order of the compiled kernel
            from gpsat_tpu.ops.kernels import kernel_from_smoothness
            self.kernel = kernel = kernel_from_smoothness(
                kernel_kwargs.pop("smoothness"), kernel)

        self.user_set = {
            "lengthscales": "lengthscales" in kernel_kwargs,
            "kernel_variance": "variance" in kernel_kwargs,
            "likelihood_variance": (noise_variance is not None or
                                    likelihood_variance is not None),
        }
        ls = np.asarray(kernel_kwargs.pop("lengthscales", np.ones(self.d)),
                        dtype=float)
        if ls.ndim == 0:
            ls = np.full(self.d, float(ls))
        kv = float(kernel_kwargs.pop("variance", 1.0))
        if likelihood_variance is None:
            likelihood_variance = 1.0 if noise_variance is None else noise_variance
        lv = float(likelihood_variance)
        self.init_values = {"lengthscales": ls, "kernel_variance": kv,
                            "likelihood_variance": lv}
        self.coords_scale = np.atleast_2d(
            1.0 if coords_scale is None else np.asarray(coords_scale, dtype=float))

        optim_kwargs = dict(optim_kwargs or {})
        self.max_iter = int(optim_kwargs.pop("max_iter", 1000))
        self.gtol = float(optim_kwargs.pop("gtol", 1e-6))
        self.ftol = float(optim_kwargs.pop("ftol", 1e-11))
        fixed = optim_kwargs.pop("fixed_params", None) or []
        self.free_names = tuple(n for n in self.HYPER_NAMES if n not in fixed)

        # constraint bijectors (bounds divided by coords_scale for lengthscales
        # when 'scale' is set, mirroring GPSat/local_experts.py:1110-1115)
        self.bijectors = {n: Softplus() for n in self.HYPER_NAMES}
        self.bounds = {}
        constraints = constraints or {}
        for name, c in constraints.items():
            if name not in self.HYPER_NAMES:
                continue
            low = np.atleast_1d(np.asarray(c["low"], dtype=float))
            high = np.atleast_1d(np.asarray(c["high"], dtype=float))
            if name == "lengthscales" and c.get("scale", False):
                low = low / self.coords_scale[0, :]
                high = high / self.coords_scale[0, :]
            if name == "lengthscales":
                self.bijectors[name] = Sigmoid(low=jnp.asarray(low),
                                               high=jnp.asarray(high))
            else:
                self.bijectors[name] = Sigmoid(low=jnp.asarray(low[0]),
                                               high=jnp.asarray(high[0]))
            self.bounds[name] = (low, high)

        self._expert_locs_scaled = None
        # shared initial values moved inside bounds (tol matches the
        # orchestrator call in the reference, GPSat/local_experts.py:1115)
        for name, (low, high) in self.bounds.items():
            cur = move_within_bounds(np.atleast_1d(self.init_values[name]),
                                     low, high, tol=1e-2)
            self.init_values[name] = cur if name == "lengthscales" else float(cur[0])

    @property
    def param_names(self):
        """Parameters reported/stored per expert."""
        return list(self.HYPER_NAMES)

    @property
    def loadable_param_names(self):
        """Parameters that can be re-loaded from result tables."""
        return list(self.HYPER_NAMES)

    def param_shape(self, name):
        return (self.d,) if name == "lengthscales" else ()

    # -- per-bucket execution ------------------------------------------------

    def _initial_params_batch(self, B, overrides=None, y_var=None, scale=1.0,
                              clamp=True):
        """[B]-batched initial parameter dict.

        Initial values resolve in priority order: per-expert `overrides`
        (loaded parameters; NaN = absent) > user-specified config values >
        data-driven defaults (kernel variance ~ per-expert signal variance —
        the batched replacement for the reference's sequential warm-start EMA,
        GPSat/local_experts.py:1200-1217). All clamped into constraint bounds.
        """
        out = {}
        for name in self.HYPER_NAMES:
            shape = self.param_shape(name)
            base = np.broadcast_to(np.asarray(self.init_values[name], dtype=float),
                                   (B,) + shape).copy()
            if y_var is not None and not self.user_set.get(name, True):
                if name == "kernel_variance":
                    base = np.maximum(y_var, 1e-10) * scale
                elif name == "likelihood_variance":
                    base = np.maximum(0.1 * y_var, 1e-10) * scale
                elif name == "lengthscales" and scale != 1.0:
                    base = base * scale
            if overrides and name in overrides and overrides[name] is not None:
                ov = np.asarray(overrides[name], dtype=float).reshape((B,) + shape)
                use = ~np.isnan(ov)
                base[use] = ov[use]
            if clamp and name in self.bounds:
                # move optimisation starts strictly inside the box
                # (reference: GPSat/local_experts.py:1115); skipped when not
                # optimising so loaded parameters are used verbatim
                low, high = self.bounds[name]
                base = move_within_bounds(base, low, high, tol=1e-2)
            out[name] = base
        return out

    def _execute(self, init, X, y, mask, Xs_in, optimise, do_predict):
        from gpsat_tpu.ops.packing import ParamSpec
        B = X.shape[0]
        free = {n: init[n] for n in self.free_names}
        fixed = {n: jnp.asarray(init[n], dtype=self.dtype)
                 for n in self.HYPER_NAMES if n not in self.free_names}
        bij = {n: self.bijectors[n] for n in self.free_names}
        spec = ParamSpec([(n, self.param_shape(n)) for n in self.free_names])
        u0 = jax.vmap(lambda fr: pack({n: bij[n].inverse(fr[n])
                                       for n in self.free_names}, spec))(
            {n: jnp.asarray(v, dtype=self.dtype) for n, v in free.items()})
        # the unbatched bijector bounds may be float64; without this cast the
        # whole L-BFGS program silently promotes to (TPU-emulated) f64
        u0 = u0.astype(self.dtype)
        bij_b = jax.tree.map(
            lambda a: jnp.broadcast_to(jnp.asarray(a, dtype=self.dtype),
                                       (B,) + jnp.asarray(a).shape), bij)
        return self._call_program(u0, X, y, mask, Xs_in, bij_b, fixed,
                                  optimise, do_predict)

    def _call_program(self, u0, X, y, mask, Xs_in, bij_b, fixed, optimise,
                      do_predict, compute_fval=True):
        return _gpr_fit_predict(
            u0, X, y, jnp.asarray(mask), Xs_in, bij_b, fixed,
            kernel=self.kernel, free_names=self.free_names, d=self.d,
            optimise=bool(optimise), do_predict=bool(do_predict),
            max_iter=self.max_iter, gtol=self.gtol, ftol=self.ftol,
            compute_fval=bool(compute_fval),
            ls_n=_min_valid_size(mask, X.shape[1]))

    def _snapshot_state(self):
        """Engine side-state captured before a collapse-restart re-run
        (subclasses carrying per-expert state override)."""
        return None

    def _merge_state(self, state1, use2):
        """Keep run-1 side-state for experts where run 2 was not adopted."""

    def fit_predict(self, X, y, mask, Xs=None, optimise=True, predict=True,
                    param_overrides=None):
        """Fit + predict one padded bucket.

        X: [B, N, D] scaled coords; y: [B, N] de-meaned scaled obs;
        mask: [B, N]; Xs: [B, P, D] scaled prediction coords or None.

        Optimisation is restarted from an alternative initial point for
        experts that collapse into the degenerate zero-signal optimum
        (kernel variance -> 0), keeping the better NLML of the two runs.
        Returns dict of numpy arrays.
        """
        B = X.shape[0]
        mask_np = np.asarray(mask)
        y_np = np.asarray(y)
        cnt = np.maximum(mask_np.sum(axis=1), 1)
        y_mean = (y_np * mask_np).sum(axis=1) / cnt
        y_var = ((y_np - y_mean[:, None]) ** 2 * mask_np).sum(axis=1) / cnt

        Xj = jnp.asarray(X, dtype=self.dtype)
        yj = jnp.asarray(y, dtype=self.dtype)
        do_predict = predict and Xs is not None
        Xs_in = jnp.zeros((B, 1, self.d), dtype=self.dtype) if Xs is None \
            else jnp.asarray(Xs, dtype=self.dtype)

        init = self._initial_params_batch(B, param_overrides, y_var=y_var,
                                          clamp=bool(optimise))
        params, fval, conv, iters, preds = self._execute(
            init, Xj, yj, mask_np, Xs_in, optimise, do_predict)

        if optimise and self.free_names:
            kv = np.asarray(params.get("kernel_variance", np.ones(B)))
            kv_eff = kv.reshape(B, -1).prod(axis=1)   # per-dim variances: product
            active = mask_np.any(axis=1)
            collapsed = active & (
                (kv_eff < np.maximum(1e-4 * y_var, 1e-12)) |
                ~np.isfinite(np.asarray(fval)))
            if collapsed.any():
                state1 = self._snapshot_state()
                alt = self._initial_params_batch(B, param_overrides,
                                                 y_var=y_var, scale=3.0)
                p2, f2, c2, i2, pr2 = self._execute(
                    alt, Xj, yj, mask_np, Xs_in, optimise, do_predict)
                better = np.asarray(f2) < np.asarray(fval)
                use2 = collapsed & better & np.isfinite(np.asarray(f2))
                self._merge_state(state1, use2)
                if use2.any():
                    sel = jnp.asarray(use2)
                    params = jax.tree.map(
                        lambda a, b: jnp.where(
                            sel.reshape((B,) + (1,) * (a.ndim - 1)), b, a),
                        params, p2)
                    fval = jnp.where(sel, f2, fval)
                    conv = jnp.where(sel, c2, conv)
                    iters = jnp.where(sel, i2, iters)
                    if preds:
                        preds = jax.tree.map(
                            lambda a, b: jnp.where(
                                sel.reshape((B,) + (1,) * (a.ndim - 1)), b, a),
                            preds, pr2)

        return {
            "params": {k: np.asarray(v) for k, v in params.items()},
            "objective": np.asarray(fval),
            "converged": np.asarray(conv),
            "iterations": np.asarray(iters),
            "preds": {k: np.asarray(v) for k, v in preds.items()},
        }

    # -- pooled multi-chunk execution ---------------------------------------

    def _chunked_fit_predict(self, X, y, mask, Xs, optimise, predict,
                             param_overrides, B, mesh=None):
        """Generic fallback: sequential fit_predict over B-sized chunks.
        Under a mesh, chunk inputs are sharded over the experts axis so XLA
        auto-partitions the vmapped programs (B is then the whole-mesh chunk
        width and must stay a mesh multiple; ragged tails are not sharded)."""
        from gpsat_tpu.parallel.mesh import shard_experts
        E = X.shape[0]
        n_sh = int(mesh.size) if mesh is not None else 1
        outs = []
        el_all = self._expert_locs_scaled
        X_np, y_np, m_np = np.asarray(X), np.asarray(y), np.asarray(mask)
        Xs_np = None if Xs is None else np.asarray(Xs)
        for s in range(0, E, B):
            e = min(s + B, E)
            if el_all is not None:
                self._expert_locs_scaled = el_all[s:e]
            ov = None if param_overrides is None else \
                {k: v[s:e] for k, v in param_overrides.items()}
            chunk = (X_np[s:e], y_np[s:e], m_np[s:e],
                     None if Xs_np is None else Xs_np[s:e])
            if mesh is not None and (e - s) % n_sh == 0:
                Xc, yc, mc = shard_experts(chunk[:3], mesh)
                Xsc = None if chunk[3] is None else \
                    shard_experts((chunk[3],), mesh)[0]
                chunk = (Xc, yc, mc, Xsc)
            outs.append(self.fit_predict(chunk[0], chunk[1], chunk[2],
                                         Xs=chunk[3],
                                         optimise=optimise, predict=predict,
                                         param_overrides=ov))
        self._expert_locs_scaled = el_all
        cat = lambda key: np.concatenate([o[key] for o in outs], axis=0)
        out = {
            "params": {k: np.concatenate([o["params"][k] for o in outs])
                       for k in outs[0]["params"]},
            "objective": cat("objective"),
            "converged": cat("converged"),
            "iterations": cat("iterations"),
            "preds": {k: np.concatenate([o["preds"][k] for o in outs])
                      for k in outs[0]["preds"]},
        }
        for k in set(outs[0]) - set(out):   # engine extras (inducing_mask, …)
            out[k] = cat(k)
        return out

    # -- pool hooks (engines that support pooled L-BFGS override) -----------

    def _pool_supported(self, optimise):
        """Whether this engine can run the device-resident L-BFGS pool."""
        return type(self) is BatchedGPR and optimise and bool(self.free_names)

    def _pool_objective(self, N=None):
        """(objective, vg_fun) over (u, X, y, mask, *extra, bij, fixed)."""
        from gpsat_tpu.ops.pallas_gpr import pallas_vg_supported
        objective, _ = make_gpr_objective(self.kernel, self.free_names,
                                          self.d)
        vg_fun = make_gpr_vg_fun(self.kernel, self.free_names, self.d) \
            if pallas_vg_supported(self.kernel, self.d, N) else None
        return objective, vg_fun

    def _pool_extra_args(self, X, mask, param_overrides):
        """Engine-specific per-expert arrays inserted between mask and the
        bijectors in the objective args (e.g. SGPR inducing points)."""
        return ()

    def _fill_chunk_width(self, E, X, Xs, B_pool, do_predict):
        """Chunk width for the post-pool prediction/param-fill loop.

        Default: the pool slot width (the XLA prediction path holds [B,N,N]
        HBM temporaries). When the fused Pallas GPR prediction kernel is
        active its VMEM grid removes that constraint — one whole-sweep call
        replaces ~E/B dispatches (the fill phase is dispatch-bound, not
        compute-bound). Canonical power-of-two widths so one program shape
        covers every E (a data-dependent min(E, 1024) costs a 5-10 min
        remote compile per distinct sweep size)."""
        if do_predict and type(self) is BatchedGPR:
            from gpsat_tpu.ops.pallas_gpr import pallas_predict_supported
            from gpsat_tpu.parallel.scheduler import bucket_level
            if pallas_predict_supported(self.kernel, self.d, X.shape[1],
                                        np.asarray(Xs).shape[1]):
                return min(1024, bucket_level(E))
        return B_pool

    def _pool_select_chunk(self, ids):
        """Point per-expert engine state at rows `ids` before _call_program
        in the prediction-fill loop (default: stateless)."""

    def _pool_finalize(self, out):
        """Engine-specific output decoration (e.g. objective sign flip)."""
        return out

    def _pool_optimize(self, init, X, y, mask, slots, extra=(), mesh=None):
        """Pooled L-BFGS over E same-shape experts (see
        ops/lbfgs.batched_lbfgs_pool). Returns (u [E,P], f, conv, iters)."""
        from gpsat_tpu.ops.lbfgs import batched_lbfgs_pool
        from gpsat_tpu.ops.packing import ParamSpec

        E = X.shape[0]
        free = {n: jnp.asarray(init[n], dtype=self.dtype)
                for n in self.free_names}
        fixed = {n: jnp.asarray(init[n], dtype=self.dtype)
                 for n in self.HYPER_NAMES if n not in self.free_names}
        bij = {n: self.bijectors[n] for n in self.free_names}
        spec = ParamSpec([(n, self.param_shape(n)) for n in self.free_names])
        u0 = jax.vmap(lambda fr: pack({n: bij[n].inverse(fr[n])
                                       for n in self.free_names}, spec))(free)
        u0 = np.asarray(u0.astype(self.dtype))
        bij_b = jax.tree.map(
            lambda a: np.broadcast_to(np.asarray(a, dtype=self.dtype),
                                      (E,) + np.asarray(a).shape), bij)
        objective, vg_fun = self._pool_objective(N=X.shape[1])
        mls, rec = linesearch_policy(self.dtype, self.linesearch_kind,
                                     n=_min_valid_size(mask, X.shape[1]))
        res = batched_lbfgs_pool(
            objective, u0,
            (np.asarray(X, dtype=self.dtype), np.asarray(y, dtype=self.dtype),
             np.asarray(mask)) + tuple(extra) + (bij_b, fixed),
            slots=slots, max_iter=self.max_iter,
            gtol=self.gtol, ftol=self.ftol, vg_fun=vg_fun, mesh=mesh,
            max_linesearch_steps=mls, recovery_steps=rec)
        self._last_pool_iterations = int(res.pool_iterations)
        return (np.asarray(res.x), np.asarray(res.fun),
                np.asarray(res.converged), np.asarray(res.iterations))

    def _constrained_np(self, u):
        """[E, P] unconstrained -> parameter dict of numpy arrays."""
        from gpsat_tpu.ops.packing import ParamSpec
        spec = ParamSpec([(n, self.param_shape(n)) for n in self.free_names])
        free = jax.vmap(lambda ui: unpack(ui, spec))(jnp.asarray(u))
        return {n: np.asarray(self.bijectors[n].forward(free[n]))
                for n in self.free_names}

    def fit_predict_many(self, X, y, mask, Xs=None, optimise=True,
                         predict=True, param_overrides=None, slots=None,
                         mesh=None):
        """Sweep E same-padded-shape experts.

        Engines whose optimiser is L-BFGS (exact GPR; SGPR with fixed
        inducing points) run the device-resident *pool*
        (ops/lbfgs.batched_lbfgs_pool): a `slots`-wide batch whose slots
        refill from the expert queue the moment they converge, so the batch
        never waits for its slowest expert (measured iteration skew median
        20 / max ~45 -> 1.85x ideal compaction). Other engines / configs
        fall back to chunked fit_predict.

        With `mesh`, experts shard over the mesh axis: the pool runs one
        independent slot pool per device (`slots` is the per-device width),
        and the chunked fallback shards each chunk for XLA auto-partitioning.
        """
        from gpsat_tpu.parallel.scheduler import auto_batch_size
        E, N = X.shape[0], X.shape[1]
        P = 0 if Xs is None else Xs.shape[1]
        n_sh = int(mesh.size) if mesh is not None else 1
        B = int(slots or min(E, auto_batch_size(N, P)))
        if not self._pool_supported(optimise) or E <= B * n_sh:
            return self._chunked_fit_predict(X, y, mask, Xs, optimise,
                                             predict, param_overrides,
                                             min(B * n_sh, E), mesh=mesh)

        mask_np = np.asarray(mask)
        y_np = np.asarray(y)
        cnt = np.maximum(mask_np.sum(axis=1), 1)
        y_mean = (y_np * mask_np).sum(axis=1) / cnt
        y_var = ((y_np - y_mean[:, None]) ** 2 * mask_np).sum(axis=1) / cnt

        extra = self._pool_extra_args(X, mask_np, param_overrides)
        init = self._initial_params_batch(E, param_overrides, y_var=y_var,
                                          clamp=True)
        u, fval, conv, iters = self._pool_optimize(init, X, y, mask_np, B,
                                                   extra=extra, mesh=mesh)

        # collapse-restart (same policy as fit_predict) on the failed subset,
        # padded to the slot width so no new program shape compiles
        params = self._constrained_np(u)
        kv = params.get("kernel_variance", np.ones(E))
        kv_eff = kv.reshape(E, -1).prod(axis=1)
        active = mask_np.any(axis=1)
        collapsed = active & ((kv_eff < np.maximum(1e-4 * y_var, 1e-12)) |
                              ~np.isfinite(fval))
        if collapsed.any():
            ids = np.flatnonzero(collapsed)
            pad_ids = np.concatenate(
                [ids, np.full(max(B - len(ids), 0), ids[-1])])[:max(B, len(ids))]
            alt = self._initial_params_batch(E, param_overrides, y_var=y_var,
                                             scale=3.0)
            alt_rows = {k: np.asarray(v)[pad_ids] for k, v in alt.items()}
            u2, f2, c2, i2 = self._pool_optimize(
                alt_rows, np.asarray(X)[pad_ids], y_np[pad_ids],
                mask_np[pad_ids], B,
                extra=tuple(np.asarray(a)[pad_ids] for a in extra),
                mesh=mesh)
            take = np.zeros(E, bool)
            for row, ei in enumerate(ids):
                if np.isfinite(f2[row]) and f2[row] < fval[ei]:
                    u[ei] = u2[row]
                    fval[ei] = f2[row]
                    conv[ei] = c2[row]
                    iters[ei] = i2[row]
                    take[ei] = True
            if take.any():
                params = self._constrained_np(u)

        # predictions + fixed-param fill via the existing (optimise=False)
        # program. Chunk width: the slot width when the XLA prediction path
        # (with its [B,N,N] HBM temporaries) will run, but when the fused
        # Pallas prediction kernel is active, its VMEM grid removes that
        # constraint — one whole-sweep call replaces ~E/B dispatches (the
        # prediction phase is dispatch-bound, not compute-bound)
        out_params = {n: np.empty((E,) + self.param_shape(n)) for n in
                      self.HYPER_NAMES}
        preds_out = None
        do_predict = predict and Xs is not None
        B = self._fill_chunk_width(E, X, Xs, B, do_predict)
        if mesh is not None and B >= n_sh:
            B = B - B % n_sh
        # shard fill chunks over the mesh so the prediction/fill programs
        # auto-partition like the chunked path
        _shard = None
        if mesh is not None and B % n_sh == 0:
            from jax.sharding import NamedSharding, PartitionSpec
            _shard = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))

        def _place(a):
            return jax.device_put(a, _shard) if _shard is not None else a
        bij_chunk = jax.tree.map(
            lambda a: jnp.broadcast_to(jnp.asarray(a, dtype=self.dtype),
                                       (B,) + jnp.asarray(a).shape),
            {n: self.bijectors[n] for n in self.free_names})
        X_np = np.asarray(X)
        Xs_np = None if Xs is None else np.asarray(Xs)
        # dispatch every chunk first (jax dispatch is async) and materialise
        # afterwards: an np.asarray inside the loop blocks on each chunk's
        # result, paying the full device+tunnel latency per chunk instead of
        # pipelining the whole sweep
        pending = []
        for s in range(0, E, B):
            ids = np.arange(s, min(s + B, E))
            pad = np.concatenate([ids, np.full(B - len(ids), ids[-1])]) \
                if len(ids) < B else ids
            Xs_in = jnp.zeros((B, 1, self.d), dtype=self.dtype) if Xs is None \
                else _place(jnp.asarray(Xs_np[pad], dtype=self.dtype))
            fixed_chunk = {n: jnp.asarray(np.asarray(init[n])[pad],
                                          dtype=self.dtype)
                           for n in self.HYPER_NAMES
                           if n not in self.free_names}
            self._pool_select_chunk(pad)
            p_chunk, _, _, _, pr = self._call_program(
                _place(jnp.asarray(u[pad], dtype=self.dtype)),
                _place(jnp.asarray(X_np[pad], dtype=self.dtype)),
                _place(jnp.asarray(y_np[pad], dtype=self.dtype)),
                mask_np[pad],
                Xs_in, bij_chunk, fixed_chunk, False, do_predict,
                compute_fval=False)
            pending.append((ids, p_chunk, pr))

        for ids, p_chunk, pr in pending:
            for n in self.HYPER_NAMES:
                out_params[n][ids] = np.asarray(p_chunk[n])[:len(ids)]
            if do_predict:
                if preds_out is None:
                    preds_out = {k: np.empty((E,) + np.asarray(v).shape[1:])
                                 for k, v in pr.items()}
                for k, v in pr.items():
                    preds_out[k][ids] = np.asarray(v)[:len(ids)]

        return self._pool_finalize({
            "params": out_params,
            "objective": fval,
            "converged": conv,
            "iterations": iters,
            "preds": preds_out or {},
        })


# ---------------------------------------------------------------------------
# SGPR (Titsias) batched engine
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def make_sgpr_objective(kernel, free_names, d, jitter):
    """Collapsed negative-ELBO objective over the flat unconstrained hyper
    vector, fixed inducing points; args (X, y, mask, Z, zmask, bij, fixed).
    lru_cache gives the pooled path one stable callable (no retraces)."""
    from gpsat_tpu.ops import sgpr as sgpr_math
    from gpsat_tpu.ops.packing import ParamSpec

    shapes = {"lengthscales": (d,), "kernel_variance": (),
              "likelihood_variance": ()}
    spec = ParamSpec([(n, shapes[n]) for n in free_names])

    def objective(u, X, y, mask, Z, zmask, bijectors, fixed):
        free = unpack(u, spec)
        params = dict(fixed)
        for n in free_names:
            params[n] = bijectors[n].forward(free[n])
        return sgpr_math.neg_elbo(params, X, y, mask, Z, zmask,
                                  kernel=kernel, jitter=jitter)

    return objective


@lru_cache(maxsize=None)
def make_sgpr_vg_fun(kernel, free_names, d, jitter):
    """Batch-level value_and_grad of the collapsed negative ELBO through the
    fused Pallas SGPR kernel (ops/pallas_sgpr.sgpr_vg_batched): kernel-matrix
    builds, both Choleskys, the triangular solves and the analytic adjoint
    reductions run in one VMEM-resident program. The chain rule through the
    constraint bijectors runs in XLA via a vjp of the elementwise
    unconstrained->parameter map (cf. make_gpr_vg_fun)."""
    from gpsat_tpu.ops.packing import ParamSpec
    from gpsat_tpu.ops.pallas_sgpr import sgpr_vg_batched

    shapes = {"lengthscales": (d,), "kernel_variance": (),
              "likelihood_variance": ()}
    spec = ParamSpec([(n, shapes[n]) for n in free_names])
    all_names = ("lengthscales", "kernel_variance", "likelihood_variance")

    def vg_fun(u, X, y, mask, Z, zmask, bijectors, fixed):
        def to_params(u_all):
            def one(ui, bi, fi):
                free = unpack(ui, spec)
                params = dict(fi)
                for n in free_names:
                    params[n] = bi[n].forward(free[n])
                return params
            return jax.vmap(one)(u_all, bijectors, fixed)

        params, pullback = jax.vjp(to_params, u)
        val, gparams = sgpr_vg_batched(params, X, y, mask.astype(X.dtype),
                                       Z, zmask.astype(X.dtype), kernel,
                                       jitter)
        cot = {n: jnp.asarray(gparams[n], jnp.result_type(params[n])).reshape(
            jnp.shape(params[n])) for n in all_names}
        (gu,) = pullback(cot)
        return jnp.asarray(val, u.dtype), gu

    return vg_fun


@partial(jax.jit, static_argnames=("kernel", "free_names", "d", "optimise",
                                   "do_predict", "max_iter", "gtol", "ftol",
                                   "jitter", "train_z", "compute_fval"))
def _sgpr_fit_predict(u0, X, y, mask, Z, zmask, Xs, bijectors, fixed, *,
                      kernel, free_names, d, optimise, do_predict, max_iter,
                      gtol, ftol, jitter, train_z=False, compute_fval=True):
    """Batched SGPR: L-BFGS on the collapsed negative ELBO + posterior.

    train_z packs the inducing locations [M, d] into the L-BFGS vector
    (identity transform; padded rows have zero gradient and never move) —
    the reference's train_inducing_points=True
    (GPSat/models/gpflow_models.py:864-877)."""
    from gpsat_tpu.ops import sgpr as sgpr_math
    from gpsat_tpu.ops.packing import ParamSpec

    M = Z.shape[1]
    shapes = {"lengthscales": (d,), "kernel_variance": (),
              "likelihood_variance": (), "inducing_points": (M, d)}
    opt_names = tuple(free_names) + (("inducing_points",) if train_z else ())
    spec = ParamSpec([(n, shapes[n]) for n in opt_names])

    def z_of(free, Z):
        return free["inducing_points"] if train_z else Z

    def objective(u, X, y, mask, Z, zmask, bijectors, fixed):
        free = unpack(u, spec)
        params = dict(fixed)
        for n in free_names:
            params[n] = bijectors[n].forward(free[n])
        return sgpr_math.neg_elbo(params, X, y, mask, z_of(free, Z), zmask,
                                  kernel=kernel, jitter=jitter)

    if optimise and opt_names:
        # fixed-Z runs evaluate every L-BFGS trial through the fused Pallas
        # SGPR value+gradient kernel when supported (trainable-Z packs Z into
        # u, which the fused kernel does not cover)
        from gpsat_tpu.ops.pallas_sgpr import pallas_sgpr_vg_supported
        vg_fun = make_sgpr_vg_fun(kernel, free_names, d, jitter) \
            if (not train_z and pallas_sgpr_vg_supported(
                kernel, d, X.shape[1], M)) else None
        mls, rec = linesearch_policy(X.dtype, "sgpr")
        u, fval, conv, iters = _batched_lbfgs_jit(
            objective, u0, (X, y, mask, Z, zmask, bijectors, fixed),
            max_iter, gtol, ftol, 10, mls, "custom", vg_fun=vg_fun,
            recovery_steps=rec)
    else:
        u = u0
        if compute_fval:
            fval = jax.vmap(objective)(u0, X, y, mask, Z, zmask, bijectors,
                                       fixed)
        else:
            fval = jnp.zeros(u0.shape[0], dtype=X.dtype)
        conv = jnp.zeros(u0.shape[0], dtype=bool)
        iters = jnp.zeros(u0.shape[0], dtype=jnp.int32)

    def constrained(ui, bi, fi):
        free = unpack(ui, spec)
        params = dict(fi)
        for n in free_names:
            params[n] = bi[n].forward(free[n])
        return params

    params = jax.vmap(constrained)(u, bijectors, fixed)
    if train_z:
        Z = jax.vmap(lambda ui: unpack(ui, spec)["inducing_points"])(u)
        Z = jnp.where(zmask[:, :, None], Z, 0.0)

    if do_predict:
        # hybrid batched posterior (cholinv kernel + XLA matmuls, with
        # escalating-jitter recovery for near-singular Kuu at converged
        # long-lengthscale optima) when supported; XLA per-expert fallback
        # otherwise (CPU f64 path)
        from gpsat_tpu.ops.pallas_sgpr import (pallas_sgpr_vg_supported,
                                               sgpr_predict_batched)
        if pallas_sgpr_vg_supported(kernel, d, X.shape[1], M):
            mf = jnp.asarray(mask, X.dtype)
            zmf = jnp.asarray(zmask, X.dtype)
            preds = sgpr_predict_batched(params, X, y, mf, Z, zmf, Xs,
                                         kernel, jitter)
            preds = {k: jnp.asarray(v, X.dtype) for k, v in preds.items()}
        else:
            preds = jax.vmap(
                lambda p, xi, yi, mi, zi, zmi, xsi: sgpr_math.predict(
                    p, xi, yi, mi, zi, zmi, xsi, kernel=kernel,
                    jitter=jitter))(
                params, X, y, mask, Z, zmask, Xs)
    else:
        preds = {}
    return params, fval, conv, iters, preds, Z


class BatchedSGPR(BatchedGPR):
    """Batched Titsias SGPR engine (reference model: GPflowSGPRModel,
    GPSat/models/gpflow_models.py:666; the production model of the IS2 runs).

    Inducing points are a seeded random subset of each expert's (scaled)
    inputs, fixed during optimisation (the reference default,
    gpflow_models.py:864 train_inducing_points=False). Note: the objective
    value reported is the *negative* ELBO from the optimiser; the orchestrator
    flips sign so the stored objective_value is the ELBO, matching the
    reference's SGPR get_objective_function_value.
    """

    model_name = "SGPRModel"
    objective_sign = -1.0   # stored objective = -neg_elbo = elbo
    linesearch_kind = "sgpr"

    def __init__(self, coords_dim, num_inducing_points=500, inducing_seed=42,
                 jitter=None, **kwargs):
        from gpsat_tpu.ops import sgpr as sgpr_math
        optim_kwargs = dict(kwargs.pop("optim_kwargs", None) or {})
        if not hasattr(self, "train_inducing_points"):
            self.train_inducing_points = bool(optim_kwargs.pop(
                "train_inducing_points", False))
        else:
            optim_kwargs.pop("train_inducing_points", None)
        super().__init__(coords_dim,
                         jitter=sgpr_math.DEFAULT_JITTER if jitter is None else jitter,
                         optim_kwargs=optim_kwargs, **kwargs)
        self.num_inducing = int(num_inducing_points)
        self.inducing_seed = int(inducing_seed)
        self.jitter = float(sgpr_math.DEFAULT_JITTER if jitter is None else jitter)
        self._Z = None
        self._zmask = None

    @property
    def param_names(self):
        return list(self.HYPER_NAMES) + ["inducing_points"]

    @property
    def loadable_param_names(self):
        """Hyperparameters + per-expert inducing locations are re-loadable
        from result tables (reference load_params reads every param table,
        GPSat/local_experts.py:609-689). Missing/NaN rows fall back to the
        seeded re-selection; stored padded rows are zeros, which is only
        exact when the reload uses the same local data (the smoothed
        re-prediction case)."""
        return list(self.HYPER_NAMES) + ["inducing_points"]

    def param_shape(self, name):
        if name == "inducing_points":
            return (self.num_inducing, self.d)
        return super().param_shape(name)

    def _build_inducing(self, X, mask):
        """Seeded random-subset inducing points per expert, padded + masked."""
        X = np.asarray(X)
        mask = np.asarray(mask)
        B, N, d = X.shape
        M = min(self.num_inducing, N)
        Z = np.zeros((B, M, d))
        zmask = np.zeros((B, M), dtype=bool)
        rng = np.random.default_rng(self.inducing_seed)
        for b in range(B):
            valid = np.where(mask[b])[0]
            if len(valid) == 0:
                continue
            if len(valid) <= M:
                sel = valid
            else:
                sel = valid[rng.permutation(len(valid))[:M]]
            Z[b, :len(sel)] = X[b, sel]
            zmask[b, :len(sel)] = True
        return Z, zmask

    def fit_predict(self, X, y, mask, Xs=None, optimise=True, predict=True,
                    param_overrides=None):
        self._Z, self._zmask = self._build_inducing(X, mask)
        self._apply_inducing_override(param_overrides)
        out = super().fit_predict(X, y, mask, Xs=Xs, optimise=optimise,
                                  predict=predict,
                                  param_overrides=param_overrides)
        # report the ELBO (positive) and expose the inducing points
        out["objective"] = -out["objective"]
        Z_out = getattr(self, "_Z_final", self._Z)
        out["params"]["inducing_points"] = Z_out * (
            self._zmask[:, :, None])  # zero padded rows for storage
        out["inducing_mask"] = self._zmask
        return out

    def _apply_inducing_override(self, param_overrides):
        """Adopt loaded inducing locations row-wise: a loaded row replaces the
        seeded one when it is finite and the slot is valid (zmask). NaN rows
        (expert missing from the table, or stored M < configured M) keep the
        seeded selection — matching the reference's NaN-skip on param load
        (GPSat/local_experts.py:669-679)."""
        if not (param_overrides and
                param_overrides.get("inducing_points") is not None):
            return
        ov = np.asarray(param_overrides["inducing_points"], dtype=float)
        ov = ov.reshape(len(self._Z), -1, self.d)
        k = min(self._Z.shape[1], ov.shape[1])
        adopt = (~np.isnan(ov[:, :k]).any(axis=2)) & self._zmask[:, :k]
        self._Z[:, :k][adopt] = ov[:, :k][adopt]

    def _snapshot_state(self):
        return {"Z": getattr(self, "_Z_final", None)}

    def _merge_state(self, state1, use2):
        if state1 and state1.get("Z") is not None:
            keep1 = ~use2
            self._Z_final[keep1] = state1["Z"][keep1]

    def _call_program(self, u0, X, y, mask, Xs_in, bij_b, fixed, optimise,
                      do_predict, compute_fval=True):
        train_z = bool(self.train_inducing_points) and bool(optimise)
        if train_z:
            Zf = jnp.asarray(self._Z, dtype=self.dtype).reshape(u0.shape[0], -1)
            u0 = jnp.concatenate([u0, Zf], axis=1)
        params, fval, conv, iters, preds, Z = _sgpr_fit_predict(
            u0, X, y, jnp.asarray(mask), jnp.asarray(self._Z, dtype=self.dtype),
            jnp.asarray(self._zmask), Xs_in, bij_b, fixed,
            kernel=self.kernel, free_names=self.free_names, d=self.d,
            optimise=bool(optimise), do_predict=bool(do_predict),
            max_iter=self.max_iter, gtol=self.gtol, ftol=self.ftol,
            jitter=self.jitter, train_z=train_z,
            compute_fval=bool(compute_fval))
        self._Z_final = np.array(Z)
        return params, fval, conv, iters, preds

    # -- pooled execution hooks ----------------------------------------------

    def _pool_supported(self, optimise):
        """Pooled L-BFGS with *fixed* inducing points (the reference default,
        GPSat/models/gpflow_models.py:864 train_inducing_points=False);
        trainable-Z runs fall back to chunked one-shot batches."""
        return (type(self) is BatchedSGPR and optimise
                and bool(self.free_names) and not self.train_inducing_points)

    def _pool_objective(self, N=None):
        from gpsat_tpu.ops.pallas_sgpr import pallas_sgpr_vg_supported
        vg_fun = make_sgpr_vg_fun(self.kernel, self.free_names, self.d,
                                  self.jitter) \
            if pallas_sgpr_vg_supported(self.kernel, self.d, N,
                                        self.num_inducing) else None
        return make_sgpr_objective(self.kernel, self.free_names, self.d,
                                   self.jitter), vg_fun

    def _pool_extra_args(self, X, mask, param_overrides):
        self._Z, self._zmask = self._build_inducing(X, mask)
        self._apply_inducing_override(param_overrides)
        self._Z_all, self._zmask_all = self._Z, self._zmask
        return (np.asarray(self._Z, dtype=self.dtype), self._zmask)

    def _pool_select_chunk(self, ids):
        self._Z = self._Z_all[ids]
        self._zmask = self._zmask_all[ids]

    def _pool_finalize(self, out):
        self._Z, self._zmask = self._Z_all, self._zmask_all
        out["objective"] = -out["objective"]   # stored objective = ELBO
        out["params"]["inducing_points"] = \
            self._Z_all * self._zmask_all[:, :, None]
        out["inducing_mask"] = self._zmask_all
        return out

    def _fill_chunk_width(self, E, X, Xs, B_pool, do_predict):
        """Hybrid SGPR prediction has no [B,N,N] temporaries — its dominant
        buffers are [B, M_pad, N] (Kuf/At and their r2 builds), so the fill
        can run far wider chunks than the pool (fewer cholinv grid
        dispatches + pipeline bubbles; predict is the cholinv passes, see
        sgpr_predict_batched). Width = canonical bucket of E capped by a
        ~2 GB live-buffer budget, floored to a multiple of 16 so slot
        batches tile the cholinv kernel's expert groups exactly."""
        from gpsat_tpu.ops.pallas_sgpr import pallas_sgpr_vg_supported
        if not (do_predict and type(self) is BatchedSGPR
                and pallas_sgpr_vg_supported(self.kernel, self.d,
                                             X.shape[1], self.num_inducing)):
            return B_pool
        from gpsat_tpu.parallel.scheduler import bucket_level
        M_pad = -(-self.num_inducing // 128) * 128
        cap = max(16, 2**27 // max(M_pad * X.shape[1], 1))
        B = min(bucket_level(E), cap - cap % 16)
        return max(B, B_pool)


# ---------------------------------------------------------------------------
# SVGP batched engine: Adam with per-expert plateau early stop
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("kernel", "free_names", "d", "optimise",
                                   "do_predict", "max_iter", "lr",
                                   "check_every", "persistence", "jitter",
                                   "early_stop", "natural_gradients", "gamma",
                                   "train_z", "train_qm", "train_qs", "mb",
                                   "reshuffle", "mb_seed"))
def _svgp_fit_predict(u0, qm0, qs0, X, y, mask, Z, zmask, Xs, perm, bijectors,
                      fixed, *, kernel, free_names, d, optimise, do_predict,
                      max_iter, lr, check_every, persistence, jitter,
                      early_stop, natural_gradients, gamma, train_z, train_qm,
                      train_qs, mb, reshuffle=False, mb_seed=0):
    """Batched SVGP: Adam on (hypers[, Z], q_mu, q_sqrt) with per-expert early
    stopping, then posterior prediction. Loop at batch level (see lbfgs.py
    design note).

    Reference semantics (GPSat/models/gpflow_models.py:1117-1245):
    - natural_gradients: a NaturalGradient step (step length `gamma`) on
      (q_mu, q_sqrt) precedes each Adam step, and the variational pair is
      removed from the Adam variables.
    - train_z: inducing locations join the Adam variables
      (train_inducing_points=True).
    - mb > 0: per-iteration minibatch of mb points per expert (a wrapped
      window over `perm`, a per-expert shuffled index cycle), data term
      scaled by N_valid / mb.
    """
    import optax
    from gpsat_tpu.ops import svgp as svgp_math
    from gpsat_tpu.ops.packing import ParamSpec

    B, N = X.shape[:2]
    shapes = {"lengthscales": (d,), "kernel_variance": (),
              "likelihood_variance": ()}
    spec = ParamSpec([(n, shapes[n]) for n in free_names])
    n_valid = jnp.sum(mask.astype(X.dtype), axis=1)        # [B]

    def constrained(ui, bi, fi):
        free = unpack(ui, spec)
        params = dict(fi)
        for n in free_names:
            params[n] = bi[n].forward(free[n])
        return params

    def batch_at(it):
        """Minibatch view for iteration `it` (full data when mb == 0)."""
        if mb == 0:
            return X, y, mask, 1.0
        start = (it * mb) % N
        if reshuffle:
            # per-epoch seeded reshuffle (reference semantics: the tf.data
            # pipeline reshuffles every pass, gpflow_models.py:1073
            # shuffle(N).repeat()). Valid indices sort first under a fresh
            # per-epoch random key; window positions wrap within each
            # expert's valid count (the same tiling the fixed cycle uses),
            # so every window is all-valid even for ragged experts.
            epoch = (it * mb) // N
            key = jax.random.fold_in(jax.random.PRNGKey(mb_seed), epoch)
            r = jax.random.uniform(key, (B, N), dtype=X.dtype)
            r = jnp.where(mask, r, jnp.asarray(2.0, dtype=X.dtype))
            ordr = jnp.argsort(r, axis=1).astype(jnp.int32)
            nv = jnp.maximum(jnp.sum(mask, axis=1), 1).astype(jnp.int32)
            pos = (start + jnp.arange(mb, dtype=jnp.int32))[None, :] \
                % nv[:, None]                                  # [B, mb]
            idx = jnp.take_along_axis(ordr, pos, axis=1)
        else:
            idx = jax.lax.dynamic_slice_in_dim(perm, start, mb, axis=1)  # [B, mb]
        Xb = jnp.take_along_axis(X, idx[:, :, None], axis=1)
        yb = jnp.take_along_axis(y, idx, axis=1)
        mbk = jnp.take_along_axis(mask, idx, axis=1)
        mb_valid = jnp.maximum(jnp.sum(mbk.astype(X.dtype), axis=1), 1.0)
        scale = n_valid / mb_valid                         # [B]
        return Xb, yb, mbk, scale

    def per_elbo(theta, Xb, yb, mbk, scale):
        z_eff = theta["z"] if train_z else jax.lax.stop_gradient(theta["z"])
        qm_eff = theta["qm"] if train_qm else jax.lax.stop_gradient(theta["qm"])
        qs_eff = theta["qs"] if train_qs else jax.lax.stop_gradient(theta["qs"])
        sc = jnp.broadcast_to(jnp.asarray(scale, dtype=X.dtype), (B,))

        def one(ui, qmi, qsi, xi, yi, mi, zi, zmi, bi, fi, sci):
            p = constrained(ui, bi, fi)
            return svgp_math.elbo(p, qmi, qsi, xi, yi, mi, zi, zmi,
                                  kernel=kernel, jitter=jitter, scale=sci)
        return jax.vmap(one)(theta["u"], qm_eff, qs_eff, Xb, yb, mbk,
                             z_eff, zmask, bijectors, fixed, sc)

    theta0 = {"u": u0, "qm": qm0, "qs": qs0, "z": Z}

    if optimise:
        opt = optax.adam(lr)
        state0 = opt.init(theta0)

        def body(c):
            it, theta, state, done, best, cnt, last = c
            Xb, yb, mbk, scale = batch_at(it)

            if natural_gradients:
                # natgrad on (q_mu, q_sqrt) precedes the Adam step
                # (reference: gpflow_models.py:1204-1214 optimisation_step)
                params_now = jax.vmap(constrained)(theta["u"], bijectors,
                                                   fixed)
                sc = jnp.broadcast_to(jnp.asarray(scale, dtype=X.dtype), (B,))
                qm_n, qs_n = jax.vmap(
                    lambda p, qmi, qsi, xi, yi, mi, zi, zmi, sci:
                    svgp_math.natgrad_step(p, qmi, qsi, xi, yi, mi, zi, zmi,
                                           gamma, kernel=kernel, jitter=jitter,
                                           scale=sci))(
                    params_now, theta["qm"], theta["qs"], Xb, yb, mbk,
                    theta["z"], zmask, sc)
                keep = done | ~(jnp.isfinite(qm_n).all(axis=-1) &
                                jnp.isfinite(qs_n).all(axis=(-2, -1)))
                if train_qm:
                    theta["qm"] = jnp.where(keep[:, None], theta["qm"], qm_n)
                if train_qs:
                    theta["qs"] = jnp.where(keep[:, None, None], theta["qs"],
                                            qs_n)

            vals = per_elbo(theta, Xb, yb, mbk, scale)
            g = jax.grad(lambda t: -jnp.sum(per_elbo(t, Xb, yb, mbk,
                                                     scale)))(theta)
            if natural_gradients:
                # variational pair is natgrad-managed, not Adam-managed
                g["qm"] = jnp.zeros_like(g["qm"])
                g["qs"] = jnp.zeros_like(g["qs"])
            # padded inducing rows never move
            g["z"] = g["z"] * zmask[:, :, None]
            # freeze finished experts: zero their gradients
            g = jax.tree.map(
                lambda a: jnp.where(done.reshape((B,) + (1,) * (a.ndim - 1)),
                                    0.0, a), g)
            updates, state = opt.update(g, state)
            theta = optax.apply_updates(theta, updates)

            is_check = (it % check_every) == 0
            nan_fail = ~jnp.isfinite(vals)
            improved = vals > best
            best = jnp.where(is_check & improved & ~done, vals, best)
            cnt = jnp.where(is_check,
                            jnp.where(improved | done, cnt * 0,
                                      cnt + check_every), cnt)
            plateau = cnt >= persistence
            newly = (~done) & is_check & (nan_fail | (plateau & early_stop))
            done = done | newly
            return it + 1, theta, state, done, best, cnt, vals

        def cond(c):
            it, theta, state, done, best, cnt, last = c
            return (it < max_iter) & jnp.any(~done)

        best0 = jnp.full(B, -jnp.inf, dtype=X.dtype)
        cnt0 = jnp.zeros(B, dtype=jnp.int32)
        done0 = jnp.zeros(B, dtype=bool)
        it, theta, state, done, best, cnt, last = jax.lax.while_loop(
            cond, body, (0, theta0, state0, done0, best0, cnt0,
                         jnp.zeros(B, dtype=X.dtype)))
        conv = done & jnp.isfinite(last)
        iters = jnp.full(B, it, dtype=jnp.int32)

        if natural_gradients and (train_qm or train_qs):
            # full-batch polish: one gamma=1 conjugate step lands q(u) on its
            # optimum at the final hyperparameters (a strict ELBO improvement;
            # removes minibatch noise from the stored variational state)
            params_now = jax.vmap(constrained)(theta["u"], bijectors, fixed)
            qm_n, qs_n = jax.vmap(
                lambda p, qmi, qsi, xi, yi, mi, zi, zmi:
                svgp_math.natgrad_step(p, qmi, qsi, xi, yi, mi, zi, zmi,
                                       1.0, kernel=kernel, jitter=jitter))(
                params_now, theta["qm"], theta["qs"], X, y, mask,
                theta["z"], zmask)
            bad = ~(jnp.isfinite(qm_n).all(axis=-1) &
                    jnp.isfinite(qs_n).all(axis=(-2, -1)))
            if train_qm:
                theta = {**theta, "qm": jnp.where(bad[:, None], theta["qm"],
                                                  qm_n)}
            if train_qs:
                theta = {**theta, "qs": jnp.where(bad[:, None, None],
                                                  theta["qs"], qs_n)}
    else:
        theta = theta0
        conv = jnp.zeros(B, dtype=bool)
        iters = jnp.zeros(B, dtype=jnp.int32)

    # final objective on the full data (the stored objective_value is the
    # full ELBO even when optimisation was minibatched)
    vals = per_elbo(theta, X, y, mask, 1.0)
    params = jax.vmap(constrained)(theta["u"], bijectors, fixed)

    if do_predict:
        from gpsat_tpu.ops import svgp as svgp_math2
        preds = jax.vmap(
            lambda p, qmi, qsi, zi, zmi, xsi: svgp_math2.predict(
                p, qmi, qsi, zi, zmi, xsi, kernel=kernel, jitter=jitter))(
            params, theta["qm"], theta["qs"], theta["z"], zmask, Xs)
    else:
        preds = {}
    # report the *negative* ELBO so the base-class restart logic (lower =
    # better) keeps working; BatchedSVGP flips the sign on output
    return (params, -vals, conv, iters, preds, theta["qm"], theta["qs"],
            theta["z"])


class BatchedSVGP(BatchedSGPR):
    """Batched SVGP engine (reference: GPflowSVGPModel,
    GPSat/models/gpflow_models.py:904). Full-batch Adam by default (the
    reference's default when minibatch_size is None); supports the reference's
    natural_gradients, train_inducing_points and minibatch options."""

    model_name = "SVGPModel"

    def __init__(self, coords_dim, num_inducing_points=500,
                 learning_rate=1e-2, minibatch_size=None, **kwargs):
        optim_kwargs = dict(kwargs.pop("optim_kwargs", None) or {})
        self.learning_rate = float(optim_kwargs.pop("learning_rate", learning_rate))
        self.check_every = int(optim_kwargs.pop("check_every", 10))
        self.persistence = int(optim_kwargs.pop("persistence", 100))
        self.early_stop = bool(optim_kwargs.pop("early_stop", True))
        self.natural_gradients = bool(optim_kwargs.pop("natural_gradients",
                                                       False))
        self.gamma = float(optim_kwargs.pop("gamma", 0.1))
        self.train_inducing_points = bool(optim_kwargs.pop(
            "train_inducing_points", False))
        mb = optim_kwargs.pop("minibatch_size", minibatch_size)
        self.minibatch_size = None if mb is None else int(mb)
        self.minibatch_seed = int(optim_kwargs.pop("minibatch_seed", 0))
        # per-epoch seeded reshuffle (reference tf.data shuffle(N).repeat(),
        # gpflow_models.py:1073); default False = one fixed shuffled cycle,
        # pinned equivalent at convergence in tests/test_svgp.py
        self.minibatch_reshuffle = bool(
            optim_kwargs.pop("minibatch_reshuffle", False))
        optim_kwargs.setdefault("max_iter", 2000)
        fixed = set(optim_kwargs.get("fixed_params") or [])
        self.train_qm = "inducing_mean" not in fixed
        self.train_qs = "inducing_chol" not in fixed
        if "inducing_points" in fixed:
            self.train_inducing_points = False
        super().__init__(coords_dim, num_inducing_points=num_inducing_points,
                         optim_kwargs=optim_kwargs, **kwargs)

    @property
    def param_names(self):
        return list(self.HYPER_NAMES) + ["inducing_points", "inducing_mean",
                                         "inducing_chol"]

    @property
    def loadable_param_names(self):
        """All variational state is re-loadable per expert: hyperparameters,
        inducing locations, q_mu and q_sqrt (reference load_params reads every
        param table, GPSat/local_experts.py:609-689). NaN/missing entries fall
        back to seeded selection / zero mean / identity chol."""
        return list(self.HYPER_NAMES) + ["inducing_points", "inducing_mean",
                                         "inducing_chol"]

    def param_shape(self, name):
        if name == "inducing_mean":
            return (self.num_inducing,)
        if name == "inducing_chol":
            return (self.num_inducing, self.num_inducing)
        return super().param_shape(name)

    def _build_perm(self, mask, mb):
        """Per-expert shuffled index cycle for minibatch windows: valid
        indices shuffled then tiled to N (+wrap pad of mb)."""
        mask = np.asarray(mask)
        B, N = mask.shape
        rng = np.random.default_rng(self.minibatch_seed)
        perm = np.zeros((B, N + mb), dtype=np.int32)
        for b in range(B):
            valid = np.where(mask[b])[0]
            if len(valid) == 0:
                continue
            cyc = np.resize(rng.permutation(valid), N + mb)
            perm[b] = cyc
        return perm

    def fit_predict(self, X, y, mask, Xs=None, optimise=True, predict=True,
                    param_overrides=None):
        B, N = np.asarray(mask).shape
        self._Z, self._zmask = self._build_inducing(X, mask)
        M = self._zmask.shape[1]
        self._qm0 = np.zeros((B, M))
        self._qs0 = np.broadcast_to(np.eye(M), (B, M, M)).copy()
        if param_overrides:
            self._apply_inducing_override(param_overrides)
            if param_overrides.get("inducing_mean") is not None:
                ov = np.asarray(param_overrides["inducing_mean"],
                                dtype=float).reshape(B, -1)[:, :M]
                use = ~np.isnan(ov)
                self._qm0[:, :ov.shape[1]][use] = ov[use]
            if param_overrides.get("inducing_chol") is not None:
                ov = np.asarray(param_overrides["inducing_chol"], dtype=float)
                Mo = int(round(np.sqrt(ov.reshape(B, -1).shape[1])))
                ov = ov.reshape(B, Mo, Mo)
                k = min(M, Mo)
                # an expert's chol loads whole or not at all (a partial
                # triangle is not a valid factor)
                ok = ~np.isnan(ov[:, :k, :k]).any(axis=(1, 2))
                self._qs0[np.ix_(ok, range(k), range(k))] = ov[ok, :k, :k]
        self._mb = 0
        self._perm = np.zeros((B, 1), dtype=np.int32)
        if self.minibatch_size is not None and self.minibatch_size < N:
            self._mb = int(self.minibatch_size)
            self._perm = self._build_perm(mask, self._mb)
        out = BatchedGPR.fit_predict(self, X, y, mask, Xs=Xs,
                                     optimise=optimise, predict=predict,
                                     param_overrides=param_overrides)
        out["objective"] = -out["objective"]   # report the ELBO
        out["params"]["inducing_points"] = self._Z_final * self._zmask[:, :, None]
        out["params"]["inducing_mean"] = self._qm_final
        out["params"]["inducing_chol"] = self._qs_final
        out["inducing_mask"] = self._zmask
        return out

    def _snapshot_state(self):
        return {"Z": getattr(self, "_Z_final", None),
                "qm": getattr(self, "_qm_final", None),
                "qs": getattr(self, "_qs_final", None)}

    def _merge_state(self, state1, use2):
        keep1 = ~use2
        if state1 and state1.get("Z") is not None:
            self._Z_final[keep1] = state1["Z"][keep1]
        if state1 and state1.get("qm") is not None:
            self._qm_final[keep1] = state1["qm"][keep1]
            self._qs_final[keep1] = state1["qs"][keep1]

    def _call_program(self, u0, X, y, mask, Xs_in, bij_b, fixed, optimise,
                      do_predict, compute_fval=True):
        (params, fval, conv, iters, preds, qm, qs, z) = _svgp_fit_predict(
            u0, jnp.asarray(self._qm0, dtype=self.dtype),
            jnp.asarray(self._qs0, dtype=self.dtype),
            X, y, jnp.asarray(mask), jnp.asarray(self._Z, dtype=self.dtype),
            jnp.asarray(self._zmask), Xs_in, jnp.asarray(self._perm), bij_b,
            fixed, kernel=self.kernel, free_names=self.free_names, d=self.d,
            optimise=bool(optimise), do_predict=bool(do_predict),
            max_iter=self.max_iter, lr=self.learning_rate,
            check_every=self.check_every, persistence=self.persistence,
            jitter=self.jitter, early_stop=self.early_stop,
            natural_gradients=self.natural_gradients, gamma=self.gamma,
            train_z=self.train_inducing_points, train_qm=self.train_qm,
            train_qs=self.train_qs, mb=self._mb,
            reshuffle=self.minibatch_reshuffle, mb_seed=self.minibatch_seed)
        self._qm_final = np.array(qm)
        self._qs_final = np.array(qs)
        self._Z_final = np.array(z)
        return params, fval, conv, iters, preds


# ---------------------------------------------------------------------------
# VFF batched engine: per-expert box domains, Kronecker Fourier features
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def make_vff_objective(mathmod, kernel, free_names, d, ms, jitter):
    """Collapsed negative-ELBO objective over the flat unconstrained hyper
    vector for VFF/ASVGP feature math `mathmod`; args
    (X, y, mask, a, b, bij, fixed). lru_cache gives the pooled path one
    stable callable (no retraces)."""
    from gpsat_tpu.ops.packing import ParamSpec

    shapes = {"lengthscales": (d,), "kernel_variance": (d,),
              "likelihood_variance": ()}
    spec = ParamSpec([(n, shapes[n]) for n in free_names])

    def objective(u, X, y, mask, a, b, bijectors, fixed):
        free = unpack(u, spec)
        params = dict(fixed)
        for n in free_names:
            params[n] = bijectors[n].forward(free[n])
        return mathmod.neg_elbo(params, X, y, mask, a, b, ms, kernel=kernel,
                                jitter=jitter)

    return objective

@partial(jax.jit, static_argnames=("kernel", "free_names", "d", "ms",
                                   "optimise", "do_predict", "max_iter",
                                   "gtol", "ftol", "jitter", "mathmod",
                                   "compute_fval"))
def _vff_fit_predict(u0, X, y, mask, a, b, Xs, bijectors, fixed, *, kernel,
                     free_names, d, ms, optimise, do_predict, max_iter, gtol,
                     ftol, jitter, mathmod=None, compute_fval=True):
    from gpsat_tpu.ops import vff as vff_math
    from gpsat_tpu.ops.packing import ParamSpec
    if mathmod is None:
        mathmod = vff_math

    shapes = {"lengthscales": (d,), "kernel_variance": (d,),
              "likelihood_variance": ()}
    spec = ParamSpec([(n, shapes[n]) for n in free_names])

    def objective(u, X, y, mask, a, b, bijectors, fixed):
        free = unpack(u, spec)
        params = dict(fixed)
        for n in free_names:
            params[n] = bijectors[n].forward(free[n])
        return mathmod.neg_elbo(params, X, y, mask, a, b, ms, kernel=kernel,
                                jitter=jitter)

    if optimise and free_names:
        mls, rec = linesearch_policy(X.dtype)
        u, fval, conv, iters = _batched_lbfgs_jit(
            objective, u0, (X, y, mask, a, b, bijectors, fixed),
            max_iter, gtol, ftol, 10, mls, "custom", recovery_steps=rec)
    else:
        u = u0
        if compute_fval:
            fval = jax.vmap(objective)(u0, X, y, mask, a, b, bijectors, fixed)
        else:
            fval = jnp.zeros(u0.shape[0], dtype=X.dtype)
        conv = jnp.zeros(u0.shape[0], dtype=bool)
        iters = jnp.zeros(u0.shape[0], dtype=jnp.int32)

    def constrained(ui, bi, fi):
        free = unpack(ui, spec)
        params = dict(fi)
        for n in free_names:
            params[n] = bi[n].forward(free[n])
        return params

    params = jax.vmap(constrained)(u, bijectors, fixed)

    if do_predict:
        preds = jax.vmap(
            lambda p, xi, yi, mi, ai, bi, xsi: mathmod.predict(
                p, xi, yi, mi, xsi, ai, bi, ms, kernel=kernel, jitter=jitter))(
            params, X, y, mask, a, b, Xs)
    else:
        preds = {}
    return params, fval, conv, iters, preds


class BatchedVFF(BatchedGPR):
    """Batched VFF engine (reference model: GPflowVFFModel,
    GPSat/models/vff_model.py:48). Needs per-expert box domains: the
    orchestrator sets `engine._expert_locs_scaled` ([B, D] scaled expert
    coordinates) before fit_predict; domains are expert_loc +- domain_size
    (scaled), expanded to cover each expert's data."""

    model_name = "VFFModel"
    objective_sign = -1.0
    # the GPR size-gated recovery drop is validated only on the exact NLML
    # objective; VFF/ASVGP keep the (8, 4) chain at every size (see
    # ops/lbfgs.linesearch_policy)
    linesearch_kind = "vff"
    _math = None   # resolved lazily to ops.vff (subclasses swap feature math)

    def __init__(self, coords_dim, kernel="Matern32",
                 num_inducing_features=None, domain_size=None,
                 jitter=None, **kwargs):
        from gpsat_tpu.ops import vff as vff_math
        assert num_inducing_features is not None, \
            "num_inducing_features must be specified for VFF"
        super().__init__(coords_dim, kernel=kernel,
                         jitter=vff_math.DEFAULT_JITTER if jitter is None else jitter,
                         **kwargs)
        self.jitter = float(vff_math.DEFAULT_JITTER if jitter is None else jitter)
        d = self.d
        if isinstance(num_inducing_features, int):
            num_inducing_features = [num_inducing_features] * d
        self.ms = tuple(int(m) for m in num_inducing_features)
        if isinstance(domain_size, (int, float)) or domain_size is None:
            domain_size = [domain_size] * d
        self.domain_size = domain_size
        # per-dim kernel variance: widen the scalar init
        kv0 = float(np.atleast_1d(self.init_values["kernel_variance"])[0])
        self.init_values["kernel_variance"] = np.full(d, kv0 ** (1.0 / d))
        self._expert_locs_scaled = None

    def param_shape(self, name):
        if name == "kernel_variance":
            return (self.d,)
        return super().param_shape(name)

    def _initial_params_batch(self, B, overrides=None, y_var=None, scale=1.0,
                              clamp=True):
        out = super()._initial_params_batch(B, overrides, y_var=None,
                                            clamp=clamp)
        # smart per-dim variance init: product equals per-expert signal var
        if y_var is not None and not self.user_set.get("kernel_variance", True):
            kv = np.maximum(y_var, 1e-10)[:, None] ** (1.0 / self.d) * scale
            if overrides is None or overrides.get("kernel_variance") is None:
                out["kernel_variance"] = np.broadcast_to(kv, (B, self.d)).copy()
        if y_var is not None and not self.user_set.get("likelihood_variance", True):
            if overrides is None or overrides.get("likelihood_variance") is None:
                out["likelihood_variance"] = np.maximum(0.1 * y_var, 1e-10) * scale
        return out

    def _build_domains(self, X, mask):
        X = np.asarray(X)
        mask = np.asarray(mask)
        B, N, d = X.shape
        big = 1e30
        xm = np.where(mask[:, :, None], X, big)
        xM = np.where(mask[:, :, None], X, -big)
        data_min = xm.min(axis=1)
        data_max = xM.max(axis=1)
        # empty experts: harmless placeholder domain
        empty = ~mask.any(axis=1)
        data_min[empty] = 0.0
        data_max[empty] = 1.0
        if self._expert_locs_scaled is not None:
            el = np.asarray(self._expert_locs_scaled)
        else:
            cnt = np.maximum(mask.sum(axis=1), 1)[:, None]
            el = (X * mask[:, :, None]).sum(axis=1) / cnt
        a = np.empty((B, d))
        b = np.empty((B, d))
        cs = np.broadcast_to(self.coords_scale.reshape(-1), (d,))
        for i in range(d):
            ds = self.domain_size[i]
            if ds is None:
                a[:, i] = data_min[:, i] - 1e-8
                b[:, i] = data_max[:, i] + 1e-8
            else:
                a[:, i] = np.minimum(el[:, i] - ds / cs[i],
                                     data_min[:, i] - 1e-8)
                b[:, i] = np.maximum(el[:, i] + ds / cs[i],
                                     data_max[:, i] + 1e-8)
        return a, b

    def fit_predict(self, X, y, mask, Xs=None, optimise=True, predict=True,
                    param_overrides=None):
        self._a, self._b = self._build_domains(X, mask)
        out = BatchedGPR.fit_predict(self, X, y, mask, Xs=Xs,
                                     optimise=optimise, predict=predict,
                                     param_overrides=param_overrides)
        out["objective"] = -out["objective"]   # report the ELBO
        return out

    def _call_program(self, u0, X, y, mask, Xs_in, bij_b, fixed, optimise,
                      do_predict, compute_fval=True):
        return _vff_fit_predict(
            u0, X, y, jnp.asarray(mask),
            jnp.asarray(self._a, dtype=self.dtype),
            jnp.asarray(self._b, dtype=self.dtype), Xs_in, bij_b, fixed,
            kernel=self.kernel, free_names=self.free_names, d=self.d,
            ms=self.ms, optimise=bool(optimise), do_predict=bool(do_predict),
            max_iter=self.max_iter, gtol=self.gtol, ftol=self.ftol,
            jitter=self.jitter, mathmod=self._math,
            compute_fval=bool(compute_fval))

    # -- pooled execution hooks ----------------------------------------------

    def _pool_supported(self, optimise):
        """VFF/ASVGP optimise with L-BFGS over hyperparameters only, so the
        device-resident pool applies directly; the per-expert box domains
        ride along as extra args like SGPR's inducing points."""
        return optimise and bool(self.free_names)

    def _pool_objective(self, N=None):
        from gpsat_tpu.ops import vff as vff_math
        mathmod = self._math if self._math is not None else vff_math
        return make_vff_objective(mathmod, self.kernel, self.free_names,
                                  self.d, self.ms, self.jitter), None

    def _pool_extra_args(self, X, mask, param_overrides):
        self._a, self._b = self._build_domains(X, mask)
        self._a_all, self._b_all = self._a, self._b
        return (np.asarray(self._a, dtype=self.dtype),
                np.asarray(self._b, dtype=self.dtype))

    def _pool_select_chunk(self, ids):
        self._a = self._a_all[ids]
        self._b = self._b_all[ids]

    def _pool_finalize(self, out):
        self._a, self._b = self._a_all, self._b_all
        out["objective"] = -out["objective"]   # stored objective = ELBO
        return out


class BatchedASVGP(BatchedVFF):
    """Batched ASVGP engine: B-spline inducing features on per-expert box
    domains (reference: GPflowASVGPModel, GPSat/models/asvgp_model.py:18;
    feature math in ops/asvgp.py). Same collapsed bound / domain logic as
    BatchedVFF; `num_inducing_features` counts spline basis functions per
    dim, which must exceed the spline degree for the kernel."""

    model_name = "ASVGPModel"

    def __init__(self, coords_dim, kernel="Matern32",
                 num_inducing_features=None, domain_size=None,
                 jitter=None, **kwargs):
        from gpsat_tpu.ops import asvgp as asvgp_math
        super().__init__(coords_dim, kernel=kernel,
                         num_inducing_features=num_inducing_features,
                         domain_size=domain_size,
                         jitter=asvgp_math.DEFAULT_JITTER if jitter is None
                         else jitter, **kwargs)
        self._math = asvgp_math
        degree = asvgp_math.spline_degree(kernel)
        for m in self.ms:
            assert m > degree, (
                f"ASVGP needs num_inducing_features > spline degree "
                f"({degree}) for kernel {kernel}; got {m}")
