"""Fused masked-GPR NLML value kernel (Pallas/Mosaic, TPU).

Why this exists: the L-BFGS hot loop is gated by the *value-only* objective
evals of the Armijo linesearch (~7 per trip). XLA's batched Cholesky at
[69,400,400] f32 costs ~6.6 ms inside a dependency chain because it lowers to
~N sequential column steps whose per-step state round-trips HBM
(tpu_stuff/microbench_chain.py). Here the whole evaluation — kernel-matrix
build, blocked Cholesky, forward solve (via a bordered column), log-det and
quadratic form — runs in ONE Pallas kernel with each expert group's matrix
resident in VMEM; the same column step costs ~0.1-1 us
(tpu_stuff/pallas_bisect.py), because the panel never leaves VMEM.

Algorithm (per expert, upper-factor convention A = U^T U):
  - A_ext = [[A, y~], [., .]] with y~ appended as border lane N; factoring the
    leading N columns leaves z = L^{-1} y~ in the border lane (chol of a
    bordered matrix computes the solve for free).
  - blocked right-looking factorisation, T=128 panels: T-step column loop on
    the VMEM-resident row panel, then one MXU update per trailing row block.
  - logdet accumulates log(pivot) and quad accumulates the border entry^2
    inside the column loop, so nothing is extracted from lane slices after
    the fact.

Masking follows ops/gpr.py exactly (pad rows get unit diagonal, zero
elsewhere) so the value equals the unpadded NLML. Reference for the math
being fused: GPSat/models/pure_python_gpr.py:439-506 (Rasmussen & Williams
Algorithm 2.1).

Supported: isotropic kernels (Matern12/32/52, RBF/SquaredExponential,
Exponential), D <= 5 coordinate dims, f32. Callers fall back to the XLA path
otherwise (ops/gpr.nlml).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["pallas_value_supported", "nlml_value_batched"]

_T = 128           # panel height = MXU/VPU tile
_MAX_D = 5
_VMEM_BUDGET = 32 * 2**20   # bytes for the A scratch per grid step
_VMEM_LIMIT = 100 * 2**20   # Mosaic scoped-vmem limit (v5e has 128 MiB)
_MAX_GROUP = 24             # experts per grid step (measured optimum at N=512)

# r2 scale factor per kernel: q2_j = scale * (dx_j / ls_j)^2
_KERNELS = {
    "Matern12": 1.0,
    "Matern32": 3.0,
    "Matern52": 5.0,
    "RBF": 1.0,
    "SquaredExponential": 1.0,
    "Exponential": 1.0,
}


def _phi(kernel, r2, f32):
    """Correlation phi(r2) (matches ops/kernels.py shapes exactly)."""
    r = jnp.sqrt(jnp.maximum(r2, f32(1e-36)))
    if kernel == "Matern12":
        return jnp.exp(-r)
    if kernel == "Matern32":
        return (f32(1.0) + r) * jnp.exp(-r)
    if kernel == "Matern52":
        return (f32(1.0) + r + r * r * f32(1.0 / 3.0)) * jnp.exp(-r)
    if kernel in ("RBF", "SquaredExponential"):
        return jnp.exp(f32(-0.5) * r2)
    if kernel == "Exponential":
        return jnp.exp(f32(-0.5) * r)
    raise NotImplementedError(kernel)


# interpret-mode switch for CPU testing of the full wiring (tests set both
# this and FORCE_SUPPORTED via monkeypatch)
_INTERPRET = False
_FORCE_SUPPORTED = False


def pallas_value_supported(kernel, d, N=None):
    """Can the fused kernel handle this configuration on this platform?"""
    if kernel not in _KERNELS or d > _MAX_D:
        return False
    if _FORCE_SUPPORTED:
        return True
    try:
        if jax.devices()[0].platform == "cpu":
            return False
    except Exception:  # pragma: no cover
        return False
    return True


def _group_size(N):
    """Experts per grid step, sized so A [Bt, N, N+T] fits the VMEM budget."""
    per = N * (N + _T) * 4
    bt = max(2, int(_VMEM_BUDGET // per))
    return int(min(bt, _MAX_GROUP))


def _value_kernel(xt_ref, yt_ref, p_ref, out_ref, a_ref, *, kernel, d, N):
    """One grid step: Bt experts. xt_ref [Bt,8,N] coords (dim-major),
    yt_ref [Bt,N] masked obs, p_ref [Bt,8] params
    (ls_0..ls_{d-1}, sf2@5, noise_eff@6, n_valid@7... see wrapper),
    out_ref [Bt,128] value broadcast, a_ref [Bt,N,N+T] scratch."""
    from jax.experimental import pallas as pl

    f32 = jnp.float32
    Bt = a_ref.shape[0]
    NL = N + _T
    nb = N // _T
    scale = f32(_KERNELS[kernel])

    lane_n = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N), 2)
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _T), 2)

    # ---- build A (masked kernel matrix) into a_ref[:, :, :N] ----------
    # Row-panel at a time so live temporaries are [Bt, T, N], not
    # [Bt, N, N] — whole-matrix temporaries blow the Mosaic scoped-vmem
    # stack at group sizes worth running.
    yt = yt_ref[:]                                   # [Bt, N] (y * mask)
    m = xt_ref[:, 7, :]                              # [Bt, N] float mask
    sf2 = p_ref[:, 5:6]                              # [Bt, 1]
    noise = p_ref[:, 6:7]                            # noise + jitter
    # diag value = m*noise + (1-m): rewrite of where(m, noise, 1)
    diagv = m * (noise + f32(-1.0)) + f32(1.0)       # [Bt, N]
    border01 = jnp.where(lane_t == 0, f32(1.0), f32(0.0))
    def _rows(v, r0):
        """[Bt, T, 1] row-slice of a [Bt, N] value (explicit slice then
        expand: slice+newaxis in one subscript lowers to an unsupported
        Mosaic gather)."""
        return jax.lax.slice_in_dim(v, r0, r0 + _T, axis=1)[:, :, None]

    for rb in range(nb):
        r0 = rb * _T
        sub_abs = jax.lax.broadcasted_iota(jnp.int32, (1, _T, 1), 1) + r0
        r2 = jnp.zeros((Bt, _T, N), f32)
        for j in range(d):
            ls_j = p_ref[:, j:j + 1]                 # [Bt, 1]
            xj = xt_ref[:, j, :] / ls_j              # [Bt, N]
            dj = _rows(xj, r0) - xj[:, None, :]      # [Bt, T, N]
            r2 = r2 + dj * dj
        r2 = r2 * scale
        K = sf2[:, :, None] * _phi(kernel, r2, f32)
        mm = _rows(m, r0) * m[:, None, :]
        dterm = jnp.where(lane_n == sub_abs,
                          _rows(diagv, r0)
                          + jnp.zeros((Bt, _T, N), f32), f32(0.0))
        a_ref[:, r0:r0 + _T, :N] = K * mm + dterm
        # border: lane N carries y~, lanes N+1.. are zero
        a_ref[:, r0:r0 + _T, N:] = _rows(yt, r0) * border01

    # ---- blocked factorisation ----------------------------------------
    logdet = jnp.zeros((Bt, 1, 1), f32)
    quad = jnp.zeros((Bt, 1, 1), f32)

    for kb in range(nb):
        base = kb * _T
        W = NL - base
        lane_w = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
        sub_t = jax.lax.broadcasted_iota(jnp.int32, (1, _T, 1), 1)
        border = N - base

        def col_step(j, carry, base=base, W=W, lane_w=lane_w, sub_t=sub_t,
                     border=border):
            logdet, quad = carry
            row = a_ref[:, pl.ds(base + j, 1), base:]        # [Bt, 1, W]
            piv2 = jnp.sum(jnp.where(lane_w == j, row, f32(0.0)),
                           axis=2, keepdims=True)            # [Bt,1,1]
            piv = jnp.sqrt(piv2)
            u = (row / piv) * jnp.where(lane_w >= j, f32(1.0), f32(0.0))
            a_ref[:, pl.ds(base + j, 1), base:] = u
            coef = jnp.swapaxes(u[:, :, :_T], 1, 2)          # [Bt, T, 1]
            rmask = jnp.where(sub_t > j, f32(1.0), f32(0.0))
            panel = a_ref[:, base:base + _T, base:]
            a_ref[:, base:base + _T, base:] = panel - (coef * rmask) * u
            logdet = logdet + jnp.log(piv)
            zc = jnp.sum(jnp.where(lane_w == border, u, f32(0.0)),
                         axis=2, keepdims=True)
            quad = quad + zc * zc
            return logdet, quad

        # i32 array bounds force the while-loop form of fori_loop: under
        # jax_enable_x64 (on at package import) the static-bound form scans
        # with an i64 counter, and Mosaic's i64->i32 cast lowering recurses
        # infinitely (RecursionError at compile time on real TPU).
        logdet, quad = jax.lax.fori_loop(jnp.int32(0), jnp.int32(_T),
                                         col_step, (logdet, quad))

        # trailing row blocks: A[ib, ib: ] -= U[kb, ib]^T @ U[kb, ib: ]
        for ib in range(kb + 1, nb):
            u_ki = a_ref[:, base:base + _T, ib * _T:(ib + 1) * _T]
            u_krest = a_ref[:, base:base + _T, ib * _T:]
            g = jax.lax.dot_general(
                u_ki, u_krest,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST,   # MXU f32 passes: the
                # default single-pass bf16 matmul costs ~3e-3 relative error
                # in the NLML (measured; XLA f32 path is ~1e-5 vs f64)
                preferred_element_type=f32)                  # [Bt, T, W_ib]
            a_ref[:, ib * _T:(ib + 1) * _T, ib * _T:] = (
                a_ref[:, ib * _T:(ib + 1) * _T, ib * _T:] - g)

    n_valid = jnp.sum(m, axis=1)[:, None, None]              # [Bt,1,1]
    val = (f32(0.5) * quad + logdet
           + f32(0.5) * n_valid * f32(np.log(2.0 * np.pi)))
    out_ref[:] = val[:, 0, :] + jnp.zeros((Bt, _T), f32)


@functools.partial(jax.jit, static_argnames=("kernel", "d", "interpret"))
def _nlml_value_call(xt, yt, p, *, kernel, d, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bp, _, N = xt.shape
    bt = _group_size(N)
    G = Bp // bt
    kern = functools.partial(_value_kernel, kernel=kernel, d=d, N=N)
    # index maps must return i32: under jax_enable_x64 a literal 0 traces as
    # an i64 constant, which Mosaic cannot legalize in the index-map return
    z = np.int32(0)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Bp, _T), jnp.float32),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((bt, 8, N), lambda i: (i, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, N), lambda i: (i, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 8), lambda i: (i, z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, _T), lambda i: (i, z),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bt, N, N + _T), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xt, yt, p)
    return out[:, 0]


def nlml_value_batched(params, X, y, maskf, kernel, jitter, interpret=None):
    """Batched NLML values via the fused kernel.

    params: dict of [B]-leading arrays (lengthscales [B, d], kernel_variance
    [B], likelihood_variance [B]); X [B, N, D]; y [B, N]; maskf [B, N] float.
    Returns [B] f32 values equal to ops.gpr.nlml per expert (f32 tolerance).
    """
    if interpret is None:
        interpret = _INTERPRET
    B, N, D = X.shape
    f32 = jnp.float32
    N_pad = int(-(-N // _T) * _T)
    bt = _group_size(N_pad)
    B_pad = int(-(-B // bt) * bt)

    Xf = jnp.asarray(X, f32)
    mf = jnp.asarray(maskf, f32)
    yf = jnp.asarray(y, f32) * mf

    # dim-major coord block [B, 8, N]: dims 0..D-1 coords, slot 7 the mask
    xt = jnp.zeros((B, 8, N_pad), f32)
    xt = xt.at[:, :D, :N].set(jnp.swapaxes(Xf, 1, 2))
    xt = xt.at[:, 7, :N].set(mf)
    yt = jnp.zeros((B, N_pad), f32)
    yt = yt.at[:, :N].set(yf)

    ls = jnp.asarray(params["lengthscales"], f32).reshape(B, -1)
    if ls.shape[1] == 1 and D > 1:
        ls = jnp.broadcast_to(ls, (B, D))
    p = jnp.zeros((B, 8), f32)
    p = p.at[:, :D].set(ls)
    p = p.at[:, 5].set(jnp.asarray(params["kernel_variance"],
                                   f32).reshape(B))
    p = p.at[:, 6].set(jnp.asarray(params["likelihood_variance"],
                                   f32).reshape(B) + f32(jitter))

    if B_pad != B:
        pad = B_pad - B
        xt = jnp.concatenate([xt, jnp.zeros((pad, 8, N_pad), f32)], axis=0)
        yt = jnp.concatenate([yt, jnp.zeros((pad, N_pad), f32)], axis=0)
        p_tail = jnp.zeros((pad, 8), f32).at[:, :D].set(1.0)
        p_tail = p_tail.at[:, 5].set(1.0).at[:, 6].set(1.0)
        p = jnp.concatenate([p, p_tail], axis=0)

    out = _nlml_value_call(xt, yt, p, kernel=kernel, d=D,
                           interpret=interpret)
    return out[:B]
