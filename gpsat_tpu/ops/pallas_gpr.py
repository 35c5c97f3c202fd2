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

__all__ = ["pallas_value_supported", "nlml_value_batched",
           "pallas_vg_supported", "nlml_vg_batched"]

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


def _phi_grad(kernel, r2, f32):
    """F(r2) with d phi / d log ls_j = F * q2_j (q2 includes the kernel's
    r2 scale factor, so F = -2 * d phi / d r2). Hand-derived per kernel —
    these are the closed forms the batched adjoint otherwise gets from the
    VJP through the kernel build (ops/gpr.py _nlml_fused_bwd)."""
    r = jnp.sqrt(jnp.maximum(r2, f32(1e-36)))
    if kernel == "Matern12":
        return jnp.exp(-r) / r
    if kernel == "Matern32":
        return jnp.exp(-r)
    if kernel == "Matern52":
        return (f32(1.0) + r) * f32(1.0 / 3.0) * jnp.exp(-r)
    if kernel in ("RBF", "SquaredExponential"):
        return jnp.exp(f32(-0.5) * r2)
    if kernel == "Exponential":
        return jnp.exp(f32(-0.5) * r) / (f32(2.0) * r)
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


# ---------------------------------------------------------------------------
# fused NLML value_and_grad kernel
# ---------------------------------------------------------------------------
#
# The L-BFGS iteration pays ~k fused value evals (linesearch) + ONE
# value_and_grad; with the value path fused, the vg eval dominates the trip
# (measured 18.4 ms XLA vs 5.7 ms Pallas value at [69, 400] f32 on v5e,
# tpu_stuff/microbench_vg.py). This kernel computes value AND the analytic
# gradient (reference math: GPSat/models/pure_python_gpr.py:439-506,
# dNLML/dtheta = 0.5 tr((A^-1 - aa^T) dK/dtheta)) in one VMEM-resident
# program:
#   1. build the masked kernel matrix A (as the value kernel, no y border)
#   2. blocked factorisation with a *tile-inverse trsm*: a T-step column loop
#      factors only the TxT diagonal tile, a second T-step loop inverts it
#      (rows bottom-up), then the panel's trailing columns come from ONE MXU
#      matmul U_k,rest = W_kk^T A_k,rest — the sequential column steps touch
#      T lanes instead of the full row, so the factorisation is cheaper than
#      the value kernel's even though it also produces the tile inverses
#   3. off-diagonal blocks of W = U^{-1} by the MXU block recurrence
#      W_ij = -W_ii (sum_{i<k<=j} U_ik W_kj)
#   4. alpha^T = (W (W^T y))^T built purely in ROW form (two [Bt,1,N]
#      matvecs against W — lane-width-1 column arrays and their transposes
#      crash Mosaic's vector layout inference), quad = y . alpha,
#      Kinv = W W^T per row panel, Q = Kinv - alpha alpha^T, and the
#      per-hyperparameter reductions g_j = 0.5 sum(Q * dK_j) with the
#      closed-form dK/dtheta of _phi_grad.
# Gradients are returned in log-parameter space for the lengthscales /
# kernel variance (the natural form of the closed-form dK) and raw for the
# effective noise; the wrapper converts to raw-parameter gradients.


def pallas_vg_supported(kernel, d, N=None):
    """Can the fused value_and_grad kernel handle this configuration?

    The W = U^{-1} block recurrence unrolls nb^3/6 static matmuls, so cap
    padded N at 1024 (nb = 8); larger experts fall back to the XLA adjoint.
    """
    if not pallas_value_supported(kernel, d, N):
        return False
    if N is not None and -(-N // _T) * _T > 1024:
        return False
    return True


_VG_VMEM_BUDGET = 16 * 2**20   # scratch; live vectors + Mosaic vreg spills
                               # need the rest (measured: bt=16 at N=512
                               # spills 148 MB and exceeds the 128 MB VMEM)


def _vg_group_size(N):
    """Experts per grid step: A scratch is [Bt, N, 2N] (U columns + W).
    Bt must be a multiple of 8 (Mosaic block-shape sublane constraint on the
    [Bt, N] input block)."""
    per = N * (2 * N) * 4
    bt = int(_VG_VMEM_BUDGET // per) // 8 * 8
    return int(min(max(8, bt), _MAX_GROUP))


def _vg_kernel(xt_ref, yt_ref, p_ref, out_ref, a_ref, *, kernel, d, N):
    """One grid step: Bt experts. Inputs as _value_kernel; out_ref [Bt,128]
    lanes: 0 = NLML value, 1..d = d/dlog(ls_j), 6 = d/dlog(sf2),
    7 = d/d(noise_eff). a_ref [Bt, N, 2N] scratch: columns [0, N) hold
    A -> U, [N, 2N) W = U^{-1}."""
    from jax.experimental import pallas as pl

    f32 = jnp.float32
    Bt = a_ref.shape[0]
    woff = N
    nb = N // _T
    scale = f32(_KERNELS[kernel])

    lane_n = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N), 2)
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _T), 2)
    sub_t = jax.lax.broadcasted_iota(jnp.int32, (1, _T, 1), 1)

    yt = yt_ref[:]
    m = xt_ref[:, 7, :]
    sf2 = p_ref[:, 5:6]
    noise = p_ref[:, 6:7]
    diagv = m * (noise + f32(-1.0)) + f32(1.0)

    def _rows(v, r0):
        return jax.lax.slice_in_dim(v, r0, r0 + _T, axis=1)[:, :, None]

    def _dist_panel(r0):
        """(r2 [Bt,T,N], per-dim q2 closure) for row panel r0."""
        r2 = jnp.zeros((Bt, _T, N), f32)
        for j in range(d):
            ls_j = p_ref[:, j:j + 1]
            xj = xt_ref[:, j, :] / ls_j
            dj = _rows(xj, r0) - xj[:, None, :]
            r2 = r2 + dj * dj
        return r2 * scale

    # ---- build A + zeroed W region --------------------------------------
    for rb in range(nb):
        r0 = rb * _T
        sub_abs = jax.lax.broadcasted_iota(jnp.int32, (1, _T, 1), 1) + r0
        K = sf2[:, :, None] * _phi(kernel, _dist_panel(r0), f32)
        mm = _rows(m, r0) * m[:, None, :]
        dterm = jnp.where(lane_n == sub_abs,
                          _rows(diagv, r0)
                          + jnp.zeros((Bt, _T, N), f32), f32(0.0))
        a_ref[:, r0:r0 + _T, :N] = K * mm + dterm
        a_ref[:, r0:r0 + _T, woff:] = jnp.zeros((Bt, _T, N), f32)

    # ---- blocked factorisation + tile inverses --------------------------
    logdet = jnp.zeros((Bt, 1, 1), f32)
    dot = functools.partial(jax.lax.dot_general,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=f32)
    bmm = (((2,), (1,)), ((0,), (0,)))          # [Bt,a,k] @ [Bt,k,b]
    bmm_t = (((1,), (1,)), ((0,), (0,)))        # [Bt,k,a]^T @ [Bt,k,b]

    for kb in range(nb):
        base = kb * _T

        # row j is extracted/written with iota masks on STATIC full-tile
        # loads/stores: a dynamic sublane index combined with a partial lane
        # slice is an "unaligned dynamic load" Mosaic refuses to lower (the
        # value kernel gets away with pl.ds because its row slices run to
        # the end of the scratch).
        def col_step(j, logdet, base=base):
            tile = a_ref[:, base:base + _T, base:base + _T]      # [Bt,T,T]
            rowmask = sub_t == j
            row = jnp.sum(jnp.where(rowmask, tile, f32(0.0)),
                          axis=1, keepdims=True)                 # [Bt,1,T]
            piv2 = jnp.sum(jnp.where(lane_t == j, row, f32(0.0)),
                           axis=2, keepdims=True)
            piv = jnp.sqrt(piv2)
            u = (row / piv) * jnp.where(lane_t >= j, f32(1.0), f32(0.0))
            coef = jnp.swapaxes(u, 1, 2)                          # [Bt,T,1]
            rmask = jnp.where(sub_t > j, f32(1.0), f32(0.0))
            updated = tile - (coef * rmask) * u
            a_ref[:, base:base + _T, base:base + _T] = jnp.where(
                rowmask, u + jnp.zeros((Bt, _T, _T), f32), updated)
            return logdet + jnp.log(piv)

        logdet = jax.lax.fori_loop(jnp.int32(0), jnp.int32(_T), col_step,
                                   logdet)

        # invert the diagonal tile, rows bottom-up:
        # W[i,:] = (e_i - U[i,i+1:] @ W[i+1:,:]) / U[i,i]
        def inv_step(t, carry, base=base):
            i = jnp.int32(_T - 1) - t
            utile = a_ref[:, base:base + _T, base:base + _T]
            wtile = a_ref[:, base:base + _T, woff + base:woff + base + _T]
            urow = jnp.sum(jnp.where(sub_t == i, utile, f32(0.0)),
                           axis=1, keepdims=True)                # [Bt,1,T]
            s = dot(urow * jnp.where(lane_t > i, f32(1.0), f32(0.0)),
                    wtile, dimension_numbers=bmm)                 # [Bt,1,T]
            uii = jnp.sum(jnp.where(lane_t == i, urow, f32(0.0)),
                          axis=2, keepdims=True)
            e_i = jnp.where(lane_t == i, f32(1.0), f32(0.0))
            wrow = (e_i - s) / uii                                # [Bt,1,T]
            a_ref[:, base:base + _T, woff + base:woff + base + _T] = \
                jnp.where(sub_t == i,
                          wrow + jnp.zeros((Bt, _T, _T), f32), wtile)
            return carry

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(_T), inv_step,
                          jnp.int32(0))

        # trsm via the tile inverse: U_k,rest = W_kk^T @ A_k,rest
        if base + _T < N:
            wkk = a_ref[:, base:base + _T, woff + base:woff + base + _T]
            arest = a_ref[:, base:base + _T, base + _T:N]
            urest = dot(wkk, arest, dimension_numbers=bmm_t)      # [Bt,T,R]
            a_ref[:, base:base + _T, base + _T:N] = urest

        # trailing row blocks: A[ib, ib:] -= U[kb, ib]^T @ U[kb, ib:]
        for ib in range(kb + 1, nb):
            u_ki = a_ref[:, base:base + _T, ib * _T:(ib + 1) * _T]
            u_krest = a_ref[:, base:base + _T, ib * _T:N]
            g = dot(u_ki, u_krest, dimension_numbers=bmm_t)
            a_ref[:, ib * _T:(ib + 1) * _T, ib * _T:N] = (
                a_ref[:, ib * _T:(ib + 1) * _T, ib * _T:N] - g)

    # ---- off-diagonal W blocks: W_ij = -W_ii sum_{i<k<=j} U_ik W_kj ------
    for jb in range(nb):
        wj = woff + jb * _T
        for i in range(jb - 1, -1, -1):
            acc = jnp.zeros((Bt, _T, _T), f32)
            for k in range(i + 1, jb + 1):
                u_ik = a_ref[:, i * _T:(i + 1) * _T, k * _T:(k + 1) * _T]
                w_kj = a_ref[:, k * _T:(k + 1) * _T, wj:wj + _T]
                acc = acc + dot(u_ik, w_kj, dimension_numbers=bmm)
            w_ii = a_ref[:, i * _T:(i + 1) * _T,
                         woff + i * _T:woff + (i + 1) * _T]
            a_ref[:, i * _T:(i + 1) * _T, wj:wj + _T] = \
                -dot(w_ii, acc, dimension_numbers=bmm)

    # ---- alpha (row form), quad, Kinv tiles, gradient reductions --------
    # alpha^T = y^T W W^T entirely as [Bt,1,N] row vectors: t1 = y^T W,
    # alpha^T = t1 W^T; quad = y^T K^{-1} y = y . alpha. No lane-width-1
    # column arrays anywhere (Mosaic layout inference rejects them), and
    # everything blockwise in [Bt,T,*] pieces re-sliced from scratch per
    # iteration — one [Bt,N,N] W value hoisted across the loop put ~150 MB
    # of vreg spills on top of the scratch (measured OOM at bt=16, N=512).
    kv_dims = (((2,), (2,)), ((0,), (0,)))      # A @ B^T (contract lanes)
    y_row = yt[:, None, :]                                        # [Bt,1,N]
    t1 = jnp.zeros((Bt, 1, N), f32)
    for rb in range(nb):
        r0 = rb * _T
        y_rb = jax.lax.slice_in_dim(y_row, r0, r0 + _T, axis=2)   # [Bt,1,T]
        w_rows = a_ref[:, r0:r0 + _T, woff:woff + N]              # [Bt,T,N]
        t1 = t1 + dot(y_rb, w_rows, dimension_numbers=bmm)
    alpha_rowvec = jnp.concatenate(
        [dot(t1, a_ref[:, ib * _T:(ib + 1) * _T, woff:woff + N],
             dimension_numbers=kv_dims) for ib in range(nb)],
        axis=2)                                                   # [Bt,1,N]
    quad = jnp.sum(y_row * alpha_rowvec, axis=2, keepdims=True)   # [Bt,1,1]

    def _reduce11(x):
        """[Bt,T,T] -> [Bt,1,1]: sublanes first, then lanes (single-axis
        full-width reductions only)."""
        return jnp.sum(jnp.sum(x, axis=1, keepdims=True), axis=2,
                       keepdims=True)

    def _lanes(v, c0):
        """[Bt,1,T] lane-slice of a [Bt,N] value."""
        return jax.lax.slice_in_dim(v, c0, c0 + _T, axis=1)[:, None, :]

    gls = [jnp.zeros((Bt, 1, 1), f32) for _ in range(d)]
    gsf2 = jnp.zeros((Bt, 1, 1), f32)
    gn = jnp.zeros((Bt, 1, 1), f32)
    sf2_t = sf2[:, :, None]
    diag_tt = jnp.where(
        lane_t == jax.lax.broadcasted_iota(jnp.int32, (1, _T, 1), 1),
        f32(1.0), f32(0.0))                                       # [1,T,T]
    for rb in range(nb):
        r0 = rb * _T
        arow = jnp.swapaxes(
            jax.lax.slice_in_dim(alpha_rowvec, r0, r0 + _T, axis=2),
            1, 2)                                                 # [Bt,T,1]
        m_r = _rows(m, r0)                                        # [Bt,T,1]
        for cb in range(nb):
            c0 = cb * _T
            w_r = a_ref[:, r0:r0 + _T, woff:woff + N]
            w_c = a_ref[:, c0:c0 + _T, woff:woff + N]
            kinv = dot(w_r, w_c, dimension_numbers=kv_dims)       # [Bt,T,T]
            acol = jax.lax.slice_in_dim(alpha_rowvec, c0, c0 + _T, axis=2)
            qp = kinv - arow * acol                               # [Bt,T,T]
            r2 = jnp.zeros((Bt, _T, _T), f32)
            q2s = []
            for j in range(d):
                ls_j = p_ref[:, j:j + 1]
                xj = xt_ref[:, j, :] / ls_j
                dj = _rows(xj, r0) - _lanes(xj, c0)               # [Bt,T,T]
                q2s.append(dj * dj * scale)
                r2 = r2 + q2s[j]
            phi = _phi(kernel, r2, f32)
            F = _phi_grad(kernel, r2, f32)
            mm = m_r * _lanes(m, c0)
            gsf2 = gsf2 + f32(0.5) * _reduce11(qp * (sf2_t * phi * mm))
            qf = qp * (sf2_t * F * mm)
            for j in range(d):
                gls[j] = gls[j] + f32(0.5) * _reduce11(qf * q2s[j])
            if rb == cb:
                gn = gn + f32(0.5) * _reduce11(qp * diag_tt * m_r)

    n_valid = jnp.sum(m, axis=1)[:, None, None]
    val = (f32(0.5) * quad + logdet
           + f32(0.5) * n_valid * f32(np.log(2.0 * np.pi)))

    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, _T), 1)
    o = jnp.where(lane1 == 0, val[:, 0, :], f32(0.0))
    for j in range(d):
        o = o + jnp.where(lane1 == 1 + j, gls[j][:, 0, :], f32(0.0))
    o = o + jnp.where(lane1 == 6, gsf2[:, 0, :], f32(0.0))
    o = o + jnp.where(lane1 == 7, gn[:, 0, :], f32(0.0))
    out_ref[:] = o


@functools.partial(jax.jit, static_argnames=("kernel", "d", "interpret"))
def _nlml_vg_call(xt, yt, p, *, kernel, d, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bp, _, N = xt.shape
    bt = _vg_group_size(N)
    G = Bp // bt
    kern = functools.partial(_vg_kernel, kernel=kernel, d=d, N=N)
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
        scratch_shapes=[pltpu.VMEM((bt, N, 2 * N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xt, yt, p)
    return out


def nlml_vg_batched(params, X, y, maskf, kernel, jitter, interpret=None):
    """Batched NLML value AND gradient via the fused kernel.

    Same inputs as nlml_value_batched. Returns (val [B], grads) where grads
    is a dict matching the params leaves: d/d lengthscales [B, d_in],
    d/d kernel_variance [B], d/d likelihood_variance [B] — raw-parameter
    gradients equal to autodiff through ops.gpr.nlml_fused (f32 tolerance).
    """
    if interpret is None:
        interpret = _INTERPRET
    B, N, D = X.shape
    f32 = jnp.float32
    N_pad = int(-(-N // _T) * _T)
    bt = _vg_group_size(N_pad)
    B_pad = int(-(-B // bt) * bt)

    Xf = jnp.asarray(X, f32)
    mf = jnp.asarray(maskf, f32)
    yf = jnp.asarray(y, f32) * mf

    xt = jnp.zeros((B, 8, N_pad), f32)
    xt = xt.at[:, :D, :N].set(jnp.swapaxes(Xf, 1, 2))
    xt = xt.at[:, 7, :N].set(mf)
    yt = jnp.zeros((B, N_pad), f32)
    yt = yt.at[:, :N].set(yf)

    ls_in = jnp.asarray(params["lengthscales"], f32).reshape(B, -1)
    scalar_ls = ls_in.shape[1] == 1 and D > 1
    ls = jnp.broadcast_to(ls_in, (B, D)) if scalar_ls else ls_in
    sf2 = jnp.asarray(params["kernel_variance"], f32).reshape(B)
    sn2 = jnp.asarray(params["likelihood_variance"], f32).reshape(B)
    p = jnp.zeros((B, 8), f32)
    p = p.at[:, :D].set(ls)
    p = p.at[:, 5].set(sf2)
    p = p.at[:, 6].set(sn2 + f32(jitter))

    if B_pad != B:
        pad = B_pad - B
        xt = jnp.concatenate([xt, jnp.zeros((pad, 8, N_pad), f32)], axis=0)
        yt = jnp.concatenate([yt, jnp.zeros((pad, N_pad), f32)], axis=0)
        p_tail = jnp.zeros((pad, 8), f32).at[:, :D].set(1.0)
        p_tail = p_tail.at[:, 5].set(1.0).at[:, 6].set(1.0)
        p = jnp.concatenate([p, p_tail], axis=0)

    out = _nlml_vg_call(xt, yt, p, kernel=kernel, d=D,
                        interpret=interpret)[:B]
    val = out[:, 0]
    g_logls = out[:, 1:1 + D]                   # d/d log(ls_j)
    g_ls = g_logls / ls                         # raw-parameter gradient
    if scalar_ls:
        g_ls = jnp.sum(g_ls, axis=1, keepdims=True)
    g_ls = g_ls.reshape(jnp.asarray(params["lengthscales"]).shape)
    g_sf2 = (out[:, 6] / sf2).reshape(
        jnp.asarray(params["kernel_variance"]).shape)
    g_sn2 = out[:, 7].reshape(
        jnp.asarray(params["likelihood_variance"]).shape)
    grads = {"lengthscales": g_ls, "kernel_variance": g_sf2,
             "likelihood_variance": g_sn2}
    return val, grads
