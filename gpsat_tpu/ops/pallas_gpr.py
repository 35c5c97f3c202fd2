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
           "pallas_vg_supported", "nlml_vg_batched",
           "pallas_predict_supported", "posterior_predict_batched"]

_T = 128           # panel height = MXU/VPU tile
_P = 32            # factorisation slab height (vg kernel)
_MAX_D = 5
_VMEM_BUDGET = 40 * 2**20   # bytes for the A scratch per grid step
_VMEM_LIMIT = 116 * 2**20   # Mosaic scoped-vmem limit (v5e has 128 MiB;
                            # bt=40 value kernel needs ~103 MiB scoped)
_MAX_GROUP = 24             # experts per grid step (measured optimum: bt=24
                            # 4.23 ms/eval vs bt=40 4.51 — per-step work
                            # scales with Bt and beats the grid-step saving)

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


def _pad_t(n):
    """Round up to the 128-lane panel size."""
    return int(-(-int(n) // _T) * _T)


def _fits_vmem(per_expert_scratch, io_per_expert):
    """True when the minimum group (bt=8, the Mosaic sublane floor) fits the
    scoped-VMEM limit: scratch + double-buffered IO blocks + margin. The
    group-size helpers floor bt at 8, so any shape failing this check would
    crash Mosaic compilation at runtime instead of falling back to XLA
    (advisor finding: _pred_group_size at N_pad=1024, P_pad>~1660)."""
    margin = 4 * 2**20
    return 8 * (per_expert_scratch + 2 * io_per_expert) + margin <= _VMEM_LIMIT


def _value_scratch_per_expert(N):
    return N * (N + 2 * _T) * 4


def _value_io_per_expert(N):
    return (8 * N + N + 8 + _T) * 4          # xt + yt + p + out


def pallas_value_supported(kernel, d, N=None):
    """Can the fused kernel handle this configuration on this platform?"""
    import os
    if os.environ.get("GPSAT_DISABLE_PALLAS_VALUE"):
        return False
    if kernel not in _KERNELS or d > _MAX_D:
        return False
    if N is not None and not _fits_vmem(_value_scratch_per_expert(_pad_t(N)),
                                        _value_io_per_expert(_pad_t(N))):
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
    """Experts per grid step, sized so the [Bt, N, N+2T] scratch (A + y
    border + tile-inverse workspace) fits the VMEM budget. Bt must be a
    multiple of 8 (Mosaic block-shape sublane constraint)."""
    per = _value_scratch_per_expert(N)
    bt = max(8, int(_VMEM_BUDGET // per) // 8 * 8)
    return int(min(bt, _MAX_GROUP))


def _factor_tile_and_invert(a_ref, base, winv, logdet, Bt, rbase=None,
                            w_ref=None):
    """Factor the TxT diagonal tile of A (rows [rbase, rbase+T), lanes
    [base, base+T); rbase defaults to base for matrices stored at lane
    offset 0) in place to its upper Cholesky factor U_kk, and write
    W = U_kk^{-1} at lanes [winv, winv+T) of `w_ref` (defaults to a_ref:
    the factor workspace and the inverse strip may live in separate refs,
    e.g. the cholinv kernel factors in its INPUT window and keeps only a
    [Bt, M, T] strip in scratch). Returns the updated logdet [Bt,1,1]
    accumulator.

    Structure (every sequential step is as light as possible; bulk work on
    the MXU):
      1. _P-row slab factorisation: the column loop touches only [Bt,P,T]
         (row extraction/writes via iota masks on STATIC slab loads — a
         dynamic sublane index with a partial lane slice is an "unaligned
         dynamic load" Mosaic refuses to lower); each slab's rank-P update
         of the rows below is ONE MXU matmul.
      2. invert all 16 8x8 diagonal leaves in parallel (masked row sweep,
         8 steps — each handles row il of EVERY leaf at once).
      3. combine bottom-up at 8-block granularity:
         W[blk i] = D_i^{-1}(E_i - F[i, i+1:] @ W[i+1:]). (The nilpotent
         Neumann product (I-M)(I-M^2)(I-M^4)(I-M^8)D^{-1} needs fewer
         steps but M^8 overflows f32 on ill-conditioned tiles.)
    The [winv, winv+T) region MUST be zero (or at least finite) on entry:
    the masked recurrences multiply not-yet-written rows by zero, and
    0 * garbage-NaN = NaN. The combine leaves exact zeros below the
    diagonal.
    """
    rb0 = base if rbase is None else rbase
    wr = a_ref if w_ref is None else w_ref
    f32 = jnp.float32
    dot = functools.partial(jax.lax.dot_general,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=f32)
    bmm = (((2,), (1,)), ((0,), (0,)))          # [Bt,a,k] @ [Bt,k,b]
    bmm_t = (((1,), (1,)), ((0,), (0,)))        # [Bt,k,a]^T @ [Bt,k,b]
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _T), 2)
    sub_t = jax.lax.broadcasted_iota(jnp.int32, (1, _T, 1), 1)
    sub_p = jax.lax.broadcasted_iota(jnp.int32, (1, _P, 1), 1)
    diag_tt = jnp.where(
        lane_t == jax.lax.broadcasted_iota(jnp.int32, (1, _T, 1), 1),
        f32(1.0), f32(0.0))
    # lax.div, NOT the // operator: jnp.floor_divide is itself jitted, and
    # the resulting closed_call inside the kernel jaxpr sends Mosaic's
    # lowering into infinite recursion (RecursionError at compile time)
    eight = jnp.int32(8)
    sub_blk = jax.lax.div(sub_t, eight)
    lane_blk = jax.lax.div(lane_t, eight)
    same_leaf = sub_blk == lane_blk
    lane_mod = jax.lax.rem(lane_t, eight)
    sub_mod = jax.lax.rem(sub_t, eight)

    # per-slab masks at P granularity (the round-5 restructure: the column
    # loop factors only the [Bt,P,P] DIAGONAL block as a fori carry — the
    # original swept the whole [Bt,P,T] slab per column, and the loop is
    # VPU-throughput-bound, measured: bt=32 single-grid-step cholinv ran
    # no faster than 2x bt=16 steps. The slab's trailing lanes are then
    # one MXU trsm against the block inverse, which the leaf machinery
    # below already knows how to build at 8-granularity.)
    lane_p = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _P), 2)
    sub_pp = jax.lax.broadcasted_iota(jnp.int32, (1, _P, 1), 1)
    diag_pp = jnp.where(lane_p == sub_pp, f32(1.0), f32(0.0))
    sub_blk8 = jax.lax.div(sub_pp, eight)
    lane_blk8 = jax.lax.div(lane_p, eight)
    same_leaf8 = sub_blk8 == lane_blk8
    lane_mod8 = jax.lax.rem(lane_p, eight)
    sub_mod8 = jax.lax.rem(sub_pp, eight)

    for pb in range(_T // _P):
        p0 = pb * _P
        blk0 = a_ref[:, rb0 + p0:rb0 + p0 + _P,
                     base + p0:base + p0 + _P]           # [Bt,P,P]

        def colp(jl, carry):
            blk, ld = carry
            rowmask = sub_pp == jl
            row = jnp.sum(jnp.where(rowmask, blk, f32(0.0)),
                          axis=1, keepdims=True)         # [Bt,1,P]
            piv2 = jnp.sum(jnp.where(lane_p == jl, row, f32(0.0)),
                           axis=2, keepdims=True)
            piv = jnp.sqrt(piv2)
            u = (row / piv) * jnp.where(lane_p >= jl, f32(1.0), f32(0.0))
            coef = jnp.swapaxes(u, 1, 2)                 # [Bt,P,1]
            rmask = jnp.where(sub_pp > jl, f32(1.0), f32(0.0))
            blk = jnp.where(rowmask, u + jnp.zeros((Bt, _P, _P), f32),
                            blk - (coef * rmask) * u)
            return blk, ld + jnp.log(piv)

        blk, logdet = jax.lax.fori_loop(jnp.int32(0), jnp.int32(_P),
                                        colp, (blk0, logdet))

        # W_PP = U_PP^{-1}: parallel 8x8 leaf inverses + bottom-up block
        # combine + one Newton polish (same scheme as the T-tile inverse)
        uii = jnp.sum(jnp.where(diag_pp > 0, blk, f32(0.0)),
                      axis=2, keepdims=True)             # [Bt,P,1]

        def leafp(t, wd):
            il = jnp.int32(7) - t
            rowsel = sub_mod8 == il
            umask = rowsel & same_leaf8 & (lane_mod8 > il)
            s = dot(jnp.where(umask, blk, f32(0.0)), wd,
                    dimension_numbers=bmm)
            wnew = (diag_pp - s) / uii
            return jnp.where(rowsel, wnew, wd)

        wd = jax.lax.fori_loop(jnp.int32(0), jnp.int32(8), leafp,
                               jnp.zeros((Bt, _P, _P), f32))

        def blkp(t, wd):
            i = jnp.int32(_P // 8 - 1) - t
            rowsel = sub_blk8 == i
            fmask = rowsel & (lane_blk8 > i)
            s = dot(jnp.where(fmask, blk, f32(0.0)), wd,
                    dimension_numbers=bmm)
            wnew = dot(jnp.where(same_leaf8, wd, f32(0.0)), diag_pp - s,
                       dimension_numbers=bmm)
            return jnp.where(rowsel, wnew, wd)

        wd = jax.lax.fori_loop(jnp.int32(0), jnp.int32(_P // 8), blkp, wd)
        uw = dot(blk, wd, dimension_numbers=bmm)         # blk lower is 0
        wd = wd + dot(wd, diag_pp - uw, dimension_numbers=bmm)

        a_ref[:, rb0 + p0:rb0 + p0 + _P,
              base + p0:base + p0 + _P] = blk
        if p0 + _P < _T:
            # slab trailing lanes: U_rest = W_PP^T A_rest (one MXU trsm);
            # the slab's leading lanes [0, p0) keep stale values — every
            # downstream read masks/slices the upper triangle
            arest = a_ref[:, rb0 + p0:rb0 + p0 + _P,
                          base + p0 + _P:base + _T]      # [Bt,P,T-p0-P]
            urest = dot(wd, arest, dimension_numbers=bmm_t)
            a_ref[:, rb0 + p0:rb0 + p0 + _P,
                  base + p0 + _P:base + _T] = urest
            ucols = a_ref[:, rb0 + p0:rb0 + p0 + _P,
                          base + p0 + _P:base + _T]
            g = dot(ucols, ucols, dimension_numbers=bmm_t)
            a_ref[:, rb0 + p0 + _P:rb0 + _T,
                  base + p0 + _P:base + _T] = (
                a_ref[:, rb0 + p0 + _P:rb0 + _T,
                      base + p0 + _P:base + _T] - g)

    utile = a_ref[:, rb0:rb0 + _T, base:base + _T]
    uii_rows = jnp.sum(jnp.where(diag_tt > 0, utile, f32(0.0)),
                       axis=2, keepdims=True)             # [Bt,T,1]

    def leaf_step(t, carry):
        il = jnp.int32(7) - t
        wd = wr[:, rb0:rb0 + _T, winv:winv + _T]
        ut = a_ref[:, rb0:rb0 + _T, base:base + _T]
        rowsel = sub_mod == il
        umask = rowsel & same_leaf & (lane_mod > il)
        s = dot(jnp.where(umask, ut, f32(0.0)), wd,
                dimension_numbers=bmm)                    # [Bt,T,T]
        wnew = (diag_tt - s) / uii_rows
        wr[:, rb0:rb0 + _T, winv:winv + _T] = \
            jnp.where(rowsel, wnew, wd)
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(8), leaf_step, jnp.int32(0))

    def blk_step(t, carry):
        i = jnp.int32(_T // 8 - 1) - t
        w = wr[:, rb0:rb0 + _T, winv:winv + _T]
        ut = a_ref[:, rb0:rb0 + _T, base:base + _T]
        rowsel = sub_blk == i
        fmask = rowsel & (lane_blk > i)
        s = dot(jnp.where(fmask, ut, f32(0.0)), w,
                dimension_numbers=bmm)                    # [Bt,T,T]
        wnew = dot(jnp.where(same_leaf, w, f32(0.0)), diag_tt - s,
                   dimension_numbers=bmm)
        wr[:, rb0:rb0 + _T, winv:winv + _T] = \
            jnp.where(rowsel, wnew, w)
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(_T // 8), blk_step,
                      jnp.int32(0))

    # one Newton step W <- W(2I - U W): quadratic error cleanup for the
    # masked-recurrence inverse (two MXU matmuls; the raw combine's noise
    # was enough to strand ill-conditioned experts at the L-BFGS iteration
    # cap via inaccurate trsm values / W-based gradients)
    w = wr[:, rb0:rb0 + _T, winv:winv + _T]
    ut = jnp.where(lane_t >= sub_t, a_ref[:, rb0:rb0 + _T,
                                          base:base + _T], f32(0.0))
    uw = dot(ut, w, dimension_numbers=bmm)
    wr[:, rb0:rb0 + _T, winv:winv + _T] = \
        w + dot(w, diag_tt - uw, dimension_numbers=bmm)
    return logdet


def _value_kernel(xt_ref, yt_ref, p_ref, out_ref, a_ref, *, kernel, d, N):
    """One grid step: Bt experts. xt_ref [Bt,8,N] coords (dim-major),
    yt_ref [Bt,N] masked obs, p_ref [Bt,8] params
    (ls_0..ls_{d-1}, sf2@5, noise_eff@6, n_valid@7... see wrapper),
    out_ref [Bt,128] value broadcast, a_ref [Bt,N,N+2T] scratch
    (A | y border | tile-inverse workspace)."""
    from jax.experimental import pallas as pl

    f32 = jnp.float32
    Bt = a_ref.shape[0]
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
        # border: lane N carries y~, lanes N+1..N+T are zero; the
        # tile-inverse workspace beyond must be zeroed too — the masked
        # recurrences in _factor_tile_and_invert multiply unwritten rows
        # by zero, and 0 * garbage-NaN = NaN
        a_ref[:, r0:r0 + _T, N:N + _T] = _rows(yt, r0) * border01
        a_ref[:, r0:r0 + _T, N + _T:] = jnp.zeros((Bt, _T, _T), f32)

    # ---- blocked factorisation (tile factor + tile-inverse trsm) -------
    # i32 loop bounds everywhere: under jax_enable_x64 (on at package
    # import) static-bound fori_loops scan with an i64 counter, and
    # Mosaic's i64->i32 cast lowering recurses infinitely at compile time.
    # All matmuls use Precision.HIGHEST (MXU f32 passes): the default
    # single-pass bf16 matmul costs ~3e-3 relative error in the NLML
    # (measured; the XLA f32 path is ~1e-5 vs f64).
    logdet = jnp.zeros((Bt, 1, 1), f32)
    dot = functools.partial(jax.lax.dot_general,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=f32)
    bmm_t = (((1,), (1,)), ((0,), (0,)))        # [Bt,k,a]^T @ [Bt,k,b]
    winv = N + _T                               # tile-inverse workspace

    for kb in range(nb):
        base = kb * _T
        logdet = _factor_tile_and_invert(a_ref, base, winv, logdet, Bt)

        # trsm via the tile inverse: U_k,rest = W_kk^T @ A_k,rest
        # (rest = trailing A columns + the y border)
        wkk = a_ref[:, base:base + _T, winv:winv + _T]
        arest = a_ref[:, base:base + _T, base + _T:N + _T]
        urest = dot(wkk, arest, dimension_numbers=bmm_t)     # [Bt,T,R]
        a_ref[:, base:base + _T, base + _T:N + _T] = urest

        # trailing row blocks: A[ib, ib:] -= U[kb, ib]^T @ U[kb, ib:]
        for ib in range(kb + 1, nb):
            u_ki = a_ref[:, base:base + _T, ib * _T:(ib + 1) * _T]
            u_krest = a_ref[:, base:base + _T, ib * _T:N + _T]
            g = dot(u_ki, u_krest, dimension_numbers=bmm_t)  # [Bt,T,W_ib]
            a_ref[:, ib * _T:(ib + 1) * _T, ib * _T:N + _T] = (
                a_ref[:, ib * _T:(ib + 1) * _T, ib * _T:N + _T] - g)

    # quad = z^T z from the border column (lane 0 of the border block)
    quad = jnp.zeros((Bt, 1, 1), f32)
    lane0 = jnp.where(lane_t == 0, f32(1.0), f32(0.0))
    for rb in range(nb):
        r0 = rb * _T
        bb = a_ref[:, r0:r0 + _T, N:N + _T]                  # [Bt,T,T]
        zsq = bb * bb * lane0
        quad = quad + jnp.sum(jnp.sum(zsq, axis=1, keepdims=True),
                              axis=2, keepdims=True)

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
        scratch_shapes=[pltpu.VMEM((bt, N, N + 2 * _T), jnp.float32)],
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
    import os
    if os.environ.get("GPSAT_DISABLE_PALLAS_VG"):
        return False
    if not pallas_value_supported(kernel, d, N):
        return False
    if N is not None:
        Np = _pad_t(N)
        if Np > 1024:
            return False
        if not _fits_vmem(Np * 2 * Np * 4, _value_io_per_expert(Np)):
            return False
    return True


_VG_VMEM_BUDGET = 50 * 2**20   # scratch; Mosaic vreg spills need the rest
                               # (the dep chain in the gradient loop keeps
                               # the spill set bounded — without it the 16
                               # dependence-free (rb,cb) iterations get
                               # interleaved and spill ~140 MB at bt=16)


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

    def _dep(v, lanes):
        """[Bt,1,1] zero-dep -> [Bt,1,lanes]: Mosaic has no simultaneous
        sublane+lane broadcast, so widen lanes first; the subsequent add
        against [Bt,T,lanes] is a plain sublane broadcast."""
        return v + jnp.zeros((Bt, 1, lanes), f32)

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
    # dep_b serialises the row-panel iterations (no data deps otherwise →
    # the scheduler interleaves all nb, keeping ~5 [Bt,T,N] panels live
    # EACH → vreg spills that blow the VMEM budget; cf. the gradient loop)
    dep_b = jnp.zeros((Bt, 1, 1), f32)
    for rb in range(nb):
        r0 = rb * _T
        sub_abs = jax.lax.broadcasted_iota(jnp.int32, (1, _T, 1), 1) + r0
        K = sf2[:, :, None] * _phi(kernel, _dist_panel(r0), f32) \
            + _dep(dep_b, N)
        mm = _rows(m, r0) * m[:, None, :]
        dterm = jnp.where(lane_n == sub_abs,
                          _rows(diagv, r0)
                          + jnp.zeros((Bt, _T, N), f32), f32(0.0))
        tile = K * mm + dterm
        a_ref[:, r0:r0 + _T, :N] = tile
        a_ref[:, r0:r0 + _T, woff:] = jnp.zeros((Bt, _T, N), f32)
        dep_b = tile[:, :1, :1] * f32(0.0)

    # ---- blocked factorisation + tile inverses --------------------------
    logdet = jnp.zeros((Bt, 1, 1), f32)
    dot = functools.partial(jax.lax.dot_general,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=f32)
    bmm = (((2,), (1,)), ((0,), (0,)))          # [Bt,a,k] @ [Bt,k,b]
    bmm_t = (((1,), (1,)), ((0,), (0,)))        # [Bt,k,a]^T @ [Bt,k,b]

    for kb in range(nb):
        base = kb * _T
        logdet = _factor_tile_and_invert(a_ref, base, woff + base, logdet,
                                         Bt)

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
    # dep_w serialises the (jb,i) iterations (see the build loop note)
    dep_w = jnp.zeros((Bt, 1, 1), f32)
    for jb in range(nb):
        wj = woff + jb * _T
        for i in range(jb - 1, -1, -1):
            acc = jnp.zeros((Bt, _T, _T), f32) + _dep(dep_w, _T)
            for k in range(i + 1, jb + 1):
                u_ik = a_ref[:, i * _T:(i + 1) * _T, k * _T:(k + 1) * _T]
                w_kj = a_ref[:, k * _T:(k + 1) * _T, wj:wj + _T]
                acc = acc + dot(u_ik, w_kj, dimension_numbers=bmm)
            w_ii = a_ref[:, i * _T:(i + 1) * _T,
                         woff + i * _T:woff + (i + 1) * _T]
            wij = -dot(w_ii, acc, dimension_numbers=bmm)
            a_ref[:, i * _T:(i + 1) * _T, wj:wj + _T] = wij
            dep_w = wij[:, :1, :1] * f32(0.0)

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
    dep_t = jnp.zeros((Bt, 1, 1), f32)
    for rb in range(nb):
        r0 = rb * _T
        y_rb = jax.lax.slice_in_dim(y_row, r0, r0 + _T, axis=2)   # [Bt,1,T]
        w_rows = a_ref[:, r0:r0 + _T, woff:woff + N] \
            + _dep(dep_t, N)                                          # [Bt,T,N]
        t1 = t1 + dot(y_rb, w_rows, dimension_numbers=bmm)
        dep_t = t1[:, :1, :1] * f32(0.0)
    pieces = []
    for ib in range(nb):
        w_rows = a_ref[:, ib * _T:(ib + 1) * _T, woff:woff + N] \
            + _dep(dep_t, N)
        pieces.append(dot(t1, w_rows, dimension_numbers=kv_dims))
        dep_t = pieces[-1][:, :1, :1] * f32(0.0)
    alpha_rowvec = jnp.concatenate(pieces, axis=2)                # [Bt,1,N]
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
    # The (rb,cb) iterations share no data, so the scheduler otherwise
    # interleaves them all, keeping every [Bt,T,N] W-panel load live at
    # once (~90-140 MB of vreg spills; measured: without this loop bt=24
    # fits, with it OOMs — and `*0` dep-adds get folded away). Serialise
    # through an effect-ordered MAILBOX in the dead A region: each
    # iteration stores its accumulator there, and the next iteration's
    # panel loads are gated on reading it back via a jnp.where (a NaN
    # accumulator zeroes only its own already-NaN expert's panels).
    # Q = K^{-1} - alpha alpha^T, dK and the distance panels are all
    # symmetric in (rb, cb), so only the upper tile pairs run, with the
    # off-diagonal contributions counted twice — drops the gradient pass
    # from nb^2 to nb(nb+1)/2 tile iterations (the SGPR mega-kernel's P6
    # trick, round 5: 16 -> 10 kinv matmuls + panel builds at N=512).
    a_ref[:, 0:1, :N] = jnp.zeros((Bt, 1, N), f32)
    for rb in range(nb):
        r0 = rb * _T
        arow = jnp.swapaxes(
            jax.lax.slice_in_dim(alpha_rowvec, r0, r0 + _T, axis=2),
            1, 2)                                                 # [Bt,T,1]
        m_r = _rows(m, r0)                                        # [Bt,T,1]
        for cb in range(rb, nb):
            c0 = cb * _T
            wsym = f32(0.5 if cb == rb else 1.0)
            mbox = a_ref[:, 0:1, :N]                              # [Bt,1,N]
            gate = mbox == mbox
            w_r = jnp.where(gate, a_ref[:, r0:r0 + _T, woff:woff + N],
                            f32(0.0))
            w_c = jnp.where(gate, a_ref[:, c0:c0 + _T, woff:woff + N],
                            f32(0.0))
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
            gsf2 = gsf2 + wsym * _reduce11(qp * (sf2_t * phi * mm))
            qf = qp * (sf2_t * F * mm)
            for j in range(d):
                gls[j] = gls[j] + wsym * _reduce11(qf * q2s[j])
            if rb == cb:
                gn = gn + f32(0.5) * _reduce11(qp * diag_tt * m_r)
            a_ref[:, 0:1, :N] = gsf2 + jnp.zeros((Bt, 1, N), f32)

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


# ---------------------------------------------------------------------------
# fused posterior prediction kernel
# ---------------------------------------------------------------------------
#
# mean = Ks^T alpha and var_f = sf2 - ||W^T ks_p||^2 for every prediction
# point, with alpha = W W^T y and W = U^{-1} from the same tile machinery as
# the vg kernel (reference math: GPSat/models/gpflow_models.py:187-273 via
# gpflow predict_f; XLA path: ops/gpr.predict). The XLA prediction phase was
# ~40% of the bench sweep (batched Cholesky + triangular solves are latency
# chains); here everything after the build is MXU matmuls on VMEM-resident
# blocks. Kst (data rows x prediction lanes) is staged in scratch so the
# mean row and the blocked variance reduction both read it without rebuilds.


def pallas_predict_supported(kernel, d, N=None, P=None):
    """Can the fused prediction kernel handle this configuration?"""
    import os
    if os.environ.get("GPSAT_DISABLE_PALLAS_PREDICT"):
        return False
    if not pallas_value_supported(kernel, d, N):
        return False
    if N is not None and _pad_t(N) > 1024:
        return False
    if P is not None and _pad_t(P) > 2048:
        return False
    if N is not None and P is not None:
        Np, Pp = _pad_t(N), _pad_t(P)
        scratch = Np * (2 * Np + Pp) * 4
        io = _value_io_per_expert(Np) + (8 * Pp + 2 * Pp) * 4   # + xs, mean, var
        if not _fits_vmem(scratch, io):
            return False
    return True


_PRED_VMEM_BUDGET = 26 * 2**20


def _pred_group_size(N, Pp):
    """Experts per grid step: scratch is [Bt, N, 2N + Pp] (U | W | Kst)."""
    per = N * (2 * N + Pp) * 4
    bt = int(_PRED_VMEM_BUDGET // per) // 8 * 8
    return int(min(max(8, bt), _MAX_GROUP))


def _predict_kernel(xt_ref, yt_ref, p_ref, xs_ref, mean_ref, var_ref, a_ref,
                    *, kernel, d, N, Pp):
    """One grid step: Bt experts. xt_ref/yt_ref/p_ref as _vg_kernel;
    xs_ref [Bt,8,Pp] prediction coords (dim-major). mean_ref/var_ref
    [Bt,Pp]. a_ref [Bt,N,2N+Pp]: [0,N) A->U, [N,2N) W, [2N,2N+Pp) Kst."""
    f32 = jnp.float32
    Bt = a_ref.shape[0]
    woff = N
    koff = 2 * N
    nb = N // _T
    scale = f32(_KERNELS[kernel])

    lane_n = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N), 2)
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _T), 2)

    yt = yt_ref[:]
    m = xt_ref[:, 7, :]
    sf2 = p_ref[:, 5:6]
    noise = p_ref[:, 6:7]
    diagv = m * (noise + f32(-1.0)) + f32(1.0)

    def _rows(v, r0):
        return jax.lax.slice_in_dim(v, r0, r0 + _T, axis=1)[:, :, None]

    def _dep(v, lanes):
        return v + jnp.zeros((Bt, 1, lanes), f32)

    dot = functools.partial(jax.lax.dot_general,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=f32)
    bmm = (((2,), (1,)), ((0,), (0,)))
    bmm_t = (((1,), (1,)), ((0,), (0,)))
    kv_dims = (((2,), (2,)), ((0,), (0,)))

    # ---- build A + zeroed W region (dep-chained, cf. _vg_kernel) --------
    dep_b = jnp.zeros((Bt, 1, 1), f32)
    for rb in range(nb):
        r0 = rb * _T
        sub_abs = jax.lax.broadcasted_iota(jnp.int32, (1, _T, 1), 1) + r0
        r2 = jnp.zeros((Bt, _T, N), f32)
        for j in range(d):
            ls_j = p_ref[:, j:j + 1]
            xj = xt_ref[:, j, :] / ls_j
            dj = _rows(xj, r0) - xj[:, None, :]
            r2 = r2 + dj * dj
        K = sf2[:, :, None] * _phi(kernel, r2 * scale, f32) + _dep(dep_b, N)
        mm = _rows(m, r0) * m[:, None, :]
        dterm = jnp.where(lane_n == sub_abs,
                          _rows(diagv, r0)
                          + jnp.zeros((Bt, _T, N), f32), f32(0.0))
        tile = K * mm + dterm
        a_ref[:, r0:r0 + _T, :N] = tile
        a_ref[:, r0:r0 + _T, woff:woff + N] = jnp.zeros((Bt, _T, N), f32)
        dep_b = tile[:, :1, :1] * f32(0.0)

    # ---- factor + tile inverses + trsm + trailing (cf. _vg_kernel) ------
    logdet = jnp.zeros((Bt, 1, 1), f32)
    for kb in range(nb):
        base = kb * _T
        logdet = _factor_tile_and_invert(a_ref, base, woff + base, logdet,
                                         Bt)
        if base + _T < N:
            wkk = a_ref[:, base:base + _T, woff + base:woff + base + _T]
            arest = a_ref[:, base:base + _T, base + _T:N]
            urest = dot(wkk, arest, dimension_numbers=bmm_t)
            a_ref[:, base:base + _T, base + _T:N] = urest
        for ib in range(kb + 1, nb):
            u_ki = a_ref[:, base:base + _T, ib * _T:(ib + 1) * _T]
            u_krest = a_ref[:, base:base + _T, ib * _T:N]
            g = dot(u_ki, u_krest, dimension_numbers=bmm_t)
            a_ref[:, ib * _T:(ib + 1) * _T, ib * _T:N] = (
                a_ref[:, ib * _T:(ib + 1) * _T, ib * _T:N] - g)

    # ---- off-diagonal W blocks (cf. _vg_kernel) --------------------------
    dep_w = jnp.zeros((Bt, 1, 1), f32)
    for jb in range(nb):
        wj = woff + jb * _T
        for i in range(jb - 1, -1, -1):
            acc = jnp.zeros((Bt, _T, _T), f32) + _dep(dep_w, _T)
            for k in range(i + 1, jb + 1):
                u_ik = a_ref[:, i * _T:(i + 1) * _T, k * _T:(k + 1) * _T]
                w_kj = a_ref[:, k * _T:(k + 1) * _T, wj:wj + _T]
                acc = acc + dot(u_ik, w_kj, dimension_numbers=bmm)
            w_ii = a_ref[:, i * _T:(i + 1) * _T,
                         woff + i * _T:woff + (i + 1) * _T]
            wij = -dot(w_ii, acc, dimension_numbers=bmm)
            a_ref[:, i * _T:(i + 1) * _T, wj:wj + _T] = wij
            dep_w = wij[:, :1, :1] * f32(0.0)

    # ---- alpha row (cf. _vg_kernel) --------------------------------------
    y_row = yt[:, None, :]
    t1 = jnp.zeros((Bt, 1, N), f32)
    dep_t = jnp.zeros((Bt, 1, 1), f32)
    for rb in range(nb):
        r0 = rb * _T
        y_rb = jax.lax.slice_in_dim(y_row, r0, r0 + _T, axis=2)
        w_rows = a_ref[:, r0:r0 + _T, woff:woff + N] + _dep(dep_t, N)
        t1 = t1 + dot(y_rb, w_rows, dimension_numbers=bmm)
        dep_t = t1[:, :1, :1] * f32(0.0)
    pieces = []
    for ib in range(nb):
        w_rows = a_ref[:, ib * _T:(ib + 1) * _T, woff:woff + N] \
            + _dep(dep_t, N)
        pieces.append(dot(t1, w_rows, dimension_numbers=kv_dims))
        dep_t = pieces[-1][:, :1, :1] * f32(0.0)
    alpha_rowvec = jnp.concatenate(pieces, axis=2)                # [Bt,1,N]

    # ---- Kst panels into scratch (data rows x prediction lanes) ---------
    dep_k = dep_t
    for rb in range(nb):
        r0 = rb * _T
        r2 = jnp.zeros((Bt, _T, Pp), f32)
        for j in range(d):
            ls_j = p_ref[:, j:j + 1]
            xj = xt_ref[:, j, :] / ls_j
            sj = xs_ref[:, j, :] / ls_j                           # [Bt,Pp]
            dj = _rows(xj, r0) - sj[:, None, :]
            r2 = r2 + dj * dj
        kst = (sf2[:, :, None] * _phi(kernel, r2 * scale, f32)
               * _rows(m, r0)) + _dep(dep_k, Pp)
        a_ref[:, r0:r0 + _T, koff:koff + Pp] = kst
        dep_k = kst[:, :1, :1] * f32(0.0)

    # ---- mean row --------------------------------------------------------
    mean_row = jnp.zeros((Bt, 1, Pp), f32)
    for rb in range(nb):
        r0 = rb * _T
        a_rb = jax.lax.slice_in_dim(alpha_rowvec, r0, r0 + _T, axis=2)
        kst_rb = a_ref[:, r0:r0 + _T, koff:koff + Pp]
        mean_row = mean_row + dot(a_rb, kst_rb, dimension_numbers=bmm)

    # ---- variance: sum over T1 = W^T Kst row panels ----------------------
    # the (nb_n, rb) block pairs share no data; a mailbox in the dead A
    # region serialises the nb_n groups (cf. the vg kernel's gradient loop)
    a_ref[:, 0:1, 0:_T] = jnp.zeros((Bt, 1, _T), f32)
    var_acc = jnp.zeros((Bt, 1, Pp), f32)
    for nb_n in range(nb):
        mbox = a_ref[:, 0:1, 0:_T]
        gate = mbox == mbox
        t1p = jnp.zeros((Bt, _T, Pp), f32)
        for rb in range(nb):
            w_blk = jnp.where(
                gate, a_ref[:, rb * _T:(rb + 1) * _T,
                            woff + nb_n * _T:woff + (nb_n + 1) * _T],
                f32(0.0))
            kst_rb = a_ref[:, rb * _T:(rb + 1) * _T, koff:koff + Pp]
            t1p = t1p + dot(w_blk, kst_rb, dimension_numbers=bmm_t)
        var_acc = var_acc + jnp.sum(t1p * t1p, axis=1, keepdims=True)
        a_ref[:, 0:1, 0:_T] = var_acc[:, :, :1] + jnp.zeros((Bt, 1, _T),
                                                            f32)

    var_row = sf2[:, :, None] - var_acc
    mean_ref[:] = mean_row[:, 0, :] + jnp.zeros((Bt, Pp), f32)
    var_ref[:] = var_row[:, 0, :] + jnp.zeros((Bt, Pp), f32)


@functools.partial(jax.jit, static_argnames=("kernel", "d", "interpret"))
def _predict_call(xt, yt, p, xs, *, kernel, d, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bp, _, N = xt.shape
    Pp = xs.shape[2]
    bt = _pred_group_size(N, Pp)
    G = Bp // bt
    kern = functools.partial(_predict_kernel, kernel=kernel, d=d, N=N,
                             Pp=Pp)
    z = np.int32(0)
    mean, var = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((Bp, Pp), jnp.float32),
                   jax.ShapeDtypeStruct((Bp, Pp), jnp.float32)),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((bt, 8, N), lambda i: (i, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, N), lambda i: (i, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 8), lambda i: (i, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 8, Pp), lambda i: (i, z, z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((bt, Pp), lambda i: (i, z),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bt, Pp), lambda i: (i, z),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((bt, N, 2 * N + Pp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xt, yt, p, xs)
    return mean, var


def posterior_predict_batched(params, X, y, maskf, Xs, kernel, jitter,
                              interpret=None):
    """Batched posterior prediction via the fused kernel.

    params/X/y/maskf as nlml_vg_batched; Xs [B, P, D]. Returns the
    prediction dict of ops.gpr.predict: 'f*' [B, P], 'f*_var' (clamped >= 0)
    and 'y_var' = f*_var + likelihood_variance.
    """
    if interpret is None:
        interpret = _INTERPRET
    B, N, D = X.shape
    P = Xs.shape[1]
    f32 = jnp.float32
    N_pad = int(-(-N // _T) * _T)
    P_pad = int(-(-P // _T) * _T)
    bt = _pred_group_size(N_pad, P_pad)
    B_pad = int(-(-B // bt) * bt)

    Xf = jnp.asarray(X, f32)
    mf = jnp.asarray(maskf, f32)
    yf = jnp.asarray(y, f32) * mf

    xt = jnp.zeros((B, 8, N_pad), f32)
    xt = xt.at[:, :D, :N].set(jnp.swapaxes(Xf, 1, 2))
    xt = xt.at[:, 7, :N].set(mf)
    yt = jnp.zeros((B, N_pad), f32)
    yt = yt.at[:, :N].set(yf)
    xs = jnp.zeros((B, 8, P_pad), f32)
    xs = xs.at[:, :D, :P].set(jnp.swapaxes(jnp.asarray(Xs, f32), 1, 2))

    ls_in = jnp.asarray(params["lengthscales"], f32).reshape(B, -1)
    ls = jnp.broadcast_to(ls_in, (B, D)) if (ls_in.shape[1] == 1 and D > 1) \
        else ls_in
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
        xs = jnp.concatenate([xs, jnp.zeros((pad, 8, P_pad), f32)], axis=0)
        p_tail = jnp.zeros((pad, 8), f32).at[:, :D].set(1.0)
        p_tail = p_tail.at[:, 5].set(1.0).at[:, 6].set(1.0)
        p = jnp.concatenate([p, p_tail], axis=0)

    mean, var = _predict_call(xt, yt, p, xs, kernel=kernel, d=D,
                              interpret=interpret)
    f_var = jnp.maximum(var[:B, :P], 0.0)
    return {"f*": mean[:B, :P], "f*_var": f_var,
            "y_var": f_var + sn2[:, None]}
