"""Batched Cholesky + full triangular inverse in one Pallas kernel.

XLA's batched [B, M, M] Cholesky and triangular solves lower to ~M sequential
column steps whose per-step state round-trips HBM — pure latency on TPU
(measured ~6.6 ms at [69,400] f32, tpu_stuff/microbench_chain.py). This
kernel runs the blocked factorisation of ops/pallas_gpr (_factor_tile_and_
invert: 32-row slab columns + rank-32 MXU updates + parallel 8x8 leaf
inverses) and the W = U^{-1} off-diagonal block recurrence entirely in VMEM,
emitting:

    W  [B, M, M]  U^{-1} (upper triangular; A = U^T U)
    ld [B]        sum(log diag U) = 0.5 * logdet A

(U itself is not emitted: no consumer needs it — A-quadratic forms use A
directly — and dropping its output window buys the VMEM to double the
experts-per-grid-step, halving the kernel's dominant cost: the number of
sequential column-loop passes, one per grid step. Round 4 bought another
doubling the same way: W is accumulated directly in the OUTPUT window —
readable VMEM during a grid step — so the scratch keeps only A->U plus a
T-wide diag-block strip, [M, M+T] instead of [M, 2M].)

Everything *around* the factorisation (kernel-matrix builds, A~ = W^T Kuf,
B = I + A~A~^T/s2, gradient contractions) is plain batched matmuls that XLA
already runs at MXU speed — so this is deliberately the ONLY fused kernel on
the SGPR path, keeping Mosaic programs small (compile time scales badly with
unrolled program size; a monolithic SGPR kernel at the production shape
compiled for >50 min).

The input must be a *masked* SPD matrix: padded rows/columns zeroed with a
unit diagonal (they factor to identity and contribute log 1 = 0).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from gpsat_tpu.ops.pallas_gpr import (_T, _VMEM_LIMIT,
                                      _factor_tile_and_invert)

__all__ = ["cholinv_supported", "cholinv_batched"]

_CHOLINV_VMEM_BUDGET = 100 * 2**20

_INTERPRET = False
_FORCE_SUPPORTED = False


def cholinv_supported(M=None):
    import os
    if os.environ.get("GPSAT_DISABLE_PALLAS_CHOLINV"):
        return False
    if M is not None and (M % _T != 0 or M > 1024):
        return False
    if _FORCE_SUPPORTED:
        return True
    try:
        if jax.devices()[0].platform == "cpu":
            return False
    except Exception:  # pragma: no cover
        return False
    return True


def _group_size(M, B=None):
    """Experts per grid step. The kernel's dominant cost is the number of
    sequential column-loop passes — ONE per grid step — so the widest
    group that fits VMEM wins. Round 5 re-layout: A factors IN PLACE in
    the input window (mutations are discarded by pallas) and scratch
    keeps only the [M, T] per-panel W_kk strip, so per-expert VMEM is
    in M^2 + out M^2 + strip TM. When the whole batch fits one grid step
    (G=1) the windows are single-buffered and bt=32 at M=512 fits
    (~89 MB measured); at G>1 both windows double-buffer."""
    if B is not None:
        bt1 = int(min(32, -(-int(B) // 8) * 8))
        if bt1 >= B and bt1 * (2 * M * M + _T * M) * 4 <= 100 * 2**20:
            return bt1
    # G>1: both windows double-buffer; bt=24 at M=512 measured 116.11 MB
    # scoped (108 KB over the limit) — cap at 16
    per = (4 * M * M + _T * M) * 4
    bt = int((72 * 2**20) // per) // 8 * 8
    return int(min(max(8, bt), 16))


def _cholinv_kernel(a_in_ref, w_ref, ld_ref, strip_ref, *, M):
    """One grid step: Bt experts. a_in_ref [Bt,M,M] masked SPD input,
    factored to U IN PLACE (input-window mutations are discarded by
    pallas — this buys a whole [M, M] of scratch per expert, which buys
    the grid steps: the kernel's cost is one serial column-loop chain per
    step); w_ref [Bt,M,M] output, used as working storage for W (output
    windows are plain VMEM during a grid step); ld_ref [Bt,128] (lane 0 =
    sum log diag U); strip_ref [Bt,M,T] scratch (per-panel W_kk diag
    strip — _factor_tile_and_invert writes W_kk at rows
    [kb*T,(kb+1)*T), a distinct row range per panel, so the strip never
    needs re-zeroing after the initial pass)."""
    f32 = jnp.float32
    Bt = strip_ref.shape[0]
    mb = M // _T
    dot = functools.partial(jax.lax.dot_general,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=f32)
    bmm = (((2,), (1,)), ((0,), (0,)))
    bmm_t = (((1,), (1,)), ((0,), (0,)))

    # zero the strip and the W output (masked recurrences and the final
    # product must read zeros, not uninitialised NaNs); dep-chained so the
    # row-panel stores do not interleave
    dep = jnp.zeros((Bt, 1, 1), f32)
    for rb in range(mb):
        r0 = rb * _T
        z = jnp.zeros((Bt, _T, M), f32) + (dep + jnp.zeros((Bt, 1, M), f32))
        w_ref[:, r0:r0 + _T, :] = z
        strip_ref[:, r0:r0 + _T, :] = z[:, :, 0:_T]
        dep = z[:, :1, :1]

    ld = jnp.zeros((Bt, 1, 1), f32)
    # gate the first factor read on the zeroing pass (same-ref writes
    # order naturally; the strip/W zeroing must land first)
    mbox = w_ref[:, 0:1, 0:M]
    ld = ld + jnp.sum(mbox, axis=2, keepdims=True) * f32(0.0)
    for kb in range(mb):
        base = kb * _T
        ld = _factor_tile_and_invert(a_in_ref, base, 0, ld, Bt,
                                     rbase=base, w_ref=strip_ref)
        wkk = strip_ref[:, base:base + _T, 0:_T]
        w_ref[:, base:base + _T, base:base + _T] = wkk
        if base + _T < M:
            arest = a_in_ref[:, base:base + _T, base + _T:M]
            a_in_ref[:, base:base + _T, base + _T:M] = \
                dot(wkk, arest, dimension_numbers=bmm_t)
        for ib in range(kb + 1, mb):
            u_ki = a_in_ref[:, base:base + _T, ib * _T:(ib + 1) * _T]
            u_krest = a_in_ref[:, base:base + _T, ib * _T:M]
            g = dot(u_ki, u_krest, dimension_numbers=bmm_t)
            a_in_ref[:, ib * _T:(ib + 1) * _T, ib * _T:M] = (
                a_in_ref[:, ib * _T:(ib + 1) * _T, ib * _T:M] - g)

    # W off-diagonal blocks: W_ij = -W_ii sum_{i<k<=j} U_ik W_kj
    # (U from the input window, W blocks read/written in the output window)
    dep_w = jnp.zeros((Bt, 1, 1), f32)
    for jb in range(mb):
        wj = jb * _T
        for i in range(jb - 1, -1, -1):
            acc = jnp.zeros((Bt, _T, _T), f32) \
                + (dep_w + jnp.zeros((Bt, 1, _T), f32))
            for k2 in range(i + 1, jb + 1):
                u_ik = a_in_ref[:, i * _T:(i + 1) * _T,
                                k2 * _T:(k2 + 1) * _T]
                w_kj = w_ref[:, k2 * _T:(k2 + 1) * _T, wj:wj + _T]
                acc = acc + dot(u_ik, w_kj, dimension_numbers=bmm)
            w_ii = w_ref[:, i * _T:(i + 1) * _T, i * _T:(i + 1) * _T]
            wij = -dot(w_ii, acc, dimension_numbers=bmm)
            w_ref[:, i * _T:(i + 1) * _T, wj:wj + _T] = wij
            dep_w = wij[:, :1, :1] * f32(0.0)

    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, _T), 1)
    ld_ref[:] = jnp.where(lane1 == 0, ld[:, 0, :], f32(0.0))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _cholinv_call(A, *, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bp, M, _ = A.shape
    bt = _group_size(M, Bp)
    G = Bp // bt
    kern = functools.partial(_cholinv_kernel, M=M)
    z = np.int32(0)
    W, ld = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((Bp, M, M), jnp.float32),
                   jax.ShapeDtypeStruct((Bp, _T), jnp.float32)),
        grid=(G,),
        in_specs=[pl.BlockSpec((bt, M, M), lambda i: (i, z, z),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((bt, M, M), lambda i: (i, z, z),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bt, _T), lambda i: (i, z),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((bt, M, _T), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(A)
    return W, ld[:, 0]


def cholinv_batched(A, interpret=None):
    """(W = U^{-1}, sum-log-diag-U) of a batched masked SPD matrix
    (A = U^T U, W upper triangular).

    A: [B, M, M] f32, padded rows/cols zero with unit diagonal. M must be a
    multiple of 128 (callers pad; padded rows of a masked build satisfy the
    unit-diagonal requirement by construction). Falls back to XLA
    (cholesky + triangular solve against I) when unsupported.
    """
    if interpret is None:
        interpret = _INTERPRET
    A = jnp.asarray(A, jnp.float32)
    B, M, _ = A.shape
    if not (cholinv_supported(M) or interpret):
        L = jnp.linalg.cholesky(A)
        U = jnp.swapaxes(L, 1, 2)
        eye = jnp.broadcast_to(jnp.eye(M, dtype=A.dtype), (B, M, M))
        W = jax.scipy.linalg.solve_triangular(U, eye, lower=False)
        ld = jnp.sum(jnp.log(jnp.diagonal(U, axis1=1, axis2=2)), axis=1)
        return W, ld

    bt = _group_size(M, B)
    B_pad = int(-(-B // bt) * bt)
    if B_pad != B:
        pad_eye = jnp.broadcast_to(jnp.eye(M, dtype=jnp.float32),
                                   (B_pad - B, M, M))
        A = jnp.concatenate([A, pad_eye], axis=0)
    W, ld = _cholinv_call(A, interpret=interpret)
    return W[:B], ld[:B]
