"""Fused masked SGPR collapsed-ELBO value+gradient kernel (Pallas/Mosaic).

The SGPR pool (the reference's production model: GPSat/models/
gpflow_models.py:666-901, N~2000 obs summarised by M~500 inducing points,
used by IS2_GPSat_train.py:354) spends its L-BFGS iterations on
value_and_grad evals of the collapsed Titsias ELBO. The XLA path pays two
batched [M,M] Choleskys + an [M,N] triangular solve per eval — all latency
chains whose per-column state round-trips HBM — plus an autodiff pass of the
same shape. Here the whole evaluation runs in ONE Pallas program with every
per-expert factor resident in VMEM, and the gradient comes from hand-derived
M-sized adjoint identities instead of differentiating through the Cholesky:

  A~  = W_u^T Kuf                      (Kuu = U_u^T U_u, W_u = U_u^{-1})
  B   = I + s^-2 A~ A~^T,  U_B, W_B = U_B^{-1}
  a~  = A~ ybar,  dd = B^{-1} a~
  value = 0.5 n log 2pi + sum log diag U_B + 0.5 n log s2
          + 0.5 y.y/s2 - 0.5 a~.dd / s2^2 + 0.5 (sf2 n - |A~|_F^2)/s2
  Kbar_uf = -s^-2 W_u [(I - B^{-1}) A~ + dd beta^T],
            beta = s^-2 ybar - s^-4 A~^T dd
  Kbar_uu = 0.5 [G1^T G1 - 2 W_u W_u^T + G2 G2^T + s^-4 e e^T]
            with G1 = U_B W_u^T, G2 = W_u W_B, e = W_u dd
            (uses B - 2I + B^{-1} = (U_B - W_B^T)^T (U_B - W_B^T) and
             W_B U_B = I)
  g_theta = <Kbar_uu, dKuu/dtheta> + <Kbar_uf, dKuf/dtheta>
            + (s^-2/2) d trKff/dtheta          (trKff = sf2 n, stationary)
  g_s2    = 0.5 s^-2 (n - M + tr B^{-1})
            - 0.5 s^-4 (y.y - a~.dd/s2 - dd.dd/s2)
            - 0.5 s^-4 (sf2 n - |A~|_F^2)

All identities validated against jax.grad of ops/sgpr.neg_elbo in f64
(tpu_stuff/sgpr_grad_check.py). Masking matches ops/sgpr.py exactly: data
mask zeroes Kuf columns and ybar; the (prefix) inducing mask zeroes Kuu
cross terms and Kuf rows with unit diagonal on the padded inducing block,
which makes U_u / B / W_B block-identity there, so padded rows contribute
exactly nothing to value or gradients (tr B^{-1} and M cancel row-wise).

Scratch layout per expert — six regions of stride S = max(M, TN) lanes:
  R0 [0,S)    Kuu -> U_u            (row 0 doubles as the gradient mailbox)
  R1 [S,2S)   W_u = U_u^{-1}
  R2 [2S,3S)  B -> U_B, then W_B^T A~ tile work
  R3 [3S,4S)  W_B
  R4 [4S,5S)  Kuf tile, then Gamma1
  R5 [5S,6S)  A~ tile,  then Gamma2, then v = (I-B^{-1})A~ + dd beta^T
N is streamed in TN-lane tiles (TN = min(512, N_pad)), so nothing [M,N]
ever lives in registers; B accumulates tile-by-tile in scratch.

Supported: isotropic kernels (_KERNELS of ops/pallas_gpr), d <= 5, f32,
fixed inducing points. Callers fall back to the XLA adjoint otherwise.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from gpsat_tpu.ops.pallas_gpr import (_KERNELS, _T, _VMEM_LIMIT,
                                      _factor_tile_and_invert, _phi,
                                      _phi_grad)

__all__ = ["pallas_sgpr_vg_supported", "sgpr_vg_batched",
           "sgpr_predict_batched"]

_TN_MAX = 1024     # wide N tiles: fewer unrolled tile iterations (Mosaic
                   # compile time scales with program size) and bigger MXU
                   # matmuls per step
_MAX_D = 5
_SGPR_VMEM_BUDGET = 72 * 2**20

# interpret-mode switches for CPU testing (tests monkeypatch both)
_INTERPRET = False
_FORCE_SUPPORTED = False


def _pad_to(n, mult):
    return int(-(-int(n) // mult) * mult)


def _shapes(N, M):
    """(N_pad, M_pad, TN, W) for raw sizes; W is the width of the two
    tile-staging scratch regions (must hold both a [M, TN] Kuf/A~ tile and
    the [M, M] Gamma matrices of the Kbar_uu pass)."""
    M_pad = _pad_to(M, _T)
    N_pad = _pad_to(N, _TN_MAX) if N > _TN_MAX else _pad_to(N, _T)
    TN = min(_TN_MAX, N_pad)
    W = max(M_pad, TN)
    return N_pad, M_pad, TN, W


def _scratch_lanes(M_pad, W):
    """Scratch lane count: 4 M-wide factor regions + 2 W-wide staging."""
    return 4 * M_pad + 2 * W


def _io_per_expert(N_pad, M_pad):
    # xt + yt + zt + p + out blocks
    return (8 * N_pad + N_pad + 8 * M_pad + 8 + _T) * 4


def pallas_sgpr_vg_supported(kernel, d, N=None, M=None):
    """Can the fused SGPR value_and_grad path handle this configuration?

    The default hybrid (XLA matmuls + cholinv kernel) streams N through HBM,
    so only the kernel family, coordinate dim and factor size are gated; the
    monolithic-kernel opt-in (GPSAT_SGPR_MEGAKERNEL=1) additionally requires
    its VMEM-resident shapes to fit.
    """
    import os
    if os.environ.get("GPSAT_DISABLE_PALLAS_SGPR"):
        return False
    if kernel not in _KERNELS or d > _MAX_D:
        return False
    if M is not None and _pad_to(M, _T) > 1024:
        return False
    if os.environ.get("GPSAT_SGPR_MEGAKERNEL") and N is not None \
            and M is not None:
        N_pad, M_pad, TN, W = _shapes(N, M)
        if N_pad > 4096:
            return False
        scratch = M_pad * _scratch_lanes(M_pad, W) * 4
        margin = 4 * 2**20
        if 8 * scratch + 2 * 8 * _io_per_expert(N_pad, M_pad) + margin \
                > _VMEM_LIMIT:
            return False
    if _FORCE_SUPPORTED:
        return True
    try:
        if jax.devices()[0].platform == "cpu":
            return False
    except Exception:  # pragma: no cover
        return False
    return True


def _sgpr_group_size(N_pad, M_pad, W):
    per = M_pad * _scratch_lanes(M_pad, W) * 4
    bt = int(_SGPR_VMEM_BUDGET // per) // 8 * 8
    return int(min(max(8, bt), 16))


@functools.partial(jax.jit, static_argnames=("kernel", "jitter",
                                             "interpret"))
def _sgpr_vg_hybrid(params, X, y, maskf, Z, zmaskf, kernel, jitter,
                    interpret=False):
    """Hybrid SGPR vg: XLA batched matmuls + the fused cholinv kernel.

    Implements the closed-form adjoint identities of the module docstring
    directly (no autodiff anywhere). The lengthscale contractions use the
    rank-1 expansion sum_mn Q_mn (a_m - b_n)^2 =
    sum_m a_m^2 rs_m - 2 a^T Q b + sum_n b_n^2 cs_n, so no [B,M,N,d]
    temporary is ever built.
    """
    from gpsat_tpu.ops.pallas_cholinv import cholinv_batched

    f32 = jnp.float32
    hp = jax.lax.Precision.HIGHEST
    X = jnp.asarray(X, f32)
    Z = jnp.asarray(Z, f32)
    B, N, D = X.shape
    M = Z.shape[1]
    M_pad = _pad_to(M, _T)
    m = jnp.asarray(maskf, f32)
    zm = jnp.asarray(zmaskf, f32)
    if M_pad != M:
        Z = jnp.concatenate([Z, jnp.zeros((B, M_pad - M, D), f32)], axis=1)
        zm = jnp.concatenate([zm, jnp.zeros((B, M_pad - M), f32)], axis=1)
    ls_in = jnp.asarray(params["lengthscales"], f32).reshape(B, -1)
    scalar_ls = ls_in.shape[1] == 1 and D > 1
    ls = jnp.broadcast_to(ls_in, (B, D)) if scalar_ls else ls_in
    sf2 = jnp.asarray(params["kernel_variance"], f32).reshape(B)
    s2 = jnp.asarray(params["likelihood_variance"], f32).reshape(B)
    scale = f32(_KERNELS[kernel])

    ybar = jnp.asarray(y, f32) * m
    n = jnp.sum(m, axis=1)                                     # [B]
    Zs = Z / ls[:, None, :]
    Xs = X / ls[:, None, :]

    def r2_of(A1, A2):
        """[B, P, Q] scaled squared distances via explicit per-dim diffs
        (numerically matches the Pallas kernels / ops.kernels)."""
        d2 = jnp.zeros((B, A1.shape[1], A2.shape[1]), f32)
        for j in range(D):
            dj = A1[:, :, None, j] - A2[:, None, :, j]
            d2 = d2 + dj * dj
        return d2 * scale

    sf2c = sf2[:, None, None]
    s2c = s2[:, None, None]
    inv_s2 = 1.0 / s2c
    zmm = zm[:, :, None] * zm[:, None, :]
    mm = zm[:, :, None] * m[:, None, :]

    r2_uu = r2_of(Zs, Zs)
    phi_uu = _phi(kernel, r2_uu, f32)
    eyeM = jnp.eye(M_pad, dtype=f32)
    Kuu = sf2c * phi_uu * zmm + eyeM * (
        zm * (f32(jitter) - 1.0) + 1.0)[:, :, None]
    W_u, _ = cholinv_batched(Kuu, interpret=interpret)

    r2_uf = r2_of(Zs, Xs)
    phi_uf = _phi(kernel, r2_uf, f32)
    Kuf = sf2c * phi_uf * mm                                   # [B,M,N]
    At = jnp.einsum("bkm,bkn->bmn", W_u, Kuf, precision=hp)    # A~
    Bm = jnp.einsum("bmn,bkn->bmk", At, At, precision=hp) * inv_s2 + eyeM
    W_B, logdetB = cholinv_batched(Bm, interpret=interpret)

    at = jnp.einsum("bmn,bn->bm", At, ybar, precision=hp)      # a~
    c = jnp.einsum("bm,bmk->bk", at, W_B, precision=hp)        # a~^T W_B
    dd = jnp.einsum("bk,bmk->bm", c, W_B, precision=hp)        # B^{-1} a~
    atdd = jnp.sum(at * dd, axis=1)
    dddd = jnp.sum(dd * dd, axis=1)
    trBinv = jnp.sum(W_B * W_B, axis=(1, 2))
    trA2 = jnp.sum(At * At, axis=(1, 2))
    ydoty = jnp.sum(ybar * ybar, axis=1)

    val = (0.5 * n * f32(np.log(2.0 * np.pi)) + logdetB
           + 0.5 * n * jnp.log(s2) + 0.5 * ydoty / s2
           - 0.5 * atdd / (s2 * s2)
           + 0.5 * (sf2 * n - trA2) / s2)

    # Gradient-only contractions run at HIGH (bf16x3) matmul precision: the
    # L-BFGS accept/stop decisions use the value (kept at HIGHEST via the
    # shared At/Bm), and gradient rounding at this level only perturbs which
    # nearby optimum a slot lands on (validated: endpoints land better as
    # often as worse).
    gp = jax.lax.Precision.HIGH

    # ---- Kbar_uf = -s^-2 W_u [(I - B^{-1}) A~ + dd beta^T] ---------------
    beta = ybar * inv_s2[:, :, 0] - jnp.einsum(
        "bmn,bm->bn", At, dd, precision=hp) / (s2 * s2)[:, None]
    t2 = jnp.einsum("bkm,bkn->bmn", W_B, At, precision=gp)
    binvA = jnp.einsum("bmk,bkn->bmn", W_B, t2, precision=gp)
    v = At - binvA + dd[:, :, None] * beta[:, None, :]
    Kbar_uf = -jnp.einsum("bmk,bkn->bmn", W_u, v, precision=gp) * inv_s2

    # ---- Kbar_uu = 0.5 (W_u B W_u^T - 2 W_u W_u^T + G2 G2^T + s^-4 ee^T) -
    # (formerly via G1 = U_B W_u^T; expressed through Bm directly so the
    # cholinv kernel need not emit the U factor at all)
    BW = jnp.einsum("bmk,bnk->bmn", Bm, W_u, precision=gp)     # B W_u^T
    G2 = jnp.einsum("bmk,bkn->bmn", W_u, W_B, precision=gp)
    e = jnp.einsum("bmk,bk->bm", W_u, dd, precision=hp)
    Kbar_uu = 0.5 * (
        jnp.einsum("bmk,bkn->bmn", W_u, BW, precision=gp)
        - 2.0 * jnp.einsum("bmk,bnk->bmn", W_u, W_u, precision=gp)
        + jnp.einsum("bmk,bnk->bmn", G2, G2, precision=gp)
        + (e[:, :, None] * e[:, None, :]) / (s2 * s2)[:, None, None])

    QP_uu = Kbar_uu * (sf2c * phi_uu * zmm)
    QP_uf = Kbar_uf * (sf2c * phi_uf * mm)
    g_logsf2 = (jnp.sum(QP_uu, axis=(1, 2)) + jnp.sum(QP_uf, axis=(1, 2))
                + 0.5 * sf2 * n / s2)

    QF_uu = Kbar_uu * (sf2c * _phi_grad(kernel, r2_uu, f32) * zmm)
    QF_uf = Kbar_uf * (sf2c * _phi_grad(kernel, r2_uf, f32) * mm)

    def q2_contract(QF, Aj, Bj):
        """sum_mn QF_mn * (Aj_m - Bj_n)^2, elementwise.

        NOT the rank-1 expansion (sum a^2 rs - 2 a^T QF b + sum b^2 cs):
        inducing points are exact copies of data points, so QF carries the
        near-singular F = -2 dphi/dr2 (~1e18 for Matern12/Exponential at
        r2=1e-36) at coincident pairs — the expansion cancels those huge
        terms catastrophically in f32, while the elementwise product
        multiplies them by an exact zero. XLA fuses the diff/square/reduce,
        so no [B,M,N] temporary materialises per dim.
        """
        dj = Aj[:, :, None] - Bj[:, None, :]
        return jnp.sum(QF * dj * dj, axis=(1, 2))

    g_logls = []
    for j in range(D):
        g_j = scale * (q2_contract(QF_uu, Zs[:, :, j], Zs[:, :, j])
                       + q2_contract(QF_uf, Zs[:, :, j], Xs[:, :, j]))
        g_logls.append(g_j)
    g_logls = jnp.stack(g_logls, axis=1)                       # [B, D]

    g_s2 = (0.5 / s2 * (n - f32(float(M_pad)) + trBinv)
            - 0.5 / (s2 * s2) * (ydoty - atdd / s2 - dddd / s2)
            - 0.5 / (s2 * s2) * (sf2 * n - trA2))

    g_ls = g_logls / ls
    if scalar_ls:
        g_ls = jnp.sum(g_ls, axis=1, keepdims=True)
    g_ls = g_ls.reshape(jnp.shape(params["lengthscales"]))
    grads = {
        "lengthscales": g_ls,
        "kernel_variance": (g_logsf2 / sf2).reshape(
            jnp.shape(params["kernel_variance"])),
        "likelihood_variance": g_s2.reshape(
            jnp.shape(params["likelihood_variance"])),
    }
    return val, grads


@functools.partial(jax.jit, static_argnames=("kernel", "jitter",
                                             "interpret"))
def _sgpr_vg_stream(params, X, y, maskf, Z, zmaskf, kernel, jitter,
                    interpret=False):
    """Grid-streamed SGPR vg: cholinv factorisations + XLA M x M adjoint
    work + the two streamed Pallas programs for everything N-sized.
    Identical math to _sgpr_vg_hybrid (same identities, same precisions on
    the value path); no [B, M, N] array ever materialises in HBM."""
    from gpsat_tpu.ops.pallas_cholinv import cholinv_batched

    f32 = jnp.float32
    hp = jax.lax.Precision.HIGHEST
    gp = jax.lax.Precision.HIGH
    X = jnp.asarray(X, f32)
    Z = jnp.asarray(Z, f32)
    B, N, D = X.shape
    M = Z.shape[1]
    M_pad = _pad_to(M, _T)
    m = jnp.asarray(maskf, f32)
    zm = jnp.asarray(zmaskf, f32)
    if M_pad != M:
        Z = jnp.concatenate([Z, jnp.zeros((B, M_pad - M, D), f32)], axis=1)
        zm = jnp.concatenate([zm, jnp.zeros((B, M_pad - M), f32)], axis=1)
    ls_in = jnp.asarray(params["lengthscales"], f32).reshape(B, -1)
    scalar_ls = ls_in.shape[1] == 1 and D > 1
    ls = jnp.broadcast_to(ls_in, (B, D)) if scalar_ls else ls_in
    sf2 = jnp.asarray(params["kernel_variance"], f32).reshape(B)
    s2 = jnp.asarray(params["likelihood_variance"], f32).reshape(B)
    scale = f32(_KERNELS[kernel])
    ybar = jnp.asarray(y, f32) * m
    n = jnp.sum(m, axis=1)
    Zs = Z / ls[:, None, :]

    # ---- Kuu -> W_u (XLA build + fused cholinv) --------------------------
    d2 = jnp.zeros((B, M_pad, M_pad), f32)
    for j in range(D):
        dj = Zs[:, :, None, j] - Zs[:, None, :, j]
        d2 = d2 + dj * dj
    r2_uu = d2 * scale
    phi_uu = _phi(kernel, r2_uu, f32)
    sf2c = sf2[:, None, None]
    s2c = s2[:, None, None]
    inv_s2 = 1.0 / s2c
    zmm = zm[:, :, None] * zm[:, None, :]
    eyeM = jnp.eye(M_pad, dtype=f32)
    Kuu = sf2c * phi_uu * zmm + eyeM * (
        zm * (f32(jitter) - 1.0) + 1.0)[:, :, None]
    W_u, _ = cholinv_batched(Kuu, interpret=interpret)

    # ---- streamed inputs (dim-major packed, N padded to a tile grid) -----
    N_pad = _pad_to(N, _TN_STREAM) if N > _TN_STREAM else _pad_to(N, _T)
    TN = min(_TN_STREAM, N_pad)
    W = max(M_pad, TN)
    bt = _stream_group_size(M_pad, W)
    B_pad = int(-(-B // bt) * bt)
    xt = jnp.zeros((B, 8, N_pad), f32)
    xt = xt.at[:, :D, :N].set(jnp.swapaxes(X, 1, 2))
    xt = xt.at[:, 7, :N].set(m)
    yt = jnp.zeros((B, N_pad), f32)
    yt = yt.at[:, :N].set(ybar)
    zt = jnp.zeros((B, 8, M_pad), f32)
    zt = zt.at[:, :D, :].set(jnp.swapaxes(Z, 1, 2))
    zt = zt.at[:, 7, :].set(zm)
    p = jnp.zeros((B, 8), f32)
    p = p.at[:, :D].set(ls).at[:, 5].set(sf2).at[:, 6].set(s2)
    wu_in = W_u
    if B_pad != B:
        pad = B_pad - B
        xt = jnp.concatenate([xt, jnp.zeros((pad, 8, N_pad), f32)], axis=0)
        yt = jnp.concatenate([yt, jnp.zeros((pad, N_pad), f32)], axis=0)
        zt = jnp.concatenate([zt, jnp.zeros((pad, 8, M_pad), f32)], axis=0)
        p_tail = jnp.zeros((pad, 8), f32).at[:, :D].set(1.0)
        p_tail = p_tail.at[:, 5].set(1.0).at[:, 6].set(1.0)
        p = jnp.concatenate([p, p_tail], axis=0)
        wu_in = jnp.concatenate(
            [W_u, jnp.broadcast_to(eyeM, (pad, M_pad, M_pad))], axis=0)

    Bsum, at, trA2 = _sgpr_stream1_call(xt, yt, zt, p, wu_in, kernel=kernel,
                                        d=D, interpret=interpret)
    Bsum, at, trA2 = Bsum[:B], at[:B], trA2[:B]
    Bm = Bsum + eyeM
    W_B, logdetB = cholinv_batched(Bm, interpret=interpret)

    # ---- value + small rows (XLA) ----------------------------------------
    c = jnp.einsum("bm,bmk->bk", at, W_B, precision=hp)
    dd = jnp.einsum("bk,bmk->bm", c, W_B, precision=hp)
    atdd = jnp.sum(at * dd, axis=1)
    dddd = jnp.sum(dd * dd, axis=1)
    trBinv = jnp.sum(W_B * W_B, axis=(1, 2))
    ydoty = jnp.sum(ybar * ybar, axis=1)
    val = (0.5 * n * f32(np.log(2.0 * np.pi)) + logdetB
           + 0.5 * n * jnp.log(s2) + 0.5 * ydoty / s2
           - 0.5 * atdd / (s2 * s2)
           + 0.5 * (sf2 * n - trA2) / s2)

    # ---- Kbar_uu and its contractions (XLA, M x M only) ------------------
    BW = jnp.einsum("bmk,bnk->bmn", Bm, W_u, precision=gp)
    G2 = jnp.einsum("bmk,bkn->bmn", W_u, W_B, precision=gp)
    e = jnp.einsum("bmk,bk->bm", W_u, dd, precision=hp)
    Kbar_uu = 0.5 * (
        jnp.einsum("bmk,bkn->bmn", W_u, BW, precision=gp)
        - 2.0 * jnp.einsum("bmk,bnk->bmn", W_u, W_u, precision=gp)
        + jnp.einsum("bmk,bnk->bmn", G2, G2, precision=gp)
        + (e[:, :, None] * e[:, None, :]) / (s2 * s2)[:, None, None])
    QP_uu = Kbar_uu * (sf2c * phi_uu * zmm)
    QF_uu = Kbar_uu * (sf2c * _phi_grad(kernel, r2_uu, f32) * zmm)
    # P = I - B^{-1} for the streamed uf program, in the product form
    # B^{-1} S (S = A~A~^T/s2 = Bsum from stream1): eigenvalues in [0,1),
    # O(1) entries — no I - W_BW_B^T subtraction anywhere
    T1 = jnp.einsum("bkm,bkn->bmn", W_B, Bsum, precision=gp)
    Pmat = jnp.einsum("bmk,bkn->bmn", W_B, T1, precision=gp)

    def q2_contract(QF, Aj, Bj):
        # elementwise, not the rank-1 expansion — see _sgpr_vg_hybrid note
        dj = Aj[:, :, None] - Bj[:, None, :]
        return jnp.sum(QF * dj * dj, axis=(1, 2))

    # ---- uf-side contractions (streamed program 2) -----------------------
    dd_in = dd if B_pad == B else jnp.concatenate(
        [dd, jnp.zeros((B_pad - B, M_pad), f32)], axis=0)
    p_in = Pmat if B_pad == B else jnp.concatenate(
        [Pmat, jnp.zeros((B_pad - B, M_pad, M_pad), f32)], axis=0)
    gout = _sgpr_stream2_call(xt, yt, zt, p, wu_in, p_in, dd_in,
                              kernel=kernel, d=D, interpret=interpret)[:B]

    g_logsf2 = (jnp.sum(QP_uu, axis=(1, 2)) + gout[:, 6]
                + 0.5 * sf2 * n / s2)
    g_logls = []
    for j in range(D):
        g_j = scale * q2_contract(QF_uu, Zs[:, :, j], Zs[:, :, j]) \
            + gout[:, 1 + j]
        g_logls.append(g_j)
    g_logls = jnp.stack(g_logls, axis=1)
    g_s2 = (0.5 / s2 * (n - f32(float(M_pad)) + trBinv)
            - 0.5 / (s2 * s2) * (ydoty - atdd / s2 - dddd / s2)
            - 0.5 / (s2 * s2) * (sf2 * n - trA2))

    g_ls = g_logls / ls
    if scalar_ls:
        g_ls = jnp.sum(g_ls, axis=1, keepdims=True)
    g_ls = g_ls.reshape(jnp.shape(params["lengthscales"]))
    grads = {
        "lengthscales": g_ls,
        "kernel_variance": (g_logsf2 / sf2).reshape(
            jnp.shape(params["kernel_variance"])),
        "likelihood_variance": g_s2.reshape(
            jnp.shape(params["likelihood_variance"])),
    }
    return val, grads


@functools.partial(jax.jit, static_argnames=("kernel", "jitter",
                                             "interpret"))
def sgpr_predict_batched(params, X, y, maskf, Z, zmaskf, Xs, kernel,
                         jitter, interpret=False):
    """Batched SGPR posterior prediction, hybrid style (cf. _sgpr_vg_hybrid):
    the two factorisations run in the fused cholinv kernel, everything else
    is XLA batched matmuls — replacing the vmapped per-expert XLA
    Cholesky/triangular-solve chains of ops/sgpr.predict (pure latency on
    TPU). Same outputs as the reference's SGPR predict_f/predict_y
    (GPSat/models/gpflow_models.py:187-273 semantics): 'f*', 'f*_var',
    'y_var'.
    """
    from gpsat_tpu.ops.pallas_cholinv import cholinv_batched

    f32 = jnp.float32
    hp = jax.lax.Precision.HIGHEST
    X = jnp.asarray(X, f32)
    Z = jnp.asarray(Z, f32)
    Xs = jnp.asarray(Xs, f32)
    B, N, D = X.shape
    M = Z.shape[1]
    M_pad = _pad_to(M, _T)
    m = jnp.asarray(maskf, f32)
    zm = jnp.asarray(zmaskf, f32)
    if M_pad != M:
        Z = jnp.concatenate([Z, jnp.zeros((B, M_pad - M, D), f32)], axis=1)
        zm = jnp.concatenate([zm, jnp.zeros((B, M_pad - M), f32)], axis=1)
    ls_in = jnp.asarray(params["lengthscales"], f32).reshape(B, -1)
    ls = jnp.broadcast_to(ls_in, (B, D)) if (ls_in.shape[1] == 1 and D > 1) \
        else ls_in
    sf2 = jnp.asarray(params["kernel_variance"], f32).reshape(B)
    s2 = jnp.asarray(params["likelihood_variance"], f32).reshape(B)
    scale = f32(_KERNELS[kernel])

    ybar = jnp.asarray(y, f32) * m
    Zs = Z / ls[:, None, :]
    Xn = X / ls[:, None, :]
    Xp = Xs / ls[:, None, :]

    def r2_of(A1, A2):
        d2 = jnp.zeros((B, A1.shape[1], A2.shape[1]), f32)
        for j in range(D):
            dj = A1[:, :, None, j] - A2[:, None, :, j]
            d2 = d2 + dj * dj
        return d2 * scale

    sf2c = sf2[:, None, None]
    zmm = zm[:, :, None] * zm[:, None, :]
    eyeM = jnp.eye(M_pad, dtype=f32)
    Kuu = sf2c * _phi(kernel, r2_of(Zs, Zs), f32) * zmm + eyeM * (
        zm * (f32(jitter) - 1.0) + 1.0)[:, :, None]
    W_u, ld_u = cholinv_batched(Kuu, interpret=interpret)
    # near-singular Kuu (long-lengthscale optima make it near rank-1) can
    # defeat an f32 factorisation even though the optimiser's objective
    # stayed finite; prediction must not fail at the converged point, so
    # escalate to a RELATIVE jitter (1e-4 * kernel_variance) for exactly the
    # failed experts and refactor once (the standard GPflow/GPyTorch
    # escalating-jitter recovery, batched)
    bad = ~jnp.isfinite(ld_u)

    # The retry factorisation is wrapped in lax.cond: in the common case
    # (every expert factorises cleanly) the whole sweep skips it, cutting
    # the prediction program from 3 sequential cholinv passes to 2 — the
    # passes ARE the prediction cost (each grid step is a latency-bound
    # [bt, M, M] factorise+invert; FLOPs elsewhere are negligible).
    def _refactor(_):
        extra = jnp.where(bad, f32(1e-4) * sf2 + f32(100.0) * f32(jitter),
                          0.0)
        Kuu2 = Kuu + eyeM * (zm * extra[:, None])[:, :, None]
        W2, _ = cholinv_batched(Kuu2, interpret=interpret)
        return jnp.where(bad[:, None, None], W2, W_u)

    W_u = jax.lax.cond(jnp.any(bad), _refactor, lambda _: W_u, None)
    Kuf = sf2c * _phi(kernel, r2_of(Zs, Xn), f32) \
        * (zm[:, :, None] * m[:, None, :])
    At = jnp.einsum("bkm,bkn->bmn", W_u, Kuf, precision=hp)
    Bm = jnp.einsum("bmn,bkn->bmk", At, At,
                    precision=hp) / s2[:, None, None] + eyeM
    W_B, _ = cholinv_batched(Bm, interpret=interpret)

    # c = LB^{-1} Aerr with Aerr = (A ybar)/sigma = (A~ ybar)/s2
    # (ops/sgpr.py _common: A = Lu^{-1} Kuf / sigma, sigma = sqrt(s2))
    at = jnp.einsum("bmn,bn->bm", At, ybar, precision=hp)
    c = jnp.einsum("bm,bmk->bk", at, W_B, precision=hp) / s2[:, None]

    Kus = sf2c * _phi(kernel, r2_of(Zs, Xp), f32) * zm[:, :, None]
    tmp1 = jnp.einsum("bkm,bkp->bmp", W_u, Kus, precision=hp)   # Lu^-1 Kus
    tmp2 = jnp.einsum("bkm,bkp->bmp", W_B, tmp1, precision=hp)  # LB^-1 tmp1
    mean = jnp.einsum("bmp,bm->bp", tmp2, c, precision=hp)
    f_var = jnp.maximum(
        sf2[:, None] + jnp.sum(tmp2 * tmp2, axis=1)
        - jnp.sum(tmp1 * tmp1, axis=1), 0.0)
    return {"f*": mean, "f*_var": f_var, "y_var": f_var + s2[:, None]}


# ---------------------------------------------------------------------------
# round-5 grid-streamed split (the default vg path): TWO small Pallas
# programs stream the N axis through the pallas GRID (one axis per N-tile,
# VMEM accumulators carried across grid steps) instead of unrolling N-tiles
# in-kernel — the mega-kernel below computes the same thing in one program
# but its Mosaic compile takes >50 min at the production shape because
# compile time scales with unrolled program size. Each streamed program is
# ~30-50 ops and compiles in minutes:
#
#   stream1: Kuf tile build -> A~ = W_u^T Kuf -> accumulate
#            B += A~ A~^T / s2, a~ += A~ ybar, trA2   (value-path inputs)
#   stream2: rebuild Kuf/A~ tile -> beta, t2 = W_B^T A~, B^{-1}A~,
#            v, Kbar_uf = -W_u v / s2 -> accumulate the uf-side
#            lengthscale/variance gradient contractions
#
# Everything M x M (the two factorisations via ops/pallas_cholinv, the
# Kbar_uu assembly and its contractions, the value scalars) stays in
# XLA/cholinv exactly as in the hybrid — those are either latency-fused
# already or MXU-efficient batched matmuls. What the split removes is the
# hybrid's ~10 HBM round-trips over [B, M, N] temporaries (134 MB each at
# the production shape) and their dispatch boundaries.
# ---------------------------------------------------------------------------


# N-tile width for the streamed programs. Narrower than _TN_MAX on
# purpose: each in-flight loop value is [bt, T, TN] and Mosaic's scheduler
# keeps several live even with the mailbox chains — TN=1024 at bt=8
# measured 106 MB of register-spill slots (VMEM OOM); TN=512 fits.
_TN_STREAM = 512


def _stream_group_size(M, W):
    """Experts per grid step for the streamed kernels: per expert two
    [M, M] factor windows + two [M, W] tile-scratch regions, plus slack
    for double-buffered windows and scheduler spills."""
    per = (2 * M * M + 2 * M * W) * 4
    bt = int(_SGPR_VMEM_BUDGET // per) // 8 * 8
    return int(min(max(8, bt), 8))


def _panel_refs(p_ref, a_ref, r0, b_ref, c0, w, d, scale, Bt):
    """(r2*scale, [q2_j]) between rows r0.. of dim-major a_ref [Bt,8,La]
    and lanes c0.. of dim-major b_ref [Bt,8,Lb]."""
    f32 = jnp.float32
    r2 = jnp.zeros((Bt, _T, w), f32)
    q2s = []
    for j in range(d):
        ls_j = p_ref[:, j:j + 1]
        aj = a_ref[:, j, :] / ls_j
        bj = b_ref[:, j, :] / ls_j
        dj = jax.lax.slice_in_dim(aj, r0, r0 + _T, axis=1)[:, :, None] \
            - jax.lax.slice_in_dim(bj, c0, c0 + w, axis=1)[:, None, :]
        q2 = dj * dj * scale
        q2s.append(q2)
        r2 = r2 + q2
    return r2, q2s


def _build_kuf_at_tiles(xt_ref, zt_ref, p_ref, wu_ref, kuf_s, at_s, *,
                        kernel, d, M, TN, Bt, dot):
    """Stage the current N-tile's Kuf into kuf_s[:, :, :TN] and
    A~ = W_u^T Kuf into at_s[:, :, :TN] (shared by stream1/stream2)."""
    f32 = jnp.float32
    mb = M // _T
    scale = f32(_KERNELS[kernel])
    bmm_t = (((1,), (1,)), ((0,), (0,)))
    m_t = xt_ref[:, 7, :]                       # [Bt,TN] data-tile mask
    zm = zt_ref[:, 7, :]                        # [Bt,M]
    sf2c = p_ref[:, 5:6][:, :, None]
    dep = jnp.zeros((Bt, 1, 1), f32)
    for rb in range(mb):
        r0 = rb * _T
        r2, _ = _panel_refs(p_ref, zt_ref, r0, xt_ref, 0, TN, d, scale, Bt)
        zrow = jax.lax.slice_in_dim(zm, r0, r0 + _T, axis=1)[:, :, None]
        kuf = sf2c * _phi(kernel, r2, f32) * (zrow * m_t[:, None, :]) \
            + (dep + jnp.zeros((Bt, 1, TN), f32))
        kuf_s[:, r0:r0 + _T, 0:TN] = kuf
        dep = kuf[:, :1, :1] * f32(0.0)
    # gate each iteration's kuf_s load on the at_s row the previous
    # iteration wrote: without the read-back the dependence-free row
    # blocks interleave and every [Bt, M, TN] load goes live at once
    # (vreg spills — the ops/pallas_gpr gradient-loop lesson)
    prev = None
    for ib in range(mb):
        kuf_full = kuf_s[:, 0:M, 0:TN]
        if prev is not None:
            g = at_s[:, prev:prev + 1, 0:TN]
            kuf_full = jnp.where(g == g, kuf_full, f32(0.0))
        wu_cols = wu_ref[:, 0:M, ib * _T:(ib + 1) * _T]
        at_s[:, ib * _T:(ib + 1) * _T, 0:TN] = dot(
            wu_cols, kuf_full, dimension_numbers=bmm_t)
        prev = ib * _T


def _sgpr_stream1_kernel(xt_ref, yt_ref, zt_ref, p_ref, wu_ref,
                         bout_ref, atout_ref, st_ref, kuf_s, at_s, *,
                         kernel, d, M, TN):
    """Grid (G, NT): accumulate B = sum_t A~_t A~_t^T / s2 (output window,
    I added by the caller), a~ = A~ ybar and trA2 = |A~|_F^2 across the
    N-tiles of each expert group. st_ref [Bt,128] lane 0 = trA2."""
    from jax.experimental import pallas as pl
    f32 = jnp.float32
    Bt = kuf_s.shape[0]
    mb = M // _T
    t = pl.program_id(1)
    dot = functools.partial(jax.lax.dot_general,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=f32)
    kv_dims = (((2,), (2,)), ((0,), (0,)))
    inv_s2 = (f32(1.0) / p_ref[:, 6:7])[:, :, None]

    @pl.when(t == 0)
    def _init():
        for rb in range(mb):
            bout_ref[:, rb * _T:(rb + 1) * _T, :] = \
                jnp.zeros((Bt, _T, M), f32)
        atout_ref[:] = jnp.zeros((Bt, M), f32)
        st_ref[:] = jnp.zeros((Bt, _T), f32)

    _build_kuf_at_tiles(xt_ref, zt_ref, p_ref, wu_ref, kuf_s, at_s,
                        kernel=kernel, d=d, M=M, TN=TN, Bt=Bt, dot=dot)

    # B-row accumulation, mailbox-serialised through the dead Kuf staging
    # (each [Bt, M, TN] at_s load otherwise goes live simultaneously)
    kuf_s[:, 0:1, 0:TN] = jnp.zeros((Bt, 1, TN), f32)
    for ib in range(mb):
        mbox = kuf_s[:, 0:1, 0:TN]
        gate = mbox == mbox
        rows = jnp.where(gate, at_s[:, ib * _T:(ib + 1) * _T, 0:TN],
                         f32(0.0))
        at_full = at_s[:, 0:M, 0:TN]
        prod = dot(rows, at_full, dimension_numbers=kv_dims)
        bout_ref[:, ib * _T:(ib + 1) * _T, :] = (
            bout_ref[:, ib * _T:(ib + 1) * _T, :] + prod * inv_s2)
        kuf_s[:, 0:1, 0:TN] = prod[:, 0:1, 0:1] * f32(0.0) \
            + jnp.zeros((Bt, 1, TN), f32)
    mbox = kuf_s[:, 0:1, 0:TN]
    at_full = jnp.where(mbox == mbox, at_s[:, 0:M, 0:TN], f32(0.0))
    y_row = yt_ref[:][:, None, :]                       # [Bt,1,TN]
    a_inc = dot(y_row, at_full, dimension_numbers=kv_dims)
    atout_ref[:] = atout_ref[:] + a_inc[:, 0, :]
    tr = jnp.sum(jnp.sum(at_full * at_full, axis=1), axis=1)  # [Bt]
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, _T), 1)
    st_ref[:] = st_ref[:] + jnp.where(lane1 == 0, tr[:, None], f32(0.0))


def _sgpr_stream2_kernel(xt_ref, yt_ref, zt_ref, p_ref, wu_ref, pmat_ref,
                         dd_ref, gout_ref, kuf_s, at_s, *, kernel, d, M, TN):
    """Grid (G, NT): the uf-side adjoint contractions, accumulated across
    N-tiles. gout_ref [Bt,128] lanes 1..d = d/dlog ls_j (uf part),
    lane 6 = d/dlog sf2 (uf part).

    Uses P = I - B^{-1}, precomputed by the caller in the product form
    B^{-1} S (S = A~A~^T/s2 from stream1; eigenvalues of P lie in [0,1),
    entries O(1)):

      v       = P A~ + dd beta^T
      Kbar_uf = -s^{-2} W_u v
      beta    = ybar/s^2 - (A~^T dd)/s^4

    Three matmul sets per tile (A~ rebuild, P A~, W_u v) instead of the
    first cut's four — that version recomputed the hybrid's full W_B
    chain in-kernel at Mosaic's forced-HIGHEST precision and LOST to the
    hybrid (pool 2.51 s vs 2.33 s at the bench profile). A further fold
    to ONE matmul set (D = W_u P W_u^T applied to Kuf directly) was
    measured at 1-4% gradient error on ill-conditioned Kuu — the
    W_u^T Kuf contraction must happen first."""
    from jax.experimental import pallas as pl
    f32 = jnp.float32
    Bt = kuf_s.shape[0]
    mb = M // _T
    scale = f32(_KERNELS[kernel])
    t = pl.program_id(1)
    dot = functools.partial(jax.lax.dot_general,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=f32)
    bmm = (((2,), (1,)), ((0,), (0,)))
    m_t = xt_ref[:, 7, :]
    zm = zt_ref[:, 7, :]
    sf2c = p_ref[:, 5:6][:, :, None]
    sn2 = p_ref[:, 6:7]
    inv_s2 = (f32(1.0) / sn2)[:, :, None]
    inv_s4 = inv_s2 * inv_s2

    @pl.when(t == 0)
    def _init():
        gout_ref[:] = jnp.zeros((Bt, _T), f32)

    _build_kuf_at_tiles(xt_ref, zt_ref, p_ref, wu_ref, kuf_s, at_s,
                        kernel=kernel, d=d, M=M, TN=TN, Bt=Bt, dot=dot)

    dd_row = dd_ref[:][:, None, :]                      # [Bt,1,M]
    ddA = dot(dd_row, at_s[:, 0:M, 0:TN],
              dimension_numbers=bmm)                    # [Bt,1,TN]
    y_row = yt_ref[:][:, None, :]
    beta_row = y_row * inv_s2 - ddA * inv_s4
    # v = P A~ + dd beta^T into the dead Kuf staging; each iteration's
    # at_s load gated on the kuf_s row the previous one wrote
    prev = None
    for ib in range(mb):
        at_full = at_s[:, 0:M, 0:TN]
        if prev is not None:
            g = kuf_s[:, prev:prev + 1, 0:TN]
            at_full = jnp.where(g == g, at_full, f32(0.0))
        dd_ib = jnp.swapaxes(
            jax.lax.slice_in_dim(dd_row, ib * _T, (ib + 1) * _T,
                                 axis=2), 1, 2)         # [Bt,T,1]
        kuf_s[:, ib * _T:(ib + 1) * _T, 0:TN] = (
            dot(pmat_ref[:, ib * _T:(ib + 1) * _T, 0:M],
                at_full, dimension_numbers=bmm)
            + dd_ib * beta_row)
        prev = ib * _T
    # Kbar_uf row blocks + gradient reductions, mailbox-serialised in the
    # dead A~ staging (v lives in kuf_s and is every iteration's input)
    gls = [jnp.zeros((Bt, 1, 1), f32) for _ in range(d)]
    gsf2 = jnp.zeros((Bt, 1, 1), f32)
    at_s[:, 0:1, 0:M] = jnp.zeros((Bt, 1, M), f32)
    for ib in range(mb):
        r0 = ib * _T
        mbox = at_s[:, 0:1, 0:M]
        gate = mbox == mbox
        wu_rows = jnp.where(gate, wu_ref[:, r0:r0 + _T, 0:M], f32(0.0))
        kbar = -dot(wu_rows, kuf_s[:, 0:M, 0:TN],
                    dimension_numbers=bmm) * inv_s2
        r2, q2s = _panel_refs(p_ref, zt_ref, r0, xt_ref, 0, TN, d, scale,
                              Bt)
        phi = _phi(kernel, r2, f32)
        F = _phi_grad(kernel, r2, f32)
        zrow = jax.lax.slice_in_dim(zm, r0, r0 + _T, axis=1)[:, :, None]
        mm_t = zrow * m_t[:, None, :]
        red = lambda x: jnp.sum(jnp.sum(x, axis=1, keepdims=True), axis=2,
                                keepdims=True)
        gsf2 = gsf2 + red(kbar * (sf2c * phi * mm_t))
        qf = kbar * (sf2c * F * mm_t)
        for j in range(d):
            gls[j] = gls[j] + red(qf * q2s[j])
        at_s[:, 0:1, 0:M] = gsf2[:, :, 0:1] + jnp.zeros((Bt, 1, M), f32)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, _T), 1)
    o = jnp.zeros((Bt, _T), f32)
    for j in range(d):
        o = o + jnp.where(lane1 == 1 + j, gls[j][:, 0, :], f32(0.0))
    o = o + jnp.where(lane1 == 6, gsf2[:, 0, :], f32(0.0))
    gout_ref[:] = gout_ref[:] + o


@functools.partial(jax.jit, static_argnames=("kernel", "d", "interpret"))
def _sgpr_stream1_call(xt, yt, zt, p, wu, *, kernel, d, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bp, _, N_pad = xt.shape
    M = zt.shape[2]
    TN = min(_TN_STREAM, N_pad)
    NT = N_pad // TN
    W = max(M, TN)
    bt = _stream_group_size(M, W)
    G = Bp // bt
    kern = functools.partial(_sgpr_stream1_kernel, kernel=kernel, d=d,
                             M=M, TN=TN)
    z = np.int32(0)
    Bsum, at, st = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((Bp, M, M), jnp.float32),
                   jax.ShapeDtypeStruct((Bp, M), jnp.float32),
                   jax.ShapeDtypeStruct((Bp, _T), jnp.float32)),
        grid=(G, NT),
        in_specs=[
            pl.BlockSpec((bt, 8, TN), lambda g, t: (g, z, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, TN), lambda g, t: (g, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 8, M), lambda g, t: (g, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 8), lambda g, t: (g, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, M, M), lambda g, t: (g, z, z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((bt, M, M), lambda g, t: (g, z, z),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bt, M), lambda g, t: (g, z),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bt, _T), lambda g, t: (g, z),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((bt, M, W), jnp.float32),
                        pltpu.VMEM((bt, M, W), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xt, yt, zt, p, wu)
    return Bsum, at, st[:, 0]


@functools.partial(jax.jit, static_argnames=("kernel", "d", "interpret"))
def _sgpr_stream2_call(xt, yt, zt, p, wu, pmat, dd, *, kernel, d,
                       interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bp, _, N_pad = xt.shape
    M = zt.shape[2]
    TN = min(_TN_STREAM, N_pad)
    NT = N_pad // TN
    W = max(M, TN)
    bt = _stream_group_size(M, W)
    G = Bp // bt
    kern = functools.partial(_sgpr_stream2_kernel, kernel=kernel, d=d,
                             M=M, TN=TN)
    z = np.int32(0)
    gout = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Bp, _T), jnp.float32),
        grid=(G, NT),
        in_specs=[
            pl.BlockSpec((bt, 8, TN), lambda g, t: (g, z, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, TN), lambda g, t: (g, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 8, M), lambda g, t: (g, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 8), lambda g, t: (g, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, M, M), lambda g, t: (g, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, M, M), lambda g, t: (g, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, M), lambda g, t: (g, z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, _T), lambda g, t: (g, z),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bt, M, W), jnp.float32),
                        pltpu.VMEM((bt, M, W), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xt, yt, zt, p, wu, pmat, dd)
    return gout


def _sgpr_vg_kernel(xt_ref, yt_ref, zt_ref, p_ref, out_ref, a_ref, *,
                    kernel, d, N, M, TN, jitter):
    """One grid step: Bt experts. xt_ref [Bt,8,N] data coords (dim-major,
    slot 7 = data mask), yt_ref [Bt,N] masked obs, zt_ref [Bt,8,M] inducing
    coords (slot 7 = inducing mask), p_ref [Bt,8]
    (ls_0..ls_{d-1}, sf2@5, sn2@6). out_ref [Bt,128] lanes: 0 = neg-ELBO,
    1..d = d/dlog(ls_j), 6 = d/dlog(sf2), 7 = d/d(sn2) raw.
    a_ref [Bt, M, 6S] scratch (layout in module docstring)."""
    f32 = jnp.float32
    Bt = a_ref.shape[0]
    W = (a_ref.shape[2] - 4 * M) // 2
    o1, o2, o3, o4 = M, 2 * M, 3 * M, 4 * M
    o5 = 4 * M + W
    mb = M // _T
    nt = N // TN
    scale = f32(_KERNELS[kernel])

    dot = functools.partial(jax.lax.dot_general,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=f32)
    bmm = (((2,), (1,)), ((0,), (0,)))          # [Bt,a,k] @ [Bt,k,b]
    bmm_t = (((1,), (1,)), ((0,), (0,)))        # [Bt,k,a]^T @ [Bt,k,b]
    kv_dims = (((2,), (2,)), ((0,), (0,)))      # A @ B^T (contract lanes)

    lane_m = jax.lax.broadcasted_iota(jnp.int32, (1, 1, M), 2)
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _T), 2)

    m = xt_ref[:, 7, :]                         # [Bt,N] data mask (float)
    zm = zt_ref[:, 7, :]                        # [Bt,M] inducing mask
    yt = yt_ref[:]                              # [Bt,N] (pre-masked)
    sf2 = p_ref[:, 5:6]                         # [Bt,1]
    sn2 = p_ref[:, 6:7]
    sf2c = sf2[:, :, None]                      # [Bt,1,1]
    inv_s2 = (f32(1.0) / sn2)[:, :, None]
    inv_s4 = inv_s2 * inv_s2

    def _rows(v, r0):
        """[Bt,T,1] row-slice of a [Bt,L] value."""
        return jax.lax.slice_in_dim(v, r0, r0 + _T, axis=1)[:, :, None]

    def _lanes(v, c0, w=_T):
        """[Bt,1,w] lane-slice of a [Bt,L] value."""
        return jax.lax.slice_in_dim(v, c0, c0 + w, axis=1)[:, None, :]

    def _dep(v, lanes):
        """[Bt,1,1] zero-dep widened to [Bt,1,lanes] (no simultaneous
        sublane+lane broadcast on Mosaic)."""
        return v + jnp.zeros((Bt, 1, lanes), f32)

    def _reduce11(x):
        return jnp.sum(jnp.sum(x, axis=1, keepdims=True), axis=2,
                       keepdims=True)

    def _panel(a_coords, r0, b_coords, c0, w):
        """(r2*scale, [q2_j]) between rows r0.. of a_coords and lanes c0..
        of b_coords; both are dim-major [Bt,8,L] refs."""
        r2 = jnp.zeros((Bt, _T, w), f32)
        q2s = []
        for j in range(d):
            ls_j = p_ref[:, j:j + 1]
            aj = a_coords[:, j, :] / ls_j
            bj = b_coords[:, j, :] / ls_j
            dj = _rows(aj, r0) - _lanes(bj, c0, w)
            q2s.append(dj * dj * scale)
            r2 = r2 + q2s[j]
        return r2, q2s

    # ---- P1: build Kuu; zero W_u/W_B; B := I ----------------------------
    diagv_u = zm * (f32(jitter) + f32(-1.0)) + f32(1.0)   # jitter*zm+(1-zm)
    dep_b = jnp.zeros((Bt, 1, 1), f32)
    for rb in range(mb):
        r0 = rb * _T
        sub_abs = jax.lax.broadcasted_iota(jnp.int32, (1, _T, 1), 1) + r0
        r2, _ = _panel(zt_ref, r0, zt_ref, 0, M)
        K = sf2c * _phi(kernel, r2, f32) + _dep(dep_b, M)
        zmm = _rows(zm, r0) * zm[:, None, :]
        dterm = jnp.where(lane_m == sub_abs,
                          _rows(diagv_u, r0) + jnp.zeros((Bt, _T, M), f32),
                          f32(0.0))
        tile = K * zmm + dterm
        a_ref[:, r0:r0 + _T, 0:M] = tile
        a_ref[:, r0:r0 + _T, o1:o1 + M] = jnp.zeros((Bt, _T, M), f32)
        a_ref[:, r0:r0 + _T, o2:o2 + M] = jnp.where(
            lane_m == sub_abs, f32(1.0), f32(0.0)) \
            + jnp.zeros((Bt, _T, M), f32)
        a_ref[:, r0:r0 + _T, o3:o3 + M] = jnp.zeros((Bt, _T, M), f32)
        dep_b = tile[:, :1, :1] * f32(0.0)

    # ---- P2: factor Kuu -> U_u (R0) and W_u = U_u^{-1} (R1) --------------
    def _factor(coff, woff_):
        """Blocked factorisation of the [M,M] matrix at lane offset coff,
        tile inverses at woff_, then the off-diagonal W recurrence.
        Returns sum(log diag U) [Bt,1,1]."""
        ld = jnp.zeros((Bt, 1, 1), f32)
        for kb in range(mb):
            base = kb * _T
            ld = _factor_tile_and_invert(a_ref, coff + base, woff_ + base,
                                         ld, Bt, rbase=base)
            if base + _T < M:
                wkk = a_ref[:, base:base + _T,
                            woff_ + base:woff_ + base + _T]
                arest = a_ref[:, base:base + _T,
                              coff + base + _T:coff + M]
                a_ref[:, base:base + _T, coff + base + _T:coff + M] = \
                    dot(wkk, arest, dimension_numbers=bmm_t)
            for ib in range(kb + 1, mb):
                u_ki = a_ref[:, base:base + _T,
                             coff + ib * _T:coff + (ib + 1) * _T]
                u_krest = a_ref[:, base:base + _T,
                                coff + ib * _T:coff + M]
                g = dot(u_ki, u_krest, dimension_numbers=bmm_t)
                a_ref[:, ib * _T:(ib + 1) * _T,
                      coff + ib * _T:coff + M] = (
                    a_ref[:, ib * _T:(ib + 1) * _T,
                          coff + ib * _T:coff + M] - g)
        # off-diagonal W blocks: W_ij = -W_ii sum_{i<k<=j} U_ik W_kj
        dep_w = jnp.zeros((Bt, 1, 1), f32)
        for jb in range(mb):
            wj = woff_ + jb * _T
            for i in range(jb - 1, -1, -1):
                acc = jnp.zeros((Bt, _T, _T), f32) + _dep(dep_w, _T)
                for k2 in range(i + 1, jb + 1):
                    u_ik = a_ref[:, i * _T:(i + 1) * _T,
                                 coff + k2 * _T:coff + (k2 + 1) * _T]
                    w_kj = a_ref[:, k2 * _T:(k2 + 1) * _T, wj:wj + _T]
                    acc = acc + dot(u_ik, w_kj, dimension_numbers=bmm)
                w_ii = a_ref[:, i * _T:(i + 1) * _T,
                             woff_ + i * _T:woff_ + (i + 1) * _T]
                wij = -dot(w_ii, acc, dimension_numbers=bmm)
                a_ref[:, i * _T:(i + 1) * _T, wj:wj + _T] = wij
                dep_w = wij[:, :1, :1] * f32(0.0)
        return ld

    _factor(0, o1)            # Kuu logdet unused (cancels in the bound)

    # ---- P3: stream N tiles — A~, B accumulation, a~, |A~|_F^2 ----------
    def _build_kuf(t):
        """Kuf tile t into R4 (masked)."""
        c0 = t * TN
        dep_k = jnp.zeros((Bt, 1, 1), f32)
        for rb in range(mb):
            r0 = rb * _T
            r2, _ = _panel(zt_ref, r0, xt_ref, c0, TN)
            kuf = (sf2c * _phi(kernel, r2, f32)
                   * (_rows(zm, r0) * _lanes(m, c0, TN))) + _dep(dep_k, TN)
            a_ref[:, r0:r0 + _T, o4:o4 + TN] = kuf
            dep_k = kuf[:, :1, :1] * f32(0.0)

    def _build_at():
        """A~ = W_u^T Kuf for the staged tile: R5 <- R1^T @ R4."""
        for ib in range(mb):
            wu_cols = a_ref[:, 0:M, o1 + ib * _T:o1 + (ib + 1) * _T]
            kuf_full = a_ref[:, 0:M, o4:o4 + TN]
            a_ref[:, ib * _T:(ib + 1) * _T, o5:o5 + TN] = \
                dot(wu_cols, kuf_full, dimension_numbers=bmm_t)

    at_row = jnp.zeros((Bt, 1, M), f32)         # a~ = A~ ybar (row form)
    trA2 = jnp.zeros((Bt, 1, 1), f32)
    for t in range(nt):
        c0 = t * TN
        _build_kuf(t)
        _build_at()
        for ib in range(mb):
            at_rows = a_ref[:, ib * _T:(ib + 1) * _T, o5:o5 + TN]
            at_full = a_ref[:, 0:M, o5:o5 + TN]
            prod = dot(at_rows, at_full, dimension_numbers=kv_dims)
            a_ref[:, ib * _T:(ib + 1) * _T, o2:o2 + M] = (
                a_ref[:, ib * _T:(ib + 1) * _T, o2:o2 + M]
                + prod * inv_s2)
        y_t = _lanes(yt, c0, TN)                              # [Bt,1,TN]
        at_row = at_row + dot(y_t, a_ref[:, 0:M, o5:o5 + TN],
                              dimension_numbers=kv_dims)
        for ib in range(mb):
            blk = a_ref[:, ib * _T:(ib + 1) * _T, o5:o5 + TN]
            trA2 = trA2 + _reduce11(blk * blk)

    # ---- P4: factor B -> U_B (R2), W_B (R3) ------------------------------
    logdetB = _factor(o2, o3)

    # ---- P5: small rows and scalars --------------------------------------
    # c = a~^T W_B (row), dd = B^{-1} a~ (row)
    c_row = jnp.zeros((Bt, 1, M), f32)
    for kb in range(mb):
        at_k = jax.lax.slice_in_dim(at_row, kb * _T, (kb + 1) * _T, axis=2)
        wb_rows = a_ref[:, kb * _T:(kb + 1) * _T, o3:o3 + M]
        c_row = c_row + dot(at_k, wb_rows, dimension_numbers=bmm)
    pieces = []
    trBinv = jnp.zeros((Bt, 1, 1), f32)
    for ib in range(mb):
        wb_rows = a_ref[:, ib * _T:(ib + 1) * _T, o3:o3 + M]
        pieces.append(dot(c_row, wb_rows, dimension_numbers=kv_dims))
        trBinv = trBinv + _reduce11(wb_rows * wb_rows)
    dd_row = jnp.concatenate(pieces, axis=2)                  # [Bt,1,M]
    atdd = jnp.sum(at_row * dd_row, axis=2, keepdims=True)    # [Bt,1,1]
    dddd = jnp.sum(dd_row * dd_row, axis=2, keepdims=True)
    ydoty = jnp.sum(yt * yt, axis=1)[:, None, None]
    n_valid = jnp.sum(m, axis=1)[:, None, None]

    val = (f32(0.5) * n_valid * f32(np.log(2.0 * np.pi)) + logdetB
           + f32(0.5) * n_valid * jnp.log(sn2)[:, :, None]
           + f32(0.5) * ydoty * inv_s2
           - f32(0.5) * atdd * inv_s4
           + f32(0.5) * (sf2c * n_valid - trA2) * inv_s2)

    # ---- P6: Kbar_uu tile reductions --------------------------------------
    # Gamma1 = U_B W_u^T -> R4; Gamma2 = W_u W_B -> R5; e = W_u dd (row)
    for ib in range(mb):
        # R2's strictly-lower entries hold stale values: lower tile blocks
        # keep P3's symmetric B fill, and since the round-5 P-block factor
        # restructure the within-tile below-diagonal is stale workspace
        # too (the old column sweep wrote exact zeros there) — mask the
        # U_B row read to the exact upper triangle
        ub_rows = a_ref[:, ib * _T:(ib + 1) * _T, o2:o2 + M]
        sub_abs_ub = jax.lax.broadcasted_iota(
            jnp.int32, (1, _T, 1), 1) + ib * _T
        ub_rows = jnp.where(lane_m >= sub_abs_ub, ub_rows, f32(0.0))
        wu_full = a_ref[:, 0:M, o1:o1 + M]
        a_ref[:, ib * _T:(ib + 1) * _T, o4:o4 + M] = \
            dot(ub_rows, wu_full, dimension_numbers=kv_dims)
        wu_rows = a_ref[:, ib * _T:(ib + 1) * _T, o1:o1 + M]
        wb_full = a_ref[:, 0:M, o3:o3 + M]
        a_ref[:, ib * _T:(ib + 1) * _T, o5:o5 + M] = \
            dot(wu_rows, wb_full, dimension_numbers=bmm)
    pieces = []
    for ib in range(mb):
        wu_rows = a_ref[:, ib * _T:(ib + 1) * _T, o1:o1 + M]
        pieces.append(dot(dd_row, wu_rows, dimension_numbers=kv_dims))
    e_row = jnp.concatenate(pieces, axis=2)                   # [Bt,1,M]

    gls = [jnp.zeros((Bt, 1, 1), f32) for _ in range(d)]
    gsf2 = jnp.zeros((Bt, 1, 1), f32)
    # mailbox in the dead U_u region serialises the (rb,cb) pairs
    # (cf. ops/pallas_gpr._vg_kernel gradient loop). Kbar_uu and dKuu are
    # both symmetric, so only upper tile pairs run (off-diagonal weight 2) —
    # nearly halves this pass's unrolled op count (Mosaic compile time)
    a_ref[:, 0:1, 0:M] = jnp.zeros((Bt, 1, M), f32)
    for rb in range(mb):
        r0 = rb * _T
        e_r = jnp.swapaxes(
            jax.lax.slice_in_dim(e_row, r0, r0 + _T, axis=2), 1, 2)
        zm_r = _rows(zm, r0)
        for cb in range(rb, mb):
            c0 = cb * _T
            wsym = f32(1.0 if cb == rb else 2.0)
            # gate lane width must match the gated loads' ([Bt,M,T] blocks)
            mbox = a_ref[:, 0:1, 0:_T]
            gate = mbox == mbox
            g1_r = jnp.where(gate, a_ref[:, 0:M, o4 + r0:o4 + r0 + _T],
                             f32(0.0))
            g1_c = jnp.where(gate, a_ref[:, 0:M, o4 + c0:o4 + c0 + _T],
                             f32(0.0))
            t_g1 = dot(g1_r, g1_c, dimension_numbers=bmm_t)   # [Bt,T,T]
            wu_r = a_ref[:, r0:r0 + _T, o1:o1 + M]
            wu_c = a_ref[:, c0:c0 + _T, o1:o1 + M]
            t_wu = dot(wu_r, wu_c, dimension_numbers=kv_dims)
            g2_r = a_ref[:, r0:r0 + _T, o5:o5 + M]
            g2_c = a_ref[:, c0:c0 + _T, o5:o5 + M]
            t_g2 = dot(g2_r, g2_c, dimension_numbers=kv_dims)
            e_c = jax.lax.slice_in_dim(e_row, c0, c0 + _T, axis=2)
            kbar = f32(0.5) * (t_g1 - f32(2.0) * t_wu + t_g2
                               + (e_r * e_c) * inv_s4)
            r2, q2s = _panel(zt_ref, r0, zt_ref, c0, _T)
            phi = _phi(kernel, r2, f32)
            F = _phi_grad(kernel, r2, f32)
            zmm_t = zm_r * _lanes(zm, c0)
            gsf2 = gsf2 + wsym * _reduce11(kbar * (sf2c * phi * zmm_t))
            qf = kbar * (sf2c * F * zmm_t)
            for j in range(d):
                gls[j] = gls[j] + wsym * _reduce11(qf * q2s[j])
            a_ref[:, 0:1, 0:M] = gsf2 + jnp.zeros((Bt, 1, M), f32)

    # ---- P7: Kbar_uf tile reductions --------------------------------------
    for t in range(nt):
        c0 = t * TN
        _build_kuf(t)
        _build_at()
        # beta (row over this tile's lanes)
        ddA = dot(dd_row, a_ref[:, 0:M, o5:o5 + TN],
                  dimension_numbers=bmm)                      # [Bt,1,TN]
        y_t = _lanes(yt, c0, TN)
        beta_row = y_t * inv_s2 - ddA * inv_s4
        # t2 = W_B^T A~ -> R4 (the Kuf staging is dead once A~ is built;
        # TN may exceed the M-wide factor regions, so t2 cannot live there)
        for ib in range(mb):
            wb_cols = a_ref[:, 0:M, o3 + ib * _T:o3 + (ib + 1) * _T]
            at_full = a_ref[:, 0:M, o5:o5 + TN]
            a_ref[:, ib * _T:(ib + 1) * _T, o4:o4 + TN] = \
                dot(wb_cols, at_full, dimension_numbers=bmm_t)
        # v = A~ - W_B t2 + dd beta^T  (overwrites R5 row-block-wise)
        for ib in range(mb):
            binvA = dot(a_ref[:, ib * _T:(ib + 1) * _T, o3:o3 + M],
                        a_ref[:, 0:M, o4:o4 + TN],
                        dimension_numbers=bmm)
            dd_ib = jnp.swapaxes(
                jax.lax.slice_in_dim(dd_row, ib * _T, (ib + 1) * _T,
                                     axis=2), 1, 2)           # [Bt,T,1]
            v = (a_ref[:, ib * _T:(ib + 1) * _T, o5:o5 + TN] - binvA
                 + dd_ib * beta_row)
            a_ref[:, ib * _T:(ib + 1) * _T, o5:o5 + TN] = v
        # Kbar_uf row blocks + reductions (mailbox-serialised)
        a_ref[:, 0:1, 0:M] = gsf2 + jnp.zeros((Bt, 1, M), f32)
        for ib in range(mb):
            r0 = ib * _T
            mbox = a_ref[:, 0:1, 0:M]
            gate = mbox == mbox
            wu_rows = jnp.where(gate, a_ref[:, r0:r0 + _T, o1:o1 + M],
                                f32(0.0))
            v_full = a_ref[:, 0:M, o5:o5 + TN]
            kbar = -dot(wu_rows, v_full, dimension_numbers=bmm) * inv_s2
            r2, q2s = _panel(zt_ref, r0, xt_ref, c0, TN)
            phi = _phi(kernel, r2, f32)
            F = _phi_grad(kernel, r2, f32)
            mm_t = _rows(zm, r0) * _lanes(m, c0, TN)
            gsf2 = gsf2 + _reduce11(kbar * (sf2c * phi * mm_t))
            qf = kbar * (sf2c * F * mm_t)
            for j in range(d):
                gls[j] = gls[j] + _reduce11(qf * q2s[j])
            a_ref[:, 0:1, 0:M] = gsf2 + jnp.zeros((Bt, 1, M), f32)

    # trKff term of d/dlog sf2: (s^-2/2) * sf2 * n
    gsf2 = gsf2 + f32(0.5) * sf2c * n_valid * inv_s2

    # ---- P8: noise gradient (raw s2) --------------------------------------
    g_s2 = (f32(0.5) * inv_s2 * (n_valid - f32(float(M)) + trBinv)
            - f32(0.5) * inv_s4 * (ydoty - atdd * inv_s2 - dddd * inv_s2)
            - f32(0.5) * inv_s4 * (sf2c * n_valid - trA2))

    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, _T), 1)
    o = jnp.where(lane1 == 0, val[:, 0, :], f32(0.0))
    for j in range(d):
        o = o + jnp.where(lane1 == 1 + j, gls[j][:, 0, :], f32(0.0))
    o = o + jnp.where(lane1 == 6, gsf2[:, 0, :], f32(0.0))
    o = o + jnp.where(lane1 == 7, g_s2[:, 0, :], f32(0.0))
    out_ref[:] = o


@functools.partial(jax.jit, static_argnames=("kernel", "d", "jitter",
                                             "interpret"))
def _sgpr_vg_call(xt, yt, zt, p, *, kernel, d, jitter, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bp, _, N = xt.shape
    M = zt.shape[2]
    TN = min(_TN_MAX, N)
    W = max(M, TN)
    bt = _sgpr_group_size(N, M, W)
    G = Bp // bt
    kern = functools.partial(_sgpr_vg_kernel, kernel=kernel, d=d, N=N, M=M,
                             TN=TN, jitter=jitter)
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
            pl.BlockSpec((bt, 8, M), lambda i: (i, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 8), lambda i: (i, z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, _T), lambda i: (i, z),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bt, M, _scratch_lanes(M, W)),
                                   jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xt, yt, zt, p)
    return out


def sgpr_vg_batched(params, X, y, maskf, Z, zmaskf, kernel, jitter,
                    interpret=None):
    """Batched SGPR collapsed negative-ELBO value AND gradient.

    params: dict of [B]-leading arrays (lengthscales [B,d], kernel_variance
    [B], likelihood_variance [B]); X [B,N,D]; y [B,N]; maskf [B,N] float;
    Z [B,M,D]; zmaskf [B,M] float. Returns (val [B], grads) with
    raw-parameter gradients equal to autodiff through ops/sgpr.neg_elbo
    (f32 tolerance).

    Default path: the round-2 *hybrid* — kernel builds, A~, B and all
    adjoint contractions as XLA batched matmuls, with only the two
    latency-bound factorisations fused (ops/pallas_cholinv). Round 5
    re-measured this with device-true probes (sgpr_vg_device_timing.py):
    the hybrid vg is 10.7 ms at the bench profile of which the two
    cholinv calls are 7.7 ms — XLA streams the [B, M, N] einsum chain at
    ~3 ms, so fusing it was never the lever. The grid-streamed split
    (GPSAT_SGPR_STREAM=1, _sgpr_vg_stream) replaces those einsums with
    two small Pallas programs and measured 13.3 ms device-true /
    2.51 s vs 2.29 s pool optimise-only — Mosaic's forced-HIGHEST dot
    precision and tile re-builds cost more than the HBM traffic it
    saves. Kept as a documented negative result + test-covered opt-in.
    GPSAT_SGPR_MEGAKERNEL=1 opts into the monolithic kernel below
    (Mosaic-compiles >50 min at the production shape).
    """
    import os
    if interpret is None:
        interpret = _INTERPRET
    if not os.environ.get("GPSAT_SGPR_MEGAKERNEL"):
        if os.environ.get("GPSAT_SGPR_STREAM", "0") != "0":
            return _sgpr_vg_stream(params, X, y, maskf, Z, zmaskf, kernel,
                                   jitter, interpret)
        return _sgpr_vg_hybrid(params, X, y, maskf, Z, zmaskf, kernel,
                               jitter, interpret)
    B, N, D = X.shape
    M = Z.shape[1]
    f32 = jnp.float32
    N_pad, M_pad, TN, W = _shapes(N, M)
    bt = _sgpr_group_size(N_pad, M_pad, W)
    B_pad = int(-(-B // bt) * bt)

    Xf = jnp.asarray(X, f32)
    mf = jnp.asarray(maskf, f32)
    yf = jnp.asarray(y, f32) * mf
    Zf = jnp.asarray(Z, f32)
    zmf = jnp.asarray(zmaskf, f32)

    xt = jnp.zeros((B, 8, N_pad), f32)
    xt = xt.at[:, :D, :N].set(jnp.swapaxes(Xf, 1, 2))
    xt = xt.at[:, 7, :N].set(mf)
    yt = jnp.zeros((B, N_pad), f32)
    yt = yt.at[:, :N].set(yf)
    zt = jnp.zeros((B, 8, M_pad), f32)
    zt = zt.at[:, :D, :M].set(jnp.swapaxes(Zf, 1, 2))
    zt = zt.at[:, 7, :M].set(zmf)

    ls_in = jnp.asarray(params["lengthscales"], f32).reshape(B, -1)
    scalar_ls = ls_in.shape[1] == 1 and D > 1
    ls = jnp.broadcast_to(ls_in, (B, D)) if scalar_ls else ls_in
    sf2 = jnp.asarray(params["kernel_variance"], f32).reshape(B)
    sn2 = jnp.asarray(params["likelihood_variance"], f32).reshape(B)
    p = jnp.zeros((B, 8), f32)
    p = p.at[:, :D].set(ls)
    p = p.at[:, 5].set(sf2)
    p = p.at[:, 6].set(sn2)

    if B_pad != B:
        pad = B_pad - B
        xt = jnp.concatenate([xt, jnp.zeros((pad, 8, N_pad), f32)], axis=0)
        yt = jnp.concatenate([yt, jnp.zeros((pad, N_pad), f32)], axis=0)
        zt = jnp.concatenate([zt, jnp.zeros((pad, 8, M_pad), f32)], axis=0)
        p_tail = jnp.zeros((pad, 8), f32).at[:, :D].set(1.0)
        p_tail = p_tail.at[:, 5].set(1.0).at[:, 6].set(1.0)
        p = jnp.concatenate([p, p_tail], axis=0)

    out = _sgpr_vg_call(xt, yt, zt, p, kernel=kernel, d=D,
                        jitter=float(jitter), interpret=interpret)[:B]
    val = out[:, 0]
    g_logls = out[:, 1:1 + D]
    g_ls = g_logls / ls
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
