"""Batched masked Cholesky + triangular-inverse kernel (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp


def make_spd(B=5, M=256, m_valid=(256, 200, 128, 250, 1), seed=0):
    rng = np.random.default_rng(seed)
    A = np.zeros((B, M, M), np.float64)
    for b in range(B):
        mv = m_valid[b]
        G = rng.standard_normal((mv, mv))
        S = G @ G.T / mv + np.eye(mv) * 0.5
        A[b, :mv, :mv] = S
        A[b, range(mv, M), range(mv, M)] = 1.0
    return A


@pytest.mark.parametrize("M", [128, 384])
def test_cholinv_matches_numpy(M):
    from gpsat_tpu.ops.pallas_cholinv import cholinv_batched

    mv = (M, M - 56, M // 2, M - 6, 1)
    A = make_spd(M=M, m_valid=mv)
    W, ld = cholinv_batched(jnp.asarray(A, jnp.float32), interpret=True)
    W, ld = np.asarray(W), np.asarray(ld)
    for b in range(A.shape[0]):
        L = np.linalg.cholesky(A[b])
        np.testing.assert_allclose(W[b], np.linalg.inv(L.T),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(ld[b], np.log(np.diag(L)).sum(),
                                   rtol=1e-4, atol=1e-4)
        # A^{-1} = W W^T to f32 accuracy
        np.testing.assert_allclose(A[b] @ (W[b] @ W[b].T), np.eye(M),
                                   atol=5e-3)
    # W strictly-lower must be exactly zero (consumers matmul full rows)
    tril = np.tril(np.ones((M, M)), -1).astype(bool)
    assert (W[:, tril] == 0).all()


def test_cholinv_xla_fallback_matches():
    from gpsat_tpu.ops.pallas_cholinv import cholinv_batched

    A = make_spd(B=3, M=128, m_valid=(128, 100, 64))
    W1, ld1 = cholinv_batched(jnp.asarray(A, jnp.float32), interpret=True)
    W2, ld2 = cholinv_batched(jnp.asarray(A, jnp.float32),
                              interpret=False)   # CPU -> XLA fallback
    np.testing.assert_allclose(np.asarray(W1), np.asarray(W2),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld2),
                               rtol=1e-4, atol=1e-4)
