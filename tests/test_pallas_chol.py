"""Pallas fused batched Cholesky + L^{-1} kernel (solvers/pallas_chol.py).

Runs in interpret mode on the CPU test mesh; on-chip behavior is covered by
the bench (factor_dtype=float32/ir32 routes _chol_linv through the kernel).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from infiniteexamodels_jl_tpu.solvers.pallas_chol import chol_linv_pallas


def _spd_batch(nb, n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((nb, n, n)).astype(np.float32)
    return (A @ A.transpose(0, 2, 1) + n * np.eye(n, dtype=np.float32))


@pytest.mark.parametrize("nb,n", [(1, 8), (3, 16), (17, 24)])
def test_matches_xla_cholesky(nb, n):
    D = _spd_batch(nb, n)
    L, Linv, ok = chol_linv_pallas(jnp.asarray(D), interpret=True)
    assert bool(ok)
    Lx = np.linalg.cholesky(D.astype(np.float64))
    # f32 kernel vs f64 reference: tolerance scaled to f32 conditioning
    np.testing.assert_allclose(np.asarray(L), Lx, rtol=2e-4, atol=2e-4)
    recon = np.asarray(Linv) @ Lx
    eye = np.broadcast_to(np.eye(n), (nb, n, n))
    np.testing.assert_allclose(recon, eye, atol=5e-4)
    # strict triangularity
    assert np.allclose(np.triu(np.asarray(L), 1), 0.0)
    assert np.allclose(np.triu(np.asarray(Linv), 1), 0.0)


def test_nonspd_block_flags_not_ok():
    D = _spd_batch(4, 8, seed=1)
    D[2] = -np.eye(8, dtype=np.float32)      # indefinite block
    _, _, ok = chol_linv_pallas(jnp.asarray(D), interpret=True)
    assert not bool(ok)


def test_padding_chunks():
    # nb not a multiple of the internal chunk G exercises identity padding
    D = _spd_batch(9, 8, seed=2)
    L, Linv, ok = chol_linv_pallas(jnp.asarray(D), interpret=True)
    assert bool(ok) and L.shape == (9, 8, 8) and Linv.shape == (9, 8, 8)
