"""Pallas fused batched Cholesky + L^{-1} kernel (solvers/pallas_chol.py).

Runs in interpret mode on the CPU test mesh.  The kernel is OPT-IN
(IXM_PALLAS=1): the device toolchain behind this machine's remote-compile
tunnel rejects rank-3 Pallas blocks outright, so the default device path
stays on XLA (see pallas_chol_enabled); these tests cover the kernel's
numerics, the dispatch layer, and -- at bench-real block sizes -- the
_bcr_factor integration the round-3 small-size tests missed.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from infiniteexamodels_jl_tpu.solvers.pallas_chol import (
    chol_linv_pallas, pallas_chol_enabled)


def _spd_batch(nb, n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((nb, n, n)).astype(np.float32)
    return (A @ A.transpose(0, 2, 1) + n * np.eye(n, dtype=np.float32))


@pytest.mark.parametrize("layout", ["rank2", "rank3"])
@pytest.mark.parametrize("nb,n", [(1, 8), (3, 16), (17, 24)])
def test_matches_xla_cholesky(nb, n, layout):
    D = _spd_batch(nb, n)
    L, Linv, ok = chol_linv_pallas(jnp.asarray(D), interpret=True,
                                   layout=layout)
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


# ----------------------------------------------------------------------
# dispatch layer (ADVICE r3 item 2: round 3 only ever called the kernel
# directly; the _chol_linv/_lsolve/_bcr_factor routing shipped untested)
# ----------------------------------------------------------------------
def test_dispatch_env_gating(monkeypatch):
    monkeypatch.setenv("IXM_PALLAS", "0")
    assert not pallas_chol_enabled(jnp.float32)
    monkeypatch.setenv("IXM_PALLAS", "1")
    assert pallas_chol_enabled(jnp.float32)
    assert not pallas_chol_enabled(jnp.float64)   # kernel is f32-only
    # default is OFF everywhere until an on-device smoke validates the
    # toolchain (the tunnel Mosaic rejects rank-3 blocks)
    monkeypatch.delenv("IXM_PALLAS", raising=False)
    assert not pallas_chol_enabled(jnp.float32)


def test_chol_linv_routing_matches_xla(monkeypatch):
    from infiniteexamodels_jl_tpu.solvers.block_tridiag import (
        _chol_linv, _lsolve)

    D = jnp.asarray(_spd_batch(5, 16, seed=3))
    monkeypatch.setenv("IXM_PALLAS", "0")
    L0, Li0, ok0 = _chol_linv(D)
    X = jnp.asarray(np.random.default_rng(4).standard_normal(
        (5, 16, 3)).astype(np.float32))
    W0 = _lsolve(L0, Li0, X)
    monkeypatch.setenv("IXM_PALLAS", "1")
    L1, Li1, ok1 = _chol_linv(D)
    W1 = _lsolve(L1, Li1, X)
    assert bool(ok0) and bool(ok1)
    np.testing.assert_allclose(np.asarray(L1), np.asarray(L0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(W1), np.asarray(W0),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_bcr_factor_bench_scale(monkeypatch):
    """_bcr_factor through the Pallas routing at the REAL quad-1000 block
    geometry (bs=64; nb scaled down from 640 to keep interpret-mode time
    sane but with multiple BCR levels and multiple kernel chunks)."""
    from infiniteexamodels_jl_tpu.solvers.block_tridiag import (
        _bcr_factor, _bcr_solve)

    nb, bs = 48, 64
    rng = np.random.default_rng(5)
    D = jnp.asarray(_spd_batch(nb, bs, seed=5) + 3 * bs * np.eye(
        bs, dtype=np.float32))
    E = jnp.asarray(0.1 * rng.standard_normal(
        (nb - 1, bs, bs)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((nb, bs)).astype(np.float32))

    monkeypatch.setenv("IXM_PALLAS", "0")
    lv0, r0, ok0 = _bcr_factor(D, E)
    x0 = _bcr_solve(lv0, r0, b)
    monkeypatch.setenv("IXM_PALLAS", "1")
    lv1, r1, ok1 = _bcr_factor(D, E)
    x1 = _bcr_solve(lv1, r1, b)
    assert bool(ok0) and bool(ok1)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0),
                               rtol=5e-3, atol=5e-4)
