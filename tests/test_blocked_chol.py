"""Blocked batched f64 Cholesky + triangular inverse (solvers/blocked_chol).

On TPU this replaces XLA's unblocked f64 cholesky/trisolve (the measured
factor bottleneck of the f64 step set); tests force it on the CPU mesh via
IXM_BLOCKED_CHOL=1 and pin agreement with the LAPACK-grade path at the
real block geometry and through a full IPM solve.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from infiniteexamodels_jl_tpu.solvers.blocked_chol import (
    blocked_chol_linv, blocked_chol_enabled)


def _spd(nb, n, cond, seed=0):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((nb, n, n)))
    ev = np.exp(np.linspace(0, np.log(cond), n))[None, :] / cond
    D = np.einsum("kij,kj,klj->kil", Q, ev, Q)
    return 0.5 * (D + D.transpose(0, 2, 1))


@pytest.mark.parametrize("nb,n,cond", [(40, 64, 1e2), (17, 64, 1e8),
                                       (5, 24, 1e4), (3, 8, 1e1)])
def test_matches_lapack(nb, n, cond):
    D = _spd(nb, n, cond)
    L, X = blocked_chol_linv(jnp.asarray(D))
    Lx = np.linalg.cholesky(D)
    rel = np.max(np.abs(np.asarray(L) - Lx)) / np.max(np.abs(Lx))
    assert rel < 1e-11
    eye = np.einsum("kij,kjl->kil", np.asarray(X), Lx)
    assert np.max(np.abs(eye - np.eye(n))) < 1e-8 * max(cond * 1e-8, 1.0)
    # strictly lower-triangular contract
    assert np.allclose(np.triu(np.asarray(L), 1), 0.0)
    assert np.allclose(np.triu(np.asarray(X), 1), 0.0)


def test_non_spd_propagates_nan():
    D = np.eye(16)[None].repeat(3, 0)
    D[1] *= -1.0
    _, X = blocked_chol_linv(jnp.asarray(D))
    X = np.asarray(X)
    assert np.isnan(X[1]).any()
    assert np.isfinite(X[0]).all() and np.isfinite(X[2]).all()


def test_env_gating(monkeypatch):
    monkeypatch.setenv("IXM_BLOCKED_CHOL", "1")
    assert blocked_chol_enabled(jnp.float64)
    assert not blocked_chol_enabled(jnp.float32)   # f64-only path
    monkeypatch.setenv("IXM_BLOCKED_CHOL", "0")
    assert not blocked_chol_enabled(jnp.float64)


def test_ipm_solve_through_blocked_path(monkeypatch):
    """Full quadrotor solve with the blocked f64 factor forced: must match
    the default path's certified objective."""
    import jax
    monkeypatch.setenv("IXM_BLOCKED_CHOL", "1")
    from infiniteexamodels_jl_tpu.models import quad
    from infiniteexamodels_jl_tpu.transcribe import transcribe
    from infiniteexamodels_jl_tpu.solvers.ipm import IpmSolver as S

    simd, _ = transcribe(quad(num_supports=40))
    r = S(simd, print_level=0, linear_solver="auto", tol=1e-8).solve()
    assert r.status == "first_order"
    monkeypatch.setenv("IXM_BLOCKED_CHOL", "0")
    jax.clear_caches()     # the env gate is read at trace time
    r0 = S(simd, print_level=0, linear_solver="auto", tol=1e-8).solve()
    assert r.objective == pytest.approx(r0.objective, abs=1e-9)


def test_ozaki_bmv_f64_grade():
    """Ozaki-sliced matvec: exact-accumulating f32 slice products must
    reproduce the f64 batched matvec to ~1e-15 scaled error, including
    KKT-like 16-decade dynamic range."""
    from infiniteexamodels_jl_tpu.solvers.blocked_chol import (
        ozaki_slices, ozaki_bmv)

    rng = np.random.default_rng(0)
    for spread in (1.0, 1e8):
        A = rng.standard_normal((17, 64, 64)) * (
            spread ** rng.uniform(-1, 1, (17, 64, 1)))
        v = rng.standard_normal((17, 64)) * (
            spread ** rng.uniform(-1, 1, (17, 1)))
        SA, sA = ozaki_slices(jnp.asarray(A), axis=-1)
        out = np.asarray(ozaki_bmv(SA, sA, jnp.asarray(v)))
        ref = np.einsum("kij,kj->ki", A, v)
        denom = np.abs(A).max(-1) * np.abs(v).max(-1, keepdims=True)
        assert np.max(np.abs(out - ref) / (denom + 1e-300)) < 1e-13


def test_ozaki_prepared_matvec_matches(monkeypatch):
    """BlockTridiagKKT.make_matvec with IXM_OZAKI=1 must agree with the
    plain f64 matvec on an assembled quadrotor KKT."""
    import jax
    from infiniteexamodels_jl_tpu.models import quad
    from infiniteexamodels_jl_tpu.transcribe import transcribe
    from infiniteexamodels_jl_tpu.solvers.block_tridiag import (
        BlockTridiagKKT)

    simd, _ = transcribe(quad(num_supports=30))
    kkt = BlockTridiagKKT(simd)
    x = jnp.asarray(simd.x0)
    th = jnp.asarray(simd.theta)
    lam = jnp.ones(simd.ncon)
    K = kkt.assemble(x, th, lam, 1.0, jnp.ones(simd.ncon),
                     jnp.ones(simd.nvar))
    v = jnp.asarray(np.random.default_rng(1).standard_normal(simd.nvar))
    ref = np.asarray(kkt.matvec(K, v))
    monkeypatch.setenv("IXM_OZAKI", "1")
    jax.clear_caches()
    out = np.asarray(kkt.make_matvec(K)(v))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out, ref, atol=1e-12 * scale, rtol=0)


@pytest.mark.parametrize("nb,n,cond", [(40, 64, 1e2), (17, 64, 1e8)])
def test_ozaki_factor_matches(nb, n, cond, monkeypatch):
    """Ozaki-sliced exact-f64 factor products (Schur gram + inverse
    substitution on the f32 MXU) must agree with the plain emulated-f64
    matmuls at f64 grade."""
    monkeypatch.setenv("IXM_OZAKI_FACTOR", "1")
    import importlib
    D = _spd(nb, n, cond)
    L, X = blocked_chol_linv(jnp.asarray(D))
    monkeypatch.setenv("IXM_OZAKI_FACTOR", "0")
    L0, X0 = blocked_chol_linv(jnp.asarray(D))
    relL = np.max(np.abs(np.asarray(L) - np.asarray(L0))) \
        / np.max(np.abs(np.asarray(L0)))
    relX = np.max(np.abs(np.asarray(X) - np.asarray(X0))) \
        / np.max(np.abs(np.asarray(X0)))
    # two backward-stable factorizations may differ by ~cond*eps; the
    # measured gap (6e-13 at cond=1e8) is far inside that
    assert relL < 1e-13 * max(cond * 1e-4, 1.0), relL
    assert relX < 1e-10 * max(cond * 1e-6, 1.0), relX
