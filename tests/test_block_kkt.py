"""Structured (block-tridiagonal + arrowhead) KKT backend tests: parity with
the dense backend and correctness of factor/solve/matvec."""
import numpy as np
import jax.numpy as jnp
import pytest

from infiniteexamodels_jl_tpu.backend import ExaTranscriptionBackend
from infiniteexamodels_jl_tpu.solvers import IpmSolver, DenseKKT
from infiniteexamodels_jl_tpu.solvers.block_tridiag import (
    BlockTridiagKKT, make_structured_kkt)
from infiniteexamodels_jl_tpu.models import hovercraft, farmer
from infiniteexamodels_jl_tpu.transcribe import transcribe


def _linear_system_parity(model):
    """assemble/factor/solve of both backends must agree."""
    dense = DenseKKT(model)
    bt = BlockTridiagKKT(model, min_blocks=2, max_block=2048)
    assert bt.usable
    x = model.x0 + 0.01
    lam = jnp.ones(model.ncon) * 0.1
    d = jnp.ones(model.ncon) * 2.0
    diag = jnp.ones(model.nvar) * 3.0
    Kd = dense.assemble(x, model.theta, lam, 1.0, d, diag)
    Kb = bt.assemble(x, model.theta, lam, 1.0, d, diag)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=model.nvar))
    # matvec parity
    np.testing.assert_allclose(np.asarray(bt.matvec(Kb, v)),
                               np.asarray(Kd @ v), rtol=1e-10, atol=1e-8)
    # solve parity (dense K is SPD thanks to the diagonal shift)
    fd, okd = dense.factor(Kd)
    fb, okb = bt.factor(Kb)
    assert bool(okd) and bool(okb)
    rhs = jnp.asarray(rng.normal(size=model.nvar))
    np.testing.assert_allclose(np.asarray(bt.solve(fb, rhs)),
                               np.asarray(dense.solve(fd, rhs)),
                               rtol=1e-8, atol=1e-8)


def test_block_kkt_parity_hovercraft():
    m = hovercraft(num_supports=41)
    simd, _ = transcribe(m)
    _linear_system_parity(simd)


def test_block_kkt_parity_farmer():
    # scenario block-diagonal + first-stage arrowhead border
    m = farmer(num_scenarios=64)
    simd, _ = transcribe(m)
    _linear_system_parity(simd)


def test_ipm_with_block_kkt_matches_dense():
    m = hovercraft(num_supports=41)
    m.set_transformation_backend(ExaTranscriptionBackend(IpmSolver))
    m.set_silent()
    res_dense = m.optimize()
    assert res_dense.status == "first_order"

    m2 = hovercraft(num_supports=41)
    m2.set_transformation_backend(
        ExaTranscriptionBackend(IpmSolver, linear_solver="auto"))
    m2.set_silent()
    res_bt = m2.optimize()
    assert res_bt.status == "first_order"
    # both runs are tol=1e-8 first_order certificates of *different*
    # factorization routes; their objectives agree only to O(tol)
    assert res_bt.objective == pytest.approx(res_dense.objective, abs=1e-7)
    np.testing.assert_allclose(res_bt.solution, res_dense.solution,
                               atol=1e-6)


def test_ipm_with_native_ldl_matches_dense():
    """The native C++ sparse LDL^T path (the reference's MA27-role CPU
    factorization) reproduces the device path."""
    m = hovercraft(num_supports=31)
    m.set_transformation_backend(ExaTranscriptionBackend(IpmSolver))
    m.set_silent()
    res_dense = m.optimize()

    m2 = hovercraft(num_supports=31)
    m2.set_transformation_backend(
        ExaTranscriptionBackend(IpmSolver, linear_solver="ldl_cpp"))
    m2.set_silent()
    res_ldl = m2.optimize()
    assert res_ldl.status == "first_order"
    assert res_ldl.objective == pytest.approx(res_dense.objective, abs=1e-9)
    np.testing.assert_allclose(res_ldl.solution, res_dense.solution,
                               atol=1e-7)


# -- mixed / low-precision factorization convergence ----------------------
# factor_dtype="mixed": native-f32 factorization while mu is hot, f64
# endgame -- must certify first_order at tol=1e-8 with the same objective
# as the all-f64 path (VERDICT round-1 item: the f32 path must actually
# converge, not diverge at small mu).  "float32": no mu threshold at all --
# the f32 factorization runs until its f64 refinement stops contracting,
# then DEMOTE_F32 hands the unchanged state to the f64 step set; without
# that residual-driven handover this configuration stalled (round-1
# README:119-122).  Split into one test per (problem, dtype) so the compile
# inventories run in parallel under xdist.
def _low_precision_case(build, fdtype, **approx_kw):
    from infiniteexamodels_jl_tpu.solvers.ipm import IpmSolver as S

    simd, _ = transcribe(build())
    r64 = S(simd, print_level=0, linear_solver="auto", tol=1e-8).solve()
    assert r64.status == "first_order"
    s = S(simd, print_level=0, linear_solver="auto", tol=1e-8,
          factor_dtype=fdtype)
    assert s.kkt32 is not None
    r = s.solve()
    assert r.status == "first_order"
    assert r.objective == pytest.approx(r64.objective, **approx_kw)


@pytest.mark.slow
def test_mixed_precision_quad():
    from infiniteexamodels_jl_tpu.models import quad

    _low_precision_case(lambda: quad(num_supports=50), "mixed", abs=1e-7)


def test_mixed_precision_farmer():
    _low_precision_case(lambda: farmer(num_scenarios=32), "mixed", rel=1e-9)


@pytest.mark.slow
def test_float32_demotion_quad():
    from infiniteexamodels_jl_tpu.models import quad

    _low_precision_case(lambda: quad(num_supports=50), "float32", abs=1e-7)


def test_float32_demotion_farmer():
    _low_precision_case(lambda: farmer(num_scenarios=32), "float32",
                        rel=1e-9)


# "ir32": f32 assembly + f32 factorization, refined MATRIX-FREE against the
# exact f64 operator (hvp_lag + COO jprod/jtprod -- classical
# factor-low/refine-high IR without materializing an f64 K) -- f64-quality
# steps, so it must certify at tol=1e-8 without ever demoting on these
# well-conditioned problems.
@pytest.mark.slow
def test_ir32_quad():
    from infiniteexamodels_jl_tpu.models import quad
    from infiniteexamodels_jl_tpu.solvers.ipm import IpmSolver as S

    simd, _ = transcribe(quad(num_supports=50))
    r64 = S(simd, print_level=0, linear_solver="auto", tol=1e-8).solve()
    si = S(simd, print_level=0, linear_solver="auto", tol=1e-8,
           factor_dtype="ir32")
    assert si.kkt32 is not None
    assert si.kkt32.assemble_dtype == jnp.float32  # K feeds only factor
    ri = si.solve()
    assert ri.status == "first_order"
    assert ri.objective == pytest.approx(r64.objective, abs=1e-7)


def test_ir32_farmer():
    from infiniteexamodels_jl_tpu.solvers.ipm import IpmSolver as S

    simd2, _ = transcribe(farmer(num_scenarios=32))
    r64b = S(simd2, print_level=0, linear_solver="auto", tol=1e-8).solve()
    rib = S(simd2, print_level=0, linear_solver="auto", tol=1e-8,
            factor_dtype="ir32").solve()
    assert rib.status == "first_order"
    assert rib.objective == pytest.approx(r64b.objective, rel=1e-9)


def test_gather_assembly_matches_scatter(monkeypatch):
    """The gather+segment-sum+unique-set assembly (round-4, replaces the
    sorted scatter-ADD that cost 73 ms/iteration in emulated f64 on chip)
    must produce bit-identical K blocks to the scatter path."""
    import jax
    from infiniteexamodels_jl_tpu.models import quad

    simd, _ = transcribe(quad(num_supports=30))
    kkt = BlockTridiagKKT(simd)
    assert kkt.usable
    x = jnp.asarray(simd.x0)
    th = jnp.asarray(simd.theta)
    lam = jnp.ones(simd.ncon)
    d = jnp.ones(simd.ncon)
    de = jnp.ones(simd.nvar)

    monkeypatch.setenv("IXM_GATHER_ASM", "1")
    K1 = jax.jit(lambda: kkt.assemble(x, th, lam, 1.0, d, de))()
    monkeypatch.setenv("IXM_GATHER_ASM", "0")
    jax.clear_caches()              # env gate is read at trace time
    K0 = jax.jit(lambda: kkt.assemble(x, th, lam, 1.0, d, de))()
    for a, b in zip(K1, K0):
        if a.size:
            assert float(jnp.max(jnp.abs(a - b))) == 0.0


def test_dia_assembly_matches_scatter(monkeypatch):
    """DIA (diagonal-form) assembly -- the TPU fast path that replaces
    the latency-bound value gather with dense pads + a skew-trick
    block extraction -- must produce the same K as the scatter path on
    a collocation OCP (period-3 stencil runs + stride-2 coll_u
    families exercise the multi-stride/multi-phase plan)."""
    import jax
    from infiniteexamodels_jl_tpu.models import quad

    simd, _ = transcribe(quad(num_supports=40))
    kkt = BlockTridiagKKT(simd)
    assert kkt.usable and kkt.mode == "band"
    x = jnp.asarray(simd.x0) + 0.01
    th = jnp.asarray(simd.theta)
    lam = jnp.linspace(0.5, 1.5, simd.ncon)
    d = jnp.full(simd.ncon, 0.7)
    de = jnp.full(simd.nvar, 0.3)

    monkeypatch.setenv("IXM_DIA_ASM", "0")
    K0 = jax.jit(lambda: kkt.assemble(x, th, lam, 1.0, d, de))()
    monkeypatch.setenv("IXM_DIA_ASM", "1")
    kkt._dia_ok = None              # re-evaluate the lazy plan
    jax.clear_caches()              # env gate is read at trace time
    K1 = jax.jit(lambda: kkt.assemble(x, th, lam, 1.0, d, de))()
    plan = kkt._dia
    assert plan is not None and plan["coverage"] > 0.95
    assert len(plan["strides"]) >= 2       # stencil + coll_u strides
    scale = float(jnp.max(jnp.abs(K0[0])))
    for a, b in zip(K0, K1):
        if a.size:
            assert float(jnp.max(jnp.abs(a - b))) <= 1e-12 * scale

    # f32 assembly takes the same plan (assemble_dtype is how the
    # low-precision step sets request an f32-assembled K)
    kkt32 = BlockTridiagKKT(simd, factor_dtype=jnp.float32)
    kkt32.assemble_dtype = jnp.float32
    monkeypatch.setenv("IXM_DIA_ASM", "0")
    K0f = jax.jit(lambda: kkt32.assemble(x, th, lam, 1.0, d, de))()
    monkeypatch.setenv("IXM_DIA_ASM", "1")
    kkt32._dia_ok = None
    jax.clear_caches()
    K1f = jax.jit(lambda: kkt32.assemble(x, th, lam, 1.0, d, de))()
    assert K1f[0].dtype == jnp.float32
    for a, b in zip(K0f, K1f):
        if a.size:
            assert float(jnp.max(jnp.abs(a - b))) <= 1e-4 * scale


def test_dia_assembly_full_solve(monkeypatch):
    """A full IPM solve with DIA assembly forced on matches the scatter
    path's certified objective (quad-30 oracle path)."""
    from infiniteexamodels_jl_tpu.models import quad

    results = {}
    for v in ("0", "1"):
        monkeypatch.setenv("IXM_DIA_ASM", v)
        import jax

        jax.clear_caches()
        m = quad(num_supports=30)
        b = ExaTranscriptionBackend(IpmSolver, linear_solver="auto",
                                    print_level=0, tol=1e-6)
        m.set_transformation_backend(b)
        b.build(m)
        results[v] = b.optimize(m)
    assert results["1"].status == "first_order"
    assert results["1"].objective == pytest.approx(
        results["0"].objective, rel=1e-8)
