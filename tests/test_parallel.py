"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from infiniteexamodels_jl_tpu.backend import ExaTranscriptionBackend
from infiniteexamodels_jl_tpu.solvers import IpmSolver
from infiniteexamodels_jl_tpu.parallel import (
    make_mesh, shard_model, sharded_fraction)
from infiniteexamodels_jl_tpu.models import pandemic, farmer
from infiniteexamodels_jl_tpu.transcribe import transcribe


def test_sharded_evals_match_replicated():
    m = farmer(num_scenarios=80)
    simd, _ = transcribe(m)
    x = simd.x0 + 0.1
    ref_obj = float(simd.obj(x, simd.theta))
    ref_grad = np.asarray(simd.grad(x, simd.theta))
    ref_cons = np.asarray(simd.cons(x, simd.theta))

    mesh = make_mesh(8)
    shard_model(simd, mesh)
    assert sharded_fraction(simd, mesh) > 0.5
    obj_j = jax.jit(simd.obj)
    assert float(obj_j(x, simd.theta)) == pytest.approx(ref_obj, rel=1e-12)
    np.testing.assert_allclose(np.asarray(jax.jit(simd.grad)(x, simd.theta)),
                               ref_grad, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(jax.jit(simd.cons)(x, simd.theta)),
                               ref_cons, rtol=1e-10)


def test_sharded_ipm_steps_match():
    """IPM iterations over a sharded model match the single-device
    trajectory bit-for-bit-ish (scenario-parallel data distribution).
    A handful of steps keeps the 8-virtual-device CPU run fast; the full
    sharded solve is exercised by __graft_entry__.dryrun_multichip and the
    bench harness."""
    def build():
        m = farmer(num_scenarios=40)
        m.set_transformation_backend(ExaTranscriptionBackend(IpmSolver))
        m.set_silent()
        m.backend.build(m)
        return m

    def run_steps(m, nsteps=4):
        model = m.backend.model
        s = IpmSolver(model, print_level=0)
        consts = s._make_consts(model.theta)
        st = s._init_jit(model.x0, model.y0, consts)
        for _ in range(nsteps):
            st = s._step_jit(st, consts)
        return st

    st1 = run_steps(build())
    m2 = build()
    shard_model(m2.backend.model, make_mesh(8))
    st2 = run_steps(m2)
    np.testing.assert_allclose(np.asarray(st2.x), np.asarray(st1.x),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(st2.y), np.asarray(st1.y),
                               rtol=1e-8, atol=1e-9)
