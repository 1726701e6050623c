"""End-to-end solves of the benchmark model families at reduced sizes
(the reference validates these via examples/runexamples.jl + ESCAPE34)."""
import numpy as np
import pytest

from infiniteexamodels_jl_tpu.backend import ExaTranscriptionBackend
from infiniteexamodels_jl_tpu.solvers import IpmSolver
from infiniteexamodels_jl_tpu.models import (
    hovercraft, quad, pandemic, kinetic_control, farmer, design_3node, opf)
from infiniteexamodels_jl_tpu.modeling import deriv


def attach(m):
    m.set_transformation_backend(
        ExaTranscriptionBackend(IpmSolver, linear_solver="auto"))
    m.set_silent()
    return m


def test_hovercraft_hits_waypoints():
    m = attach(hovercraft(num_supports=41))
    res = m.optimize()
    assert res.status == "first_order"
    data = m.backend.data
    xvals = [np.asarray(m.value(v))
             for v in (m.infinite_vars[0], m.infinite_vars[1])]
    tg = np.asarray(m.supports(m.infinite_vars[0]))
    xw = np.array([[1, 4, 6, 1], [1, 3, 0, 1]], dtype=float)
    for j, tw in enumerate([0.0, 25.0, 50.0, 60.0]):
        k = int(np.argmin(np.abs(tg - tw)))
        assert xvals[0][k] == pytest.approx(xw[0, j], abs=1e-6)
        assert xvals[1][k] == pytest.approx(xw[1, j], abs=1e-6)


def test_quadrotor_small():
    m = attach(quad(num_supports=12))
    res = m.optimize()
    assert res.status == "first_order"
    assert np.isfinite(m.objective_value())
    # states start at 0
    for v in m.infinite_vars[:9]:
        assert np.asarray(m.value(v))[0] == pytest.approx(0.0, abs=1e-6)


def test_pandemic():
    """The SEIR cap constraint is a high-order state constraint: the
    discretized NLP is degenerate (large multipliers on the singular arc).
    At tol=1e-6 the sd-scaled dual test passes and the solve certifies
    first_order (matching practical Ipopt usage); the tol=1e-8 certificate
    is a roadmap item (proximal dual stabilization)."""
    m = pandemic(num_supports=51, num_scenarios=4)
    m.set_transformation_backend(
        ExaTranscriptionBackend(IpmSolver, linear_solver="auto", tol=1e-6))
    m.set_silent()
    m.set_attribute("max_iter", 800)
    res = m.optimize()
    assert res.status == "first_order"
    assert res.primal_feas <= 1e-4
    assert 28.9 <= m.objective_value() <= 29.4
    i_var = next(v for v in m.infinite_vars if v.name == "i")
    ivals = np.asarray(m.value(i_var))
    assert ivals.shape[1] == 4
    assert np.all(ivals <= 0.02 + 1e-5)
    u = next(v for v in m.infinite_vars if v.name == "u")
    uv = np.asarray(m.value(u))
    assert np.all(uv >= -1e-6) and np.all(uv <= 0.8 + 1e-6)


def test_kinetics_small():
    m = attach(kinetic_control(num_supports=30))
    res = m.optimize()
    assert res.status in ("first_order", "acceptable")
    # maximized product concentration is positive and bounded by c0 total
    assert 0.0 < m.objective_value() <= 1.0


def test_farmer():
    m = attach(farmer(num_scenarios=300))
    res = m.optimize()
    assert res.status == "first_order"
    xs = [m.value(v) for v in m.finite_vars]
    assert sum(xs) <= 500.0 + 1e-6
    assert all(x >= -1e-8 for x in xs)


def test_design_3node():
    m = attach(design_3node(num_scenarios=200))
    res = m.optimize()
    assert res.status == "first_order"
    assert 0.0 <= m.objective_value() <= 1.0


def test_opf_stochastic():
    m = attach(opf(num_supports=10))
    res = m.optimize()
    assert res.status == "first_order"
    assert np.isfinite(m.objective_value())
    assert m.objective_value() > 0.0
