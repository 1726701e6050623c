"""SEIR pandemic control under parametric uncertainty (reference
ESCAPE34/pandemic.jl): time x scenario product grid, uncertain incubation
rate xi ~ Uniform, shared control u(t), infection-cap path constraint."""
from __future__ import annotations

import numpy as np

from ..modeling import InfiniteModel, uniform, integral, deriv


def pandemic(seed=0, num_supports=100, num_scenarios=4, backend=None,
             dmethod=None):
    gamma = 0.303
    beta = 0.727
    N = 1e5
    extra_ts = [0.001, 0.002, 0.004, 0.008, 0.02, 0.04, 0.08, 0.2, 0.4, 0.8]

    m = InfiniteModel(backend, seed=seed)
    kwargs = {}
    if dmethod is not None:
        kwargs["derivative_method"] = dmethod
    t = m.infinite_parameter("t", domain=(0, 200), num_supports=num_supports,
                             **kwargs)
    xi = m.infinite_parameter("xi", dist=uniform(0.1, 0.6),
                              num_supports=num_scenarios)
    m.add_supports(t, extra_ts)
    s = m.variable("s", deps=(t, xi), lb=0)
    e = m.variable("e", deps=(t, xi), lb=0)
    i = m.variable("i", deps=(t, xi), lb=0)
    r = m.variable("r", deps=(t, xi), lb=0)
    u = m.variable("u", deps=(t,), lb=0, ub=0.8, start=0.2)
    m.minimize(integral(u, t))
    m.constraint(s(0, xi) == 1 - 1 / N)
    m.constraint(e(0, xi) == 1 / N)
    m.constraint(i(0, xi) == 0)
    m.constraint(r(0, xi) == 0)
    m.constraint(deriv(s, t) == -(1 - u) * beta * s * i, name="s_constr")
    m.constraint(deriv(e, t) == (1 - u) * beta * s * i - xi * e,
                 name="e_constr")
    m.constraint(deriv(i, t) == xi * e - gamma * i, name="i_constr")
    m.constraint(deriv(r, t) == gamma * i, name="r_constr")
    m.constraint(i <= 0.02, name="imax_constr")
    return m
