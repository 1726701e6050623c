# scratch end-to-end debug (deleted before final commit series ends)
import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
from infiniteexamodels_jl_tpu.modeling import (
    InfiniteModel, integral, deriv, sin)
from infiniteexamodels_jl_tpu.backend import ExaTranscriptionBackend
from infiniteexamodels_jl_tpu.solvers import IpmSolver

# --- reference test/solve.jl "Parameter updates" oracle ---------------------
m = InfiniteModel(ExaTranscriptionBackend(IpmSolver))
t = m.infinite_parameter("t", domain=(0, 1), num_supports=3)
p1 = m.finite_parameter("p1", 100.0)
p2 = m.finite_parameter("p2", 1.0)
x = [m.variable(f"x{i}", deps=(t,)) for i in range(2)]
m.minimize(p1 * integral((x[1] - x[0]**2)**2, t)
           + integral((p2 - x[0])**2, t))
for i, ub in enumerate([0.5, 3.0]):
    m.constraint(x[i] <= ub)
m.constraint(x[0] * x[1] >= 1.0)
m.constraint(x[0] + x[1]**2 >= 0.0)
m.set_silent()
m.optimize()
print("obj1:", m.objective_value(), " oracle 306.4999755050365")
print("p1:", m.value(p1), "p2:", m.value(p2))
m.set_parameter_value(p1, 90.0)
m.set_parameter_value(p2, 1.3)
m.optimize()
print("obj2:", m.objective_value(), " oracle 276.26497794903645")
print("ready after param update:", m.transformation_backend_ready())

# --- reference test/solve.jl "Parameter function updates" oracle ------------
def oldpf2(t_, s_):
    return np.sin(t_) * s_ + 0.2

def newpf2(t_, s_):
    return np.sin(t_) * s_ + 0.8

m2 = InfiniteModel(ExaTranscriptionBackend(IpmSolver))
t = m2.infinite_parameter("t", domain=(0, 1), num_supports=3)
s = m2.infinite_parameter("s", domain=(2, 3), num_supports=3)
v = m2.variable("v", deps=(t,), lb=0, ub=100)
z = m2.variable("z", deps=(t, s), lb=0, ub=100)
pf1 = m2.parameter_function(np.sin, (t,), name="pf1")
pf2 = m2.parameter_function(oldpf2, (t, s), name="pf2")
m2.constraint(v + pf1 <= 100, name="c1")
m2.constraint(v * 2 + pf1 * pf2 <= 100, name="c2")
m2.constraint(v >= 0.5 * pf2, name="c3")
m2.constraint(z(t, 2.5) + pf2 * pf1 <= 40, name="c4")
m2.minimize(integral(v * pf1, t) + integral(integral(0.5 * z * pf2, t), s))
m2.set_silent()
m2.optimize()
print("objA:", m2.objective_value(), " oracle 0.48292223509341475")
print("pf1 vals:", m2.value(pf1), " expect sin([0,.5,1])")
print("pf2 vals:", np.asarray(m2.value(pf2)).reshape(-1))
print("  exp (julia col-major t-fastest): [0.2,1.1588,1.8829, 0.2,1.3985,2.3036, 0.2,1.6382,2.7244]")
m2.set_parameter_value(pf1, np.cos)
m2.set_parameter_value(pf2, newpf2)
m2.optimize()
print("objB:", m2.objective_value(), " oracle 0.8155916466182952")
