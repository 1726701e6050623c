"""Scenario-parallel scaling of the mesh-distributed KKT factorization.

Measures warm per-call time of the batched scenario-block factorization
(assemble -> factor -> solve) replicated vs sharded over an N-device mesh,
and reports the scaling efficiency  t_replicated / (N * t_sharded).

On real multi-chip hardware this is the BASELINE.md >=80% scenario-scaling
check.  On a virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_
device_count=N) the devices share host cores, so treat the number as a
smoke signal, not a hardware claim: run with N <= physical cores.

Usage:
    python benchmarks/scaling.py [n_devices] [n_scenarios] [--cpu]
"""
import os
import sys
import time

N_DEV = int(sys.argv[1]) if len(sys.argv) > 1 else 4
N_SCEN = int(sys.argv[2]) if len(sys.argv) > 2 else 512

if "--cpu" in sys.argv:
    os.environ.setdefault(
        "XLA_FLAGS",
        f"--xla_force_host_platform_device_count={N_DEV}")

import jax  # noqa: E402

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from infiniteexamodels_jl_tpu.models import pandemic  # noqa: E402
from infiniteexamodels_jl_tpu.transcribe import transcribe  # noqa: E402
from infiniteexamodels_jl_tpu.parallel import (  # noqa: E402
    make_mesh, shard_model, sharded_fraction)
from infiniteexamodels_jl_tpu.solvers.block_tridiag import (  # noqa: E402
    BlockTridiagKKT)


def timed(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def factor_time(model, mesh=None):
    kkt = BlockTridiagKKT(model, mesh=mesh)
    assert kkt.usable and kkt.block_diag
    n, mm = model.nvar, model.ncon
    lam = jnp.zeros(mm)
    d = jnp.ones(mm)
    de = jnp.ones(n)
    rhs = jnp.ones(n)

    @jax.jit
    def step(x, theta):
        K = kkt.assemble(x, theta, lam, 1.0, d, de)
        fac, ok = kkt.factor(K)
        return kkt.solve(fac, rhs)

    asm = jax.jit(lambda x, th: kkt.assemble(x, th, lam, 1.0, d, de))
    K = asm(model.x0, model.theta)
    fac_only = jax.jit(lambda K: kkt.factor(K)[0])
    t_fac = timed(fac_only, K, reps=5)
    return timed(step, model.x0, model.theta), t_fac, kkt


def main():
    # pandemic: one time-grid block per scenario (real per-block work)
    m = pandemic(num_supports=25, num_scenarios=N_SCEN)
    model, _ = transcribe(m, row_pad=N_DEV)
    t_rep, tf_rep, kkt = factor_time(model)
    print(f"replicated: step {t_rep*1e3:8.2f} ms, factor {tf_rep*1e3:8.2f} "
          f"ms  (nb={kkt.nb}, bs={kkt.bs}, mB={kkt.mB})")

    mesh = make_mesh(N_DEV)
    shard_model(model, mesh)
    assert sharded_fraction(model, mesh) == 1.0
    t_sh, tf_sh, kkt_sh = factor_time(model, mesh=mesh)
    assert kkt_sh._mesh_ok
    print(f"sharded x{N_DEV}: step {t_sh*1e3:8.2f} ms, factor "
          f"{tf_sh*1e3:8.2f} ms")
    print(f"factor-only:  speedup {tf_rep/tf_sh:5.2f}x  "
          f"efficiency {tf_rep/(N_DEV*tf_sh):6.1%}")
    print(f"full step:    speedup {t_rep/t_sh:5.2f}x  "
          f"efficiency {t_rep/(N_DEV*t_sh):6.1%}")
    print("(full-step gap = COO assembly communication; row-layout/"
          "scenario-block alignment is the roadmap fix)")


if __name__ == "__main__":
    main()
