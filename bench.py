"""Benchmark entry: prints ONE JSON line for the driver.

Headline metric (BASELINE.md): IPM iterations/s on the quadrotor OCP.
The reference's own published baseline set is empty (BASELINE.json
"published": {}), so vs_baseline is reported against a fixed internal
anchor: 10 IPM iterations/s on quadrotor-1000 (the order of magnitude of
MadNLP+CUDSS per-iteration rates on mid-size collocated OCPs per the
GPU-IPM literature in PAPERS.md).
"""
import json
import os
import sys
import time

import jax

# persistent compilation cache: first-run compiles over the TPU tunnel are
# minutes-scale; every later bench run reuses them
try:
    os.makedirs("/tmp/ixm_jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/ixm_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

ANCHOR_ITERS_PER_S = 10.0
NUM_SUPPORTS = int(sys.argv[1]) if len(sys.argv) > 1 else 1000


def main():
    from infiniteexamodels_jl_tpu.models import quad
    from infiniteexamodels_jl_tpu.backend import ExaTranscriptionBackend
    from infiniteexamodels_jl_tpu.solvers import IpmSolver

    t0 = time.time()
    m = quad(num_supports=NUM_SUPPORTS)
    backend = ExaTranscriptionBackend(
        IpmSolver, linear_solver="auto", print_level=0, tol=1e-6)
    m.set_transformation_backend(backend)
    backend.build(m)
    build_time = time.time() - t0

    # warm-up solve compiles every kernel; second solve measures steady state
    t0 = time.time()
    res = backend.optimize(m)
    first_solve = time.time() - t0
    backend.model.refresh_from_core()
    t0 = time.time()
    res = backend.solver.solve()
    solve_time = time.time() - t0

    iters = max(res.iter, 1)
    iters_per_s = iters / solve_time
    out = {
        "metric": f"quadrotor{NUM_SUPPORTS}_ipm_iterations_per_s",
        "value": round(iters_per_s, 3),
        "unit": "iter/s",
        "vs_baseline": round(iters_per_s / ANCHOR_ITERS_PER_S, 3),
        "detail": {
            "status": res.status,
            "iters": int(res.iter),
            "objective": float(res.objective),
            "nvar": backend.model.nvar,
            "ncon": backend.model.ncon,
            "build_s": round(build_time, 2),
            "first_solve_s": round(first_solve, 2),
            "resolve_s": round(solve_time, 2),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
