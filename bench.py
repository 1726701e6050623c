"""Benchmark entry: prints ONE JSON line for the driver.

Primary metric (BASELINE.md headline): warm IPM iterations/s on the
quadrotor OCP (band-structured KKT, block-cyclic-reduction factorization).
Remote-compile latency on the tunneled single-chip setup is minutes-scale
and variable, so each candidate benchmark runs in a timeboxed subprocess
and the harness cascades: quadrotor-1000 -> quadrotor-200 ->
hovercraft-201 -> error JSON.  The own-CPU reference at quad-1000 runs
~2.5 it/s warm (f64, 4-core host); the chip's emulated-f64 path measured
0.63 it/s, so the device headline rides on the ir32 step set (f32 MXU
factors refined against the exact f64 operator: factor 651 -> 23 ms at
this size) -- set IXM_BENCH_FDTYPE=ir32 once chip probes certify it.

``vs_baseline`` is measured, not invented: the same problem is solved by
the same solver on the host CPU backend (the framework's own Ipopt-role
reference path), and the ratio is TPU iter/s over CPU iter/s.  The detail
block carries the per-phase device timings (assemble / factor / solve /
full step) from ``IpmSolver.profile_phases`` plus both raw runs.

Set IXM_BENCH_OPF=1 to additionally run the 1000-scenario stochastic
AC-OPF (batched scenario KKT) in the detail block.
"""
import json
import os
import subprocess
import sys
import time

import jax

try:
    # home-dir cache: survives /tmp cleanup between driver rounds, so the
    # minutes-scale remote-tunnel compiles are paid once per machine
    os.makedirs("/root/.ixm_jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.ixm_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
# keep the host CPU backend registered next to the TPU so cheap one-shot
# modules (problem constants) compile locally instead of over the tunnel
try:
    plats = jax.config.read("jax_platforms")
    if plats and "cpu" not in plats:
        jax.config.update("jax_platforms", plats + ",cpu")
except Exception:
    pass

RUN_OPF = os.environ.get("IXM_BENCH_OPF", "0") != "0"
# factorization precision for the device runs ("ir32"/"float64"/"float32"/
# "mixed"); the CPU reference column always runs f64.  ir32 (f32 MXU factors
# + CG refinement against the exact f64 operator) is the default: certified
# on-chip at quad-1000 (first_order, 0.81 it/s warm vs 0.63 for emulated
# f64); main() re-runs in f64 if the ir32 attempt fails to certify.
FDTYPE = os.environ.get("IXM_BENCH_FDTYPE", "ir32")
QUAD_TIMEOUT_S = int(os.environ.get("IXM_BENCH_QUAD_TIMEOUT", "560"))
FALLBACK_TIMEOUT_S = int(os.environ.get("IXM_BENCH_FALLBACK_TIMEOUT", "420"))
OPF_TIMEOUT_S = int(os.environ.get("IXM_BENCH_OPF_TIMEOUT", "420"))
CPU_TIMEOUT_S = int(os.environ.get("IXM_BENCH_CPU_TIMEOUT", "420"))


def run_model(build_fn, profile=False, **solver_opts):
    from infiniteexamodels_jl_tpu.backend import ExaTranscriptionBackend
    from infiniteexamodels_jl_tpu.solvers import IpmSolver

    t0 = time.time()
    m = build_fn()
    backend = ExaTranscriptionBackend(
        IpmSolver, linear_solver="auto", print_level=0, tol=1e-6,
        **solver_opts)
    m.set_transformation_backend(backend)
    backend.build(m)
    build_time = time.time() - t0
    t0 = time.time()
    res = backend.optimize(m)
    first_solve = time.time() - t0
    backend.model.refresh_from_core()
    t0 = time.time()
    res = backend.solver.solve()
    solve_time = time.time() - t0
    phases = None
    if profile:
        try:
            phases = {k: round(v * 1e3, 3)
                      for k, v in backend.solver.profile_phases().items()}
        except Exception as e:
            phases = {"error": str(e)[:200]}
    return backend, res, build_time, first_solve, solve_time, phases


def child(kind, size, platform):
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from infiniteexamodels_jl_tpu import models as M

    build = {
        "quad": lambda: M.quad(num_supports=size),
        "hovercraft": lambda: M.hovercraft(num_supports=size),
        "opf": lambda: M.opf(num_supports=size),
    }[kind]
    profile = (platform != "cpu"
               and os.environ.get("IXM_BENCH_PROFILE", "0") != "0")
    opts = {} if platform == "cpu" else {"factor_dtype": FDTYPE}
    backend, res, bt, fs, st, phases = run_model(build, profile=profile,
                                                 **opts)
    print(json.dumps({
        "kind": kind, "size": size, "platform": platform,
        "factor_dtype": "float64" if platform == "cpu" else FDTYPE,
        "status": res.status, "iters": int(res.iter),
        "objective": float(res.objective),
        "nvar": backend.model.nvar, "ncon": backend.model.ncon,
        "build_s": round(bt, 2), "first_solve_s": round(fs, 2),
        "resolve_s": round(st, 2),
        "iters_per_s": round(max(res.iter, 1) / st, 3),
        "phase_ms": phases,
    }))


def run_child(kind, size, timeout, platform="device", fdtype=None):
    env = os.environ.copy()
    if fdtype is not None:
        env["IXM_BENCH_FDTYPE"] = fdtype
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             kind, str(size), platform],
            capture_output=True, text=True, timeout=timeout, env=env)
        lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if lines:
            return json.loads(lines[-1])
        return {"error": (out.stderr or "no output")[-300:]}
    except subprocess.TimeoutExpired:
        return {"error": f"timeout>{timeout}s"}
    except Exception as e:
        return {"error": str(e)[:300]}


def device_available(timeout=240):
    """Quick health probe of the tunneled TPU in a subprocess: device init
    plus one tiny matmul.  The tunnel is observed to go UNAVAILABLE for
    stretches (backend init then hangs minutes before erroring); a solve
    attempt during such a window would eat the whole cascade budget."""
    code = ("import jax, jax.numpy as jnp\n"
            "x = jnp.ones((8, 8))\n"
            "print('ok', (x @ x).sum())\n")
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True,
                             timeout=timeout)
        return "ok" in out.stdout
    except Exception:
        return False


def main():
    detail = {}
    if not device_available():
        # tunnel down: report the host-CPU path (the framework's own
        # Ipopt-role reference) as an honestly-labeled fallback metric
        cpu = run_child("quad", 1000, CPU_TIMEOUT_S, platform="cpu")
        out = {
            "metric": "quad1000_ipm_iterations_per_s_CPU_FALLBACK",
            "value": cpu.get("iters_per_s", 0.0),
            "unit": "iter/s",
            "vs_baseline": 0.0,
            "detail": {"error": "tpu tunnel unavailable", **cpu},
        }
        print(json.dumps(out))
        return
    def certified(r):
        return r.get("status") in ("first_order", "acceptable")

    primary = run_child("quad", 1000, QUAD_TIMEOUT_S)
    if "error" not in primary and not certified(primary) \
            and FDTYPE != "float64":
        # low-precision step set failed to certify on this problem/chip:
        # fall back to the emulated-f64 path at the same size
        detail[f"quad1000_{FDTYPE}"] = primary
        primary = run_child("quad", 1000, QUAD_TIMEOUT_S,
                            fdtype="float64")
    if "error" in primary:
        detail["quad1000"] = primary
        primary = run_child("quad", 200, QUAD_TIMEOUT_S)
    if "error" in primary:
        detail["quad200"] = primary
        primary = run_child("hovercraft", 201, FALLBACK_TIMEOUT_S)
    if RUN_OPF:
        detail["opf1000"] = run_child("opf", 1000, OPF_TIMEOUT_S)
    if "error" in primary:
        out = {
            "metric": "ipm_iterations_per_s",
            "value": 0.0,
            "unit": "iter/s",
            "vs_baseline": 0.0,
            "detail": {"error": primary["error"], **detail},
        }
    else:
        # measured baseline: the SAME problem through the same solver on
        # the host CPU backend (own-framework Ipopt-role reference path)
        cpu = run_child(primary["kind"], primary["size"], CPU_TIMEOUT_S,
                        platform="cpu")
        detail["cpu_reference"] = cpu
        v = primary["iters_per_s"]
        vs = round(v / cpu["iters_per_s"], 3) if "iters_per_s" in cpu \
            else 0.0
        out = {
            "metric": f"{primary['kind']}{primary['size']}"
                      "_ipm_iterations_per_s",
            "value": v,
            "unit": "iter/s",
            "vs_baseline": vs,
            "detail": {**primary, **detail},
        }
    print(json.dumps(out))


if __name__ == "__main__":
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        plat = sys.argv[i + 3] if len(sys.argv) > i + 3 else "device"
        child(sys.argv[i + 1], int(sys.argv[i + 2]), plat)
    else:
        main()
