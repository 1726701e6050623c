"""Benchmark entry: prints ONE JSON line for the driver.

Primary metric (BASELINE.md headline): warm IPM iterations/s on the
quadrotor OCP (band-structured KKT, block-cyclic-reduction factorization)
on the tunneled TPU chip.  Remote-compile latency on this setup is
minutes-scale and variable, so the harness is built to ALWAYS bank a
number:

- every candidate runs in a timeboxed subprocess that appends milestone
  JSON lines to a progress file (built / first_solve / final); a timeout
  kills the child but the parent keeps the last milestone, so completed
  work is never lost;
- the cascade banks the cheapest certifiable config FIRST (quad-200,
  f64-only step set: half the compile inventory of ir32), then spends the
  remaining budget on upgrades with a retry ladder per size
  (ir32 -> ir32 with the Pallas kernel disabled -> f64) so one failing
  configuration never forfeits a scale;
- a global wall-clock budget (IXM_BENCH_BUDGET, default 2700 s) bounds the
  whole run so the final JSON line is always emitted;
- warm iter/s comes from the solver's own first_chunk/step_total timer
  split of a CONVERGED solve (compile + cache-miss cost is isolated in the
  first 32-iteration chunk), confirmed by a full warm re-solve when the
  child has time left.

``vs_baseline`` is measured, not invented: each certified problem size is
re-solved by the same solver on the host CPU backend (the framework's own
Ipopt-role reference path, f64) and the ratio is TPU iter/s over CPU
iter/s.  CPU references run CONCURRENTLY with later device stages (the
device child is tunnel-bound, the CPU child is host-bound).  The HEADLINE
is the certified device result with the best vs_baseline (reference-role:
ESCAPE34/utils.jl:3-33 compact per-run stats); every certified size is
reported as its own entry under detail["metrics"].

Output contract (VERDICT r3 item 1): the final line is scalars-only, all
error strings truncated, and hard-capped at 1500 chars -- if the full
detail would exceed that, stages are shrunk to status-only and finally the
detail is dropped; the untruncated detail always goes to stderr and to
BENCH_DETAIL.json next to this file.

Set IXM_BENCH_OPF=0 to skip the budget-gated 1000-scenario stochastic
AC-OPF stage (batched scenario KKT, runs when budget remains).
"""
import json
import os
import subprocess
import sys
import tempfile
import time

import jax

try:
    # home-dir cache: survives /tmp cleanup between driver rounds, so the
    # minutes-scale remote-tunnel compiles are paid once per machine
    _cache = os.environ.get("IXM_JAX_CACHE",
                            os.path.expanduser("~/.ixm_jax_cache"))
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
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

RUN_OPF = os.environ.get("IXM_BENCH_OPF", "1") != "0"
BUDGET_S = int(os.environ.get("IXM_BENCH_BUDGET", "2700"))
# stage timeouts (each additionally clipped to the remaining global budget)
BANK_TIMEOUT_S = int(os.environ.get("IXM_BENCH_BANK_TIMEOUT", "700"))
QUAD_TIMEOUT_S = int(os.environ.get("IXM_BENCH_QUAD_TIMEOUT", "900"))
BIG_TIMEOUT_S = int(os.environ.get("IXM_BENCH_BIG_TIMEOUT", "900"))
OPF_TIMEOUT_S = int(os.environ.get("IXM_BENCH_OPF_TIMEOUT", "700"))
CPU_TIMEOUT_S = int(os.environ.get("IXM_BENCH_CPU_TIMEOUT", "500"))

T0 = time.time()


def remaining():
    return BUDGET_S - (time.time() - T0)


def certified(r):
    return r.get("status") in ("first_order", "acceptable")


# ----------------------------------------------------------------------
# child: one (model, size, platform, fdtype) measurement with milestones
# ----------------------------------------------------------------------
def _emit(progress_path, payload):
    if progress_path:
        with open(progress_path, "a") as f:
            f.write(json.dumps(payload) + "\n")


def child(kind, size, platform, fdtype):
    progress = os.environ.get("IXM_BENCH_PROGRESS", "")
    deadline = float(os.environ.get("IXM_BENCH_CHILD_DEADLINE", "0")) or None
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        fdtype = "float64"
    from infiniteexamodels_jl_tpu import models as M
    from infiniteexamodels_jl_tpu.backend import ExaTranscriptionBackend
    from infiniteexamodels_jl_tpu.solvers import IpmSolver

    build = {
        "quad": lambda: M.quad(num_supports=size),
        "hovercraft": lambda: M.hovercraft(num_supports=size),
        "opf": lambda: M.opf(num_supports=size),
    }[kind]
    base = {"kind": kind, "size": size, "platform": platform,
            "factor_dtype": fdtype,
            "pallas": os.environ.get("IXM_PALLAS", "auto")}

    t0 = time.time()
    m = build()
    opts = {} if fdtype == "float64" else {"factor_dtype": fdtype}
    if fdtype == "ir32":
        # barrier handover to the (blocked-factor) f64 endgame once the
        # f32 factorization passes its viability wall -- measured on
        # quad-1000 this removes a 13-iteration dw-ladder crawl with
        # inf_du frozen (ipm.py mu_switch_ir option docs)
        opts["mu_switch_ir"] = float(
            os.environ.get("IXM_MU_SWITCH_IR", "1e-4"))
    if deadline:
        # non-converging solves must end as max_time (milestone written)
        # just before the parent's kill would hit
        opts["max_wall_time"] = max(deadline - time.time() - 60.0, 60.0)
    backend = ExaTranscriptionBackend(
        IpmSolver, linear_solver="auto", print_level=0, tol=1e-6, **opts)
    m.set_transformation_backend(backend)
    backend.build(m)
    build_s = time.time() - t0
    base.update(nvar=backend.model.nvar, ncon=backend.model.ncon,
                build_s=round(build_s, 2))
    _emit(progress, {**base, "milestone": "built"})

    t0 = time.time()
    res = backend.optimize(m)
    first_solve = time.time() - t0
    timers = res.timers or {}
    # warm rate from the first CONVERGED solve: everything after the first
    # 32-iteration chunk runs from compiled code (ipm.py first_chunk split)
    warm = None
    fc, st_total = timers.get("first_chunk"), timers.get("step_total")
    if fc and st_total and res.iter > 32 and st_total > fc:
        warm = round((res.iter - 32) / (st_total - fc), 3)
    base.update(status=res.status, iters=int(res.iter),
                objective=float(res.objective),
                first_solve_s=round(first_solve, 2),
                first_chunk_s=round(fc, 2) if fc else None,
                iters_per_s=warm)
    _emit(progress, {**base, "milestone": "first_solve"})

    # clean warm measurement: full re-solve, all modules compiled -- only
    # when the projected time fits the child's deadline
    projected = st_total - fc if (fc and st_total) else first_solve
    if deadline is None or time.time() + 1.3 * projected + 20 < deadline:
        backend.model.refresh_from_core()
        t0 = time.time()
        res2 = backend.solver.solve()
        resolve_s = time.time() - t0
        base.update(status=res2.status, iters=int(res2.iter),
                    objective=float(res2.objective),
                    resolve_s=round(resolve_s, 2),
                    iters_per_s=round(max(res2.iter, 1) / resolve_s, 3))
        # bank the clean warm rate BEFORE the profiling pass below: the
        # profiler jits each phase separately (fresh tunnel compiles), and
        # a timeout there must not lose the resolve measurement
        _emit(progress, {**base, "milestone": "resolved"})
    phases = None
    if platform != "cpu" and os.environ.get("IXM_BENCH_PROFILE", "0") != "0":
        try:
            phases = {k: round(v * 1e3, 3)
                      for k, v in backend.solver.profile_phases().items()}
        except Exception as e:
            phases = {"error": str(e)[:120]}
    if phases:
        base["phase_ms"] = phases
    _emit(progress, {**base, "milestone": "final"})
    print(json.dumps(base))


# ----------------------------------------------------------------------
# parent: async child management with milestone recovery
# ----------------------------------------------------------------------
class Run:
    def __init__(self, kind, size, timeout, platform="device",
                 fdtype="float64", pallas=None):
        self.spec = f"{kind}{size}_{platform}_{fdtype}"
        self.timeout = min(timeout, max(remaining() - 20, 0))
        self.deadline = time.time() + self.timeout
        fd, self.progress = tempfile.mkstemp(suffix=".jsonl",
                                             prefix="ixm_bench_")
        os.close(fd)
        env = os.environ.copy()
        env["IXM_BENCH_PROGRESS"] = self.progress
        env["IXM_BENCH_CHILD_DEADLINE"] = str(self.deadline)
        if pallas is not None:
            env["IXM_PALLAS"] = pallas
        self.proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child",
             kind, str(size), platform, fdtype],
            stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
            text=True, env=env)
        self._result = None

    def _read_milestones(self):
        last = None
        try:
            with open(self.progress) as f:
                for ln in f:
                    ln = ln.strip()
                    if ln:
                        last = json.loads(ln)
        except Exception:
            pass
        return last

    def wait(self):
        if self._result is not None:
            return self._result
        try:
            _, err = self.proc.communicate(
                timeout=max(self.deadline - time.time(), 1))
            timed_out = False
        except subprocess.TimeoutExpired:
            self.proc.kill()
            try:
                _, err = self.proc.communicate(timeout=30)
            except Exception:
                err = ""
            timed_out = True
        r = self._read_milestones()
        if r is None:
            r = {"error": f"timeout>{self.timeout:.0f}s" if timed_out
                 else ("crash: " + (err or "no output")[-300:])}
        else:
            if timed_out:
                r["timed_out_after_s"] = round(self.timeout)
            if self.proc.returncode not in (0, None) and not timed_out \
                    and r.get("milestone") != "final":
                r["child_error"] = (err or "")[-600:]
            if r.get("iters_per_s") is None:
                r = {"error": "no warm rate before "
                     + ("timeout" if timed_out else "exit"), **r}
        try:
            os.unlink(self.progress)
        except OSError:
            pass
        self._result = r
        return r


def run_sync(kind, size, timeout, platform="device", fdtype="float64",
             pallas=None):
    return Run(kind, size, timeout, platform, fdtype, pallas).wait()


def device_available(timeout=300):
    """Health probe of the tunneled TPU in a subprocess.  The tunnel is
    observed to go UNAVAILABLE for stretches (backend init then hangs
    minutes before erroring); a solve attempt during such a window would
    eat the whole cascade budget.  Two-phase probe (ADVICE r3): backend
    init prints a marker, then a compiled 8x8 matmul runs.  A completed
    matmul is a definitive yes; a timeout AFTER the init marker appeared
    is treated as available-with-cold-cache (even a trivial matmul pays
    the minutes-scale remote-compile latency when the cache is cold); a
    timeout with no marker means the tunnel is down."""
    code = ("import jax\n"
            "ds = jax.devices()\n"
            "assert ds and ds[0].platform != 'cpu', ds\n"
            "print('init_ok', ds, flush=True)\n"
            "import jax.numpy as jnp\n"
            "x = jnp.ones((8, 8))\n"
            "print('exec_ok', (x @ x).sum(), flush=True)\n")
    fd, path = tempfile.mkstemp(suffix=".txt", prefix="ixm_probe_")
    os.close(fd)
    try:
        with open(path, "w") as out:
            try:
                subprocess.run([sys.executable, "-c", code],
                               stdout=out, stderr=subprocess.DEVNULL,
                               timeout=timeout)
            except subprocess.TimeoutExpired:
                pass
        with open(path) as f:
            text = f.read()
        return "exec_ok" in text or "init_ok" in text
    except Exception:
        return False
    finally:
        try:
            os.unlink(path)
        except OSError:
            pass


# ----------------------------------------------------------------------
# final-line emission: compact, capped, driver-parseable (VERDICT r3 #1)
# ----------------------------------------------------------------------
_KEEP_KEYS = ("kind", "size", "platform", "factor_dtype", "pallas", "nvar",
              "ncon", "build_s", "status", "iters", "objective",
              "first_solve_s", "first_chunk_s", "iters_per_s", "resolve_s",
              "milestone", "vs_baseline", "timed_out_after_s")
_MINI_KEYS = ("status", "iters_per_s", "vs_baseline")


def _compact(r, keys=_KEEP_KEYS, errors=True):
    """Scalars-only stage summary with short error strings."""
    out = {}
    for k in keys:
        v = r.get(k)
        if v is None:
            continue
        if isinstance(v, float):
            v = round(v, 6)
        out[k] = v
    if errors:
        for k in ("error", "child_error"):
            if r.get(k) and "error" not in out:
                msg = " ".join(str(r[k]).split())
                out["error"] = msg[-120:]
    return out


def emit_final(metric, value, vs, detail):
    """Print the one driver line, hard-capped at 1500 chars; full detail
    goes to stderr + BENCH_DETAIL.json unconditionally."""
    side = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_DETAIL.json")
    try:
        with open(side, "w") as f:
            json.dump(detail, f, indent=1)
    except Exception:
        pass
    print(json.dumps({"full_detail": detail})[:20000], file=sys.stderr)

    head = {"metric": metric, "value": value, "unit": "iter/s",
            "vs_baseline": vs}
    metrics = detail.get("metrics")
    stages = {k: v for k, v in detail.items() if k != "metrics"}

    def level(keys, errors):
        d = {k: (_compact(v, keys, errors) if isinstance(v, dict) else v)
             for k, v in stages.items()}
        if metrics:
            d["metrics"] = metrics
        return d

    for shrink in (level(_KEEP_KEYS, True), level(_MINI_KEYS, False),
                   {"metrics": metrics} if metrics else None, None):
        payload = dict(head) if shrink is None else {**head,
                                                     "detail": shrink}
        line = json.dumps(payload)
        if len(line) < 1500:
            break
    assert len(line) < 1500, len(line)
    print(line)


def main():
    detail = {}

    if not device_available():
        # tunnel down: report the host-CPU path (the framework's own
        # Ipopt-role reference) as an honestly-labeled fallback metric
        cpu = run_sync("quad", 1000, min(CPU_TIMEOUT_S, remaining()),
                       platform="cpu")
        flag = "" if certified(cpu) else "_UNCERTIFIED"
        detail["cpu_fallback"] = cpu
        emit_final(f"quad1000_ipm_iterations_per_s_CPU_FALLBACK{flag}",
                   cpu.get("iters_per_s") or 0.0, 0.0,
                   {"error": "tpu tunnel unavailable", **detail})
        return

    certified_runs = {}     # label -> device result (certified, has rate)
    cpu_refs = {}           # (kind,size) -> Run

    def bank(r, label):
        detail[label] = r
        if "error" in r or not certified(r) or not r.get("iters_per_s"):
            return False
        key = (r["kind"], r["size"])
        if key not in cpu_refs:
            cpu_refs[key] = Run(r["kind"], r["size"], CPU_TIMEOUT_S,
                                platform="cpu")
        certified_runs[label] = r
        return True

    def ladder(kind, size, timeout, label, rungs):
        """Retry ladder: first certifying rung wins the size."""
        for suffix, fdtype, pallas in rungs:
            if remaining() < 240:
                return False
            if bank(run_sync(kind, size, timeout, fdtype=fdtype,
                             pallas=pallas), f"{label}_{suffix}"):
                return True
        return False

    # Stage A -- bank the cheapest certifiable config, f64-only step set
    # (half the remote-compile inventory of ir32).
    bank(run_sync("quad", 200, BANK_TIMEOUT_S), "quad200_f64")

    # Stage B -- the headline size.  Retry ladder ordered by measured
    # round-4 warm rates (mixed 1.838 > ir32+mu-switch 1.349 > f64-blocked
    # 1.52 it/s -- f64 last because it shares its endgame with mixed, so a
    # mixed failure usually implicates it too).
    ladder("quad", 1000, QUAD_TIMEOUT_S, "quad1000",
           [("mixed", "mixed", None),
            ("ir32", "ir32", None),
            ("f64", "float64", None)])

    # Stage A' -- cascade insurance if nothing banked yet
    if not certified_runs and remaining() > 180:
        bank(run_sync("hovercraft", 201, BANK_TIMEOUT_S), "hovercraft201_f64")

    # Stage C -- reference-scale attempt (reference sweeps quadrotor to
    # 16k, run_cases_cpu.jl:103-105); same retry ladder so one crashing
    # configuration does not forfeit the scale story (VERDICT r3 item 4).
    # quad-2000 (also a reference sweep size) is the fallback: the tunnel
    # WORKER was observed to crash on 4000-scale solves for a whole day
    # (reproduced on a previously-certified commit -- infra, not code).
    if certified_runs and remaining() > 420:
        big = ladder("quad", 4000, BIG_TIMEOUT_S, "quad4000",
                     [("mixed", "mixed", None),
                      ("f64", "float64", None)])
        if not big and remaining() > 420:
            ladder("quad", 2000, BIG_TIMEOUT_S, "quad2000",
                   [("mixed", "mixed", None),
                    ("f64", "float64", None)])

    # Stage D -- stochastic AC-OPF on the scenario-sharded KKT (reference
    # GPU sweep parity, run_cases_gpu.jl:90-92); budget-gated.
    if RUN_OPF and certified_runs and remaining() > 300:
        bank(run_sync("opf", 1000, OPF_TIMEOUT_S, fdtype="mixed"),
             "opf1000_mixed")

    if not certified_runs:
        # nothing certified: surface the best uncertified device rate
        # (explicitly flagged) rather than a bare zero
        cand = [r for r in detail.values()
                if isinstance(r, dict) and r.get("iters_per_s")]
        if cand:
            best = max(cand, key=lambda r: r["iters_per_s"])
            emit_final(f"{best['kind']}{best['size']}"
                       "_ipm_iterations_per_s_UNCERTIFIED",
                       best["iters_per_s"], 0.0, detail)
        else:
            emit_final("ipm_iterations_per_s", 0.0, 0.0, detail)
        return

    # join the CPU references and attach per-size ratios
    cpu_rates = {}
    for key, run in cpu_refs.items():
        cpu = run.wait()
        detail[f"cpu_{key[0]}{key[1]}"] = cpu
        if certified(cpu) and cpu.get("iters_per_s"):
            cpu_rates[key] = cpu["iters_per_s"]
    metrics = {}
    for label, r in certified_runs.items():
        ref = cpu_rates.get((r["kind"], r["size"]))
        r["vs_baseline"] = round(r["iters_per_s"] / ref, 3) if ref else 0.0
        metrics[label] = {"value": r["iters_per_s"],
                          "vs_baseline": r["vs_baseline"]}
    detail["metrics"] = metrics

    # headline: best vs_baseline among certified device runs (ties ->
    # larger problem); never bury a winning ratio under a losing one
    # at a bigger size (VERDICT r3 item 8)
    best_label = max(certified_runs,
                     key=lambda k: (certified_runs[k]["vs_baseline"],
                                    certified_runs[k]["size"]))
    best = certified_runs[best_label]
    emit_final(f"{best['kind']}{best['size']}_ipm_iterations_per_s",
               best["iters_per_s"], best["vs_baseline"], detail)


if __name__ == "__main__":
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        plat = sys.argv[i + 3] if len(sys.argv) > i + 3 else "device"
        fdt = sys.argv[i + 4] if len(sys.argv) > i + 4 else \
            os.environ.get("IXM_BENCH_FDTYPE", "float64")
        child(sys.argv[i + 1], int(sys.argv[i + 2]), plat, fdt)
    else:
        main()
