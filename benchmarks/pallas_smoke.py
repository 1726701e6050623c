"""On-device smoke + microbenchmark of the fused Pallas chol+inverse
kernel vs the XLA (cholesky + solve_triangular) path.

Run on the tunneled TPU:  python benchmarks/pallas_smoke.py
Prints one JSON line per shape with max-abs error vs the XLA factors and
wall times (median of 5 after warmup).  This is the compiled-device
validation gate VERDICT r3 required before the kernel routing can default
on (ADVICE r3 item 1).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_cache = os.environ.get("IXM_JAX_CACHE", os.path.expanduser("~/.ixm_jax_cache"))
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import infiniteexamodels_jl_tpu  # noqa: E402  (x64 on)
from infiniteexamodels_jl_tpu.solvers.pallas_chol import chol_linv_pallas  # noqa: E402
import jax.scipy.linalg as jsl  # noqa: E402


def xla_chol_linv(D):
    L = jnp.linalg.cholesky(D)
    eye = jnp.eye(D.shape[-1], dtype=D.dtype)
    Linv = jsl.solve_triangular(L, jnp.broadcast_to(eye, D.shape), lower=True)
    return L, Linv


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main():
    shapes = [(640, 64), (2500, 64), (156, 128), (1000, 32)]
    layouts = os.environ.get("IXM_SMOKE_LAYOUTS", "rank2,rank3").split(",")
    xk = jax.jit(xla_chol_linv)
    for nb, n in shapes:
        rng = np.random.default_rng(0)
        A = rng.standard_normal((nb, n, n)).astype(np.float32)
        D = jnp.asarray(A @ A.transpose(0, 2, 1) + n * np.eye(n, dtype=np.float32))
        t0 = time.time()
        tx, (Lx, Lix) = timeit(xk, D)
        base = {"nb": nb, "n": n, "xla_ms": round(tx * 1e3, 3),
                "compile_xla_s": round(time.time() - t0, 1)}
        for layout in layouts:
            rec = {**base, "layout": layout}
            pk = jax.jit(lambda d, _l=layout:
                         chol_linv_pallas(d, interpret=False, layout=_l)[:2])
            t0 = time.time()
            try:
                tp, (Lp, Lip) = timeit(pk, D)
            except Exception as e:
                # round-4 measured state of this machine's tunnel: Mosaic
                # rejects rank-3 Pallas blocks ("failed to legalize
                # operation 'func.return'"); the rank-2 re-layout
                # (VERDICT r4 item 6) is the candidate that must pass
                # this compiled gate before IXM_PALLAS can default on
                rec["pallas_error"] = " ".join(str(e).split())[:200]
                print(json.dumps(rec), flush=True)
                continue
            rec.update(
                pallas_ms=round(tp * 1e3, 3),
                speedup=round(tx / tp, 2),
                compile_pallas_s=round(time.time() - t0, 1),
                errL=float(jnp.max(jnp.abs(Lp - Lx))),
                rel_reconstruction=float(jnp.max(jnp.abs(
                    jnp.einsum("kij,kjl->kil", Lp, jnp.swapaxes(Lp, -1, -2))
                    - D)) / jnp.max(jnp.abs(D))),
                inv_err=float(jnp.max(jnp.abs(
                    jnp.einsum("kij,kjl->kil", Lip, Lx)
                    - jnp.eye(n, dtype=jnp.float32)))),
            )
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
