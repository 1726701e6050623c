"""Microbenchmark of the primitive operations on the IPM critical path,
on the current default device (run on the tunneled TPU).

Quantifies the emulated-f64 tax per primitive so optimization effort goes
where the measured time is (VERDICT r3 weak #7: no kernel-vs-XLA numbers
anywhere).  Shapes mirror quad-1000's band KKT: nb=640 blocks of bs=64.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_cache = os.environ.get("IXM_JAX_CACHE", os.path.expanduser("~/.ixm_jax_cache"))
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import infiniteexamodels_jl_tpu  # noqa: E402  (x64 on)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    nb, bs = 640, 64
    nnz = 500_000
    rng = np.random.default_rng(0)
    res = {}
    for dt in (jnp.float32, jnp.float64):
        tag = "f32" if dt == jnp.float32 else "f64"
        A = jnp.asarray(rng.standard_normal((nb, bs, bs)), dt)
        B = jnp.asarray(rng.standard_normal((nb, bs, bs)), dt)
        v = jnp.asarray(rng.standard_normal((nb, bs)), dt)
        spd = jnp.einsum("kij,klj->kil", A, A) + bs * jnp.eye(bs, dtype=dt)

        mm = jax.jit(lambda a, b: jnp.einsum("kij,kjl->kil", a, b))
        res[f"bmm_{tag}_ms"] = round(timeit(mm, A, B) * 1e3, 3)
        mv = jax.jit(lambda a, x: jnp.einsum("kij,kj->ki", a, x))
        res[f"bmv_{tag}_ms"] = round(timeit(mv, A, v) * 1e3, 3)
        chol = jax.jit(jnp.linalg.cholesky)
        res[f"chol_{tag}_ms"] = round(timeit(chol, spd) * 1e3, 3)
        import jax.scipy.linalg as jsl
        L = chol(spd)
        eye = jnp.eye(bs, dtype=dt)
        tri = jax.jit(lambda l: jsl.solve_triangular(
            l, jnp.broadcast_to(eye, l.shape), lower=True))
        res[f"trisolve_{tag}_ms"] = round(timeit(tri, L) * 1e3, 3)

        vals = jnp.asarray(rng.standard_normal(nnz), dt)
        dest = jnp.asarray(np.sort(rng.integers(0, nb * bs * bs, nnz)))
        scat = jax.jit(lambda vv: jnp.zeros(nb * bs * bs, dt).at[dest].add(
            vv, indices_are_sorted=True))
        res[f"scatter_{tag}_ms"] = round(timeit(scat, vals) * 1e3, 3)

    # candidate substrates for an MXU-based f64-grade matmul (Ozaki-style
    # slicing needs cheap low-precision matmuls with known accumulation)
    A32 = jnp.asarray(rng.standard_normal((nb, bs, bs)), jnp.float32)
    B32 = jnp.asarray(rng.standard_normal((nb, bs, bs)), jnp.float32)
    mm_hi = jax.jit(lambda a, b: jnp.einsum(
        "kij,kjl->kil", a, b, precision=jax.lax.Precision.HIGHEST))
    res["bmm_f32_highest_ms"] = round(timeit(mm_hi, A32, B32) * 1e3, 3)
    Abf = A32.astype(jnp.bfloat16)
    Bbf = B32.astype(jnp.bfloat16)
    mm_bf = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32))
    res["bmm_bf16_f32acc_ms"] = round(timeit(mm_bf, Abf, Bbf) * 1e3, 3)
    try:
        Ai8 = jnp.asarray(rng.integers(-100, 100, (nb, bs, bs)), jnp.int8)
        Bi8 = jnp.asarray(rng.integers(-100, 100, (nb, bs, bs)), jnp.int8)
        mm_i8 = jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32))
        res["bmm_int8_i32acc_ms"] = round(timeit(mm_i8, Ai8, Bi8) * 1e3, 3)
    except Exception as e:
        res["bmm_int8_i32acc_ms"] = "unsupported: " + str(e)[:80]

    # model-side sweeps at quad-1000 (the refinement matvec's parts)
    from infiniteexamodels_jl_tpu import models as M
    from infiniteexamodels_jl_tpu.transcribe import transcribe
    m, _ = transcribe(M.quad(num_supports=1000))
    x = jnp.asarray(m.x0)
    th = jnp.asarray(m.theta)
    lam = jnp.ones(m.ncon, m.dtype)
    w = jnp.asarray(rng.standard_normal(m.nvar), m.dtype)
    hvp = jax.jit(lambda xx, ww: m.hvp_lag(xx, th, lam, 1.0, ww))
    res["hvp_lag_f64_ms"] = round(timeit(hvp, x, w) * 1e3, 3)
    cj = jax.jit(lambda xx: m.cons_and_jac(xx, th))
    jvals = cj(x)[1]
    jp = jax.jit(lambda jv, ww: m.jtprod(jv, m.jprod(jv, ww)))
    res["jtj_prod_f64_ms"] = round(timeit(jp, jvals, w) * 1e3, 3)
    res["cons_jac_f64_ms"] = round(timeit(cj, x) * 1e3, 3)

    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
