"""Pallas TPU kernel: fused batched Cholesky factorization + explicit
triangular inverse for the structured-KKT block factorizations.

Role (reference parity): this is the TPU-native analogue of the dense
per-block kernels inside CUDSS/MA27 that the reference pipeline reaches
through MadNLP/Ipopt (reference README.md:36-41); in this framework every
structured backend (block-diag scenario, BCR band, their sharded variants)
bottoms out in ``_chol_linv`` -- batched ``D = L L^T`` plus ``L^{-1}`` --
so one fused kernel accelerates the whole factorization stack.

Why a kernel at all: XLA lowers ``jnp.linalg.cholesky`` +
``solve_triangular`` for a batch of SMALL blocks (bs = 8..128, nb =
tens..thousands) into separate blocked routines with their own HBM
round-trips; on the f32 (ir32/mixed) step sets these latency-bound solves
sit on the critical path of every IPM iteration.  The fused kernel keeps
each G-block chunk resident in VMEM, runs a masked right-looking Cholesky
column loop and a masked forward-substitution loop back to back, and
writes L and L^{-1} once.  All ops are mask/select/reduce on (G, n, n)
tiles -- fully vectorized on the VPU across the batch and lane axes, no
dynamic slicing (Mosaic-friendly), no data-dependent shapes.

The kernel is f32-only by design: TPU f64 is emulated (the f64 path stays
on XLA), and every low-precision step set already recovers f64 accuracy
via the IPM's iterative refinement (solvers/ipm.py ir32 design).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_inv_kernel(a_ref, l_ref, linv_ref):
    """One grid program: Cholesky + L^{-1} of a (G, n, n) chunk in VMEM."""
    M = a_ref[:]
    G, n, _ = M.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)

    def chol_step(j, M):
        # pivot d = sqrt(M[j, j]) via masked reduction (no dynamic slice;
        # one axis at a time -- multi-axis reduces crash the Mosaic
        # toolchain behind the remote-compile tunnel)
        pj = jnp.sum(jnp.sum(jnp.where((row == j) & (col == j), M, 0.0),
                             axis=2), axis=1)            # (G,)
        d = jnp.sqrt(pj)
        # column j of the trailing matrix
        cfull = jnp.sum(jnp.where(col == j, M, 0.0), axis=2)   # (G, n)
        i_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        colv = jnp.where(i_ids > j, cfull / d[:, None], 0.0)
        colv = jnp.where(i_ids == j, d[:, None], colv)         # final L col
        # rank-1 trailing update on (row > j, col > j)
        upd = colv[:, :, None] * colv[:, None, :]
        M = M - jnp.where((row > j) & (col > j), upd, 0.0)
        # store the finished column j
        return jnp.where(col == j, colv[:, :, None], M)

    # i32 loop bounds: under x64 a plain fori_loop(0, n, ...) carries an
    # i64 induction variable, and Mosaic's convert_element_type rule
    # infinitely recurses on i64->i32 (its _convert_helper re-emits the
    # same cast) -- the round-3 on-device RecursionError.  Keeping the
    # bounds i32 keeps every index op 32-bit end to end.
    M = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), chol_step, M)
    L = jnp.where(row >= col, M, 0.0)
    l_ref[:] = L

    diag = jnp.sum(jnp.where(row == col, L, 0.0), axis=2)      # (G, n)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)     # (1, n)

    def inv_step(i, X):
        # row i of L with the diagonal removed: only k < i entries remain
        lrow = jnp.sum(jnp.where(row == i, L, 0.0), axis=1)    # (G, n)
        lrow = jnp.where(k_ids == i, 0.0, lrow)
        di = jnp.sum(jnp.where(k_ids == i, diag, 0.0), axis=1)  # (G,)
        s = jnp.sum(lrow[:, :, None] * X, axis=1)              # (G, n)
        e = jnp.where(k_ids == i, 1.0, 0.0)                    # (1, n)
        xrow = (e - s) / di[:, None]
        return jnp.where(row == i, xrow[:, None, :], X)

    X = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), inv_step,
                          jnp.zeros((G, n, n), M.dtype))
    linv_ref[:] = X


def _chol_inv_kernel2(a_ref, l_ref, linv_ref):
    """One grid program: Cholesky + L^{-1} of a single (n, n) block.

    Rank-2 re-layout of ``_chol_inv_kernel`` (VERDICT r4 item 6): the
    batch axis is the Pallas GRID and every ref is a squeezed (n, n)
    block, because this machine's Mosaic toolchain rejects ALL rank-3
    refs ("failed to legalize func.return") while rank-2 kernels compile
    and run.  Same masked right-looking column loop + masked forward
    substitution, one axis reduced at a time (multi-axis reduces crash
    Mosaic), i32 loop bounds (i64 induction recurses in Mosaic's
    convert_element_type helper).
    """
    M = a_ref[:]
    n, _ = M.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)   # (1, n)

    def chol_step(j, M):
        pj = jnp.sum(jnp.sum(jnp.where((row == j) & (col == j), M, 0.0),
                             axis=1), axis=0)                # scalar
        d = jnp.sqrt(pj)
        cfull = jnp.sum(jnp.where(col == j, M, 0.0), axis=1)  # (n,)
        colv = jnp.where(k_ids[0] > j, cfull / d, 0.0)
        colv = jnp.where(k_ids[0] == j, d, colv)              # final L col
        upd = colv[:, None] * colv[None, :]
        M = M - jnp.where((row > j) & (col > j), upd, 0.0)
        return jnp.where(col == j, colv[:, None], M)

    M = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), chol_step, M)
    L = jnp.where(row >= col, M, 0.0)
    l_ref[:] = L

    diag = jnp.sum(jnp.where(row == col, L, 0.0), axis=1)     # (n,)

    def inv_step(i, X):
        lrow = jnp.sum(jnp.where(row == i, L, 0.0), axis=0)   # (n,)
        lrow = jnp.where(k_ids[0] == i, 0.0, lrow)
        di = jnp.sum(jnp.where(k_ids[0] == i, diag, 0.0))     # scalar
        s = jnp.sum(lrow[:, None] * X, axis=0)                # (n,)
        e = jnp.where(k_ids[0] == i, 1.0, 0.0)                # (n,)
        xrow = (e - s) / di
        return jnp.where(row == i, xrow[None, :], X)

    X = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), inv_step,
                          jnp.zeros((n, n), M.dtype))
    linv_ref[:] = X


@functools.partial(jax.jit, static_argnames=("interpret",))
def _chol_inv_call2(D, interpret=False):
    nb, n, _ = D.shape
    sq = pl.BlockSpec((None, n, n), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _chol_inv_kernel2,
        grid=(nb,),
        in_specs=[sq],
        out_specs=(sq, sq),
        out_shape=(jax.ShapeDtypeStruct((nb, n, n), D.dtype),
                   jax.ShapeDtypeStruct((nb, n, n), D.dtype)),
        interpret=interpret,
    )(D)
    return out


@functools.partial(jax.jit, static_argnames=("interpret",))
def _chol_inv_call(D, interpret=False):
    nb, n, _ = D.shape
    # chunk the batch so ~3 live (G, n, n) f32 buffers fit well inside VMEM
    vmem_cap = 4 * 1024 * 1024
    G = max(1, min(nb, vmem_cap // max(3 * n * n * 4, 1)))
    # keep the sublane axis efficient and the grid exact
    if G >= 8:
        G = (G // 8) * 8
    nb_pad = ((nb + G - 1) // G) * G
    if nb_pad != nb:
        # identity padding keeps every chunk SPD
        pad = jnp.broadcast_to(jnp.eye(n, dtype=D.dtype),
                               (nb_pad - nb, n, n))
        D = jnp.concatenate([D, pad])
    out = pl.pallas_call(
        _chol_inv_kernel,
        grid=(nb_pad // G,),
        in_specs=[pl.BlockSpec((G, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((G, n, n), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((G, n, n), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((nb_pad, n, n), D.dtype),
                   jax.ShapeDtypeStruct((nb_pad, n, n), D.dtype)),
        interpret=interpret,
    )(D)
    return out[0][:nb], out[1][:nb]


def chol_linv_pallas(D, interpret=False, layout=None):
    """Batched ``D = L L^T`` and ``L^{-1}`` via the fused Pallas kernel.

    ``D``: (nb, n, n) float32, SPD per block.  Returns ``(L, Linv, ok)``
    with the same contract as ``block_tridiag._chol_linv`` (``ok`` is the
    finiteness certificate the IPM's regularization loop keys on: a
    non-SPD block yields sqrt(<0) = NaN which propagates into L^{-1}).

    ``layout``: "rank2" (default; batch axis = grid, squeezed (n, n)
    refs -- the only form this machine's Mosaic accepts) or "rank3"
    (chunked (G, n, n) refs; kept for toolchains that take them).
    """
    if D.ndim != 3 or D.shape[-1] != D.shape[-2]:
        raise ValueError(f"expected (nb, n, n) blocks, got {D.shape}")
    if layout is None:
        layout = os.environ.get("IXM_PALLAS_LAYOUT", "rank2")
    call = _chol_inv_call2 if layout == "rank2" else _chol_inv_call
    L, Linv = call(D, interpret=bool(interpret))
    return L, Linv, jnp.all(jnp.isfinite(Linv))


# ----------------------------------------------------------------------
# dispatch policy
# ----------------------------------------------------------------------
def pallas_chol_enabled(dtype) -> bool:
    """True when ``_chol_linv`` should route through the Pallas kernel.

    Default (``IXM_PALLAS=auto``) is OFF everywhere: the kernel uses
    rank-3 ``(G, n, n)`` VMEM blocks, and the Mosaic toolchain behind this
    machine's remote-compile tunnel rejects ALL rank-3 blocks ("failed to
    legalize operation 'func.return'" -- measured round 4: even a rank-3
    copy kernel fails, while rank-2 kernels compile and run).  Routing the
    device path through it unvalidated is what broke the round-3 ir32
    headline (ADVICE r3 item 1), so the kernel stays opt-in until a
    compiled on-device smoke run (benchmarks/pallas_smoke.py) passes.
    ``IXM_PALLAS=1`` forces it (interpret mode on CPU -- tests);
    ``IXM_PALLAS=0`` is the explicit kill switch.  The env var is read at
    every call (trace-time, cheap) so the switch works even after the
    solver stack is imported."""
    env = os.environ.get("IXM_PALLAS", "auto")
    if env == "0" or jnp.dtype(dtype) != jnp.float32:
        return False
    return env == "1"


def pallas_interpret_needed() -> bool:
    try:
        return jax.devices()[0].platform == "cpu"
    except Exception:
        return True
