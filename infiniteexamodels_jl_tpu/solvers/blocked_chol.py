"""Blocked batched Cholesky + triangular inverse for emulated-f64 on TPU.

Why: XLA lowers ``jnp.linalg.cholesky`` / ``solve_triangular`` for f64 on
TPU to unblocked column loops in double-double arithmetic -- measured on
the quad-1000 band KKT ((640, 64, 64) blocks, benchmarks/device_prims.py):
439 ms per batched Cholesky and 225 ms per batched triangular inverse,
while an f64 batched MATMUL of the same shape is ~14 ms (XLA emulates
matmuls through the MXU far better than sequential scalar loops).  These
two primitives are the entire cost of the IPM's f64 factorization -- the
step set every solve demotes to near convergence, where the condensed
KKT's conditioning exceeds f32 viability (~1/eps32).

The blocked right-looking algorithm below restructures both primitives so
all O(n^3) work is a handful of full-width batched f64 matmuls; only
(nb, p, p) panels (p=8) hit XLA's sequential kernels.  Same flop count,
several-fold less wall time on the device, comparable accuracy (panel
factorizations are still backward-stable f64; trailing updates are
matmuls, the dominant error term of any blocked factorization).

Reference role: the TPU-native counterpart of CUDSS's blocked dense
factor kernels (reference README.md:36-41 reaches them via MadNLP).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


def blocked_chol_linv(D, panel=8):
    """Batched lower Cholesky ``D = L L^T`` plus explicit ``L^{-1}`` for
    (nb, n, n) SPD blocks, blocked so the hot work is batched matmuls.

    Returns ``(L, Linv)``; NaNs propagate from non-SPD panels exactly like
    the unblocked XLA path, so callers' finiteness certificates keep
    working.
    """
    nb, n, _ = D.shape
    p = min(panel, n)
    if n % p:
        # callers pad block sizes to multiples of 8 (block_tridiag rounds
        # bs with _round_up); fall back rather than repad here
        L = jnp.linalg.cholesky(D)
        eye = jnp.eye(n, dtype=D.dtype)
        return L, jsl.solve_triangular(L, jnp.broadcast_to(eye, D.shape),
                                       lower=True)
    k = n // p
    eye_p = jnp.broadcast_to(jnp.eye(p, dtype=D.dtype), (nb, p, p))

    # -- right-looking factor: p-column panels, full-width matmul updates
    L = jnp.zeros_like(D)
    Ms = []                       # panel inverses L_jj^{-1}, reused below
    T = D
    for j in range(k):
        a, b = j * p, (j + 1) * p
        Ljj = jnp.linalg.cholesky(T[:, a:b, a:b])
        Mjj = jsl.solve_triangular(Ljj, eye_p, lower=True)
        Ms.append(Mjj)
        L = L.at[:, a:b, a:b].set(Ljj)
        if b < n:
            # L_21 = T_21 L_jj^{-T}: one (nb, n-b, p) matmul
            L21 = jnp.einsum("kab,kcb->kac", T[:, b:, a:b], Mjj)
            L = L.at[:, b:, a:b].set(L21)
            # trailing Schur update: one (nb, n-b, n-b) Gram matmul
            T = T.at[:, b:, b:].add(
                -jnp.einsum("kab,kcb->kac", L21, L21))

    # -- blocked triangular inverse: row-block i of X = L^{-1} is
    #    X_i,:i = -M_ii (L_i,:i @ X_:i,:i),  X_ii = M_ii
    #    (one full-width matmul pair per row block)
    X = jnp.zeros_like(D)
    for i in range(k):
        a, b = i * p, (i + 1) * p
        X = X.at[:, a:b, a:b].set(Ms[i])
        if i:
            acc = jnp.einsum("kab,kbc->kac", L[:, a:b, :a], X[:, :a, :a])
            X = X.at[:, a:b, :a].set(
                -jnp.einsum("kab,kbc->kac", Ms[i], acc))
    return L, X


def blocked_chol_enabled(dtype) -> bool:
    """Use the blocked path for f64 blocks on a real TPU (where XLA's
    unblocked f64 kernels are the measured bottleneck); CPU/GPU keep the
    native LAPACK-grade kernels.  IXM_BLOCKED_CHOL=0 kills, =1 forces
    (tests exercise the blocked code on the CPU mesh this way)."""
    env = os.environ.get("IXM_BLOCKED_CHOL", "auto")
    if env == "0" or jnp.dtype(dtype) != jnp.float64:
        return False
    if env == "1":
        return True
    try:
        return jax.devices()[0].platform not in ("cpu", "gpu")
    except Exception:
        return False
