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


def _panel_chol(Dp):
    """Unrolled batched Cholesky of small (nb, p, p) panels.

    XLA's f64 cholesky on TPU runs double-double COLUMN LOOPS whose
    per-iteration latency dwarfs the arithmetic at p=8 (device probe:
    ~3-4 ms per (640,8,8) call); the same recursion unrolled into p
    batched vector ops (sqrt, scale, rank-1 update) is bandwidth-trivial.
    NaNs propagate from non-SPD panels exactly like the builtin."""
    p = Dp.shape[-1]
    ri = jnp.arange(p)
    L = jnp.zeros_like(Dp)
    for j in range(p):
        ljj = jnp.sqrt(Dp[:, j, j])
        col = Dp[:, :, j] / ljj[:, None]
        col = jnp.where((ri > j)[None, :], col, 0.0)
        col = col.at[:, j].set(ljj)
        L = L.at[:, :, j].set(col)
        Dp = Dp - col[:, :, None] * col[:, None, :]
    return L


def _panel_inv(L):
    """Unrolled batched inverse of small (nb, p, p) lower-triangular
    panels: forward substitution, one batched matvec per row (same
    latency story as _panel_chol -- the builtin trisolve costs ~3.7 ms
    per (640,8,8) call on this device)."""
    p = L.shape[-1]
    X = jnp.zeros_like(L)
    for i in range(p):
        # rows >= i of X are still zero, so the full-row product only
        # picks up the j < i terms of the substitution
        acc = jnp.einsum("bk,bkm->bm", L[:, i, :], X)
        row = (-acc).at[:, i].add(1.0) / L[:, i, i][:, None]
        X = X.at[:, i, :].set(row)
    return X


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
    dt = D.dtype
    ri = jnp.arange(n)
    dus = jax.lax.dynamic_update_slice
    dsl = jax.lax.dynamic_slice
    # Ozaki-sliced exact products for the full-width matmuls: on TPU the
    # emulated-f64 matmul is the factorization's dominant cost; the slice
    # products run on the f32 MXU with exact accumulation (contraction
    # lengths p=8 / n<=128 stay under the 2^24 exactness bound)
    use_oz = dt == jnp.float64 and n <= 128 and ozaki_factor_enabled(dt)

    # -- right-looking factor as a fori_loop over p-column panels:
    # full-width masked slabs keep every shape static, so the traced
    # graph is O(1) in the panel count (the unrolled form made XLA
    # compile times explode at quad-4000 scale: >1 h over the tunnel).
    # The extra flops of full-width updates are matmul flops -- noise.
    def fac_body(j, carry):
        T, L, Ms = carry
        a = j * p
        Dkk = dsl(T, (0, a, a), (nb, p, p))
        Ljj = _panel_chol(Dkk)
        Mjj = _panel_inv(Ljj)
        Ms = dus(Ms, Mjj[None], (j, 0, 0, 0))
        colslab = dsl(T, (0, 0, a), (nb, n, p))
        L21 = jnp.einsum("bij,bkj->bik", colslab, Mjj)
        # keep only rows strictly below the panel; garbage above is masked
        L21 = jnp.where((ri >= a + p)[None, :, None], L21, 0.0)
        colwrite = dus(L21, Ljj, (0, a, 0))
        L = dus(L, colwrite, (0, 0, a))
        # trailing Schur update: L21 is zero outside rows >= a+p, so the
        # full-width Gram product touches exactly the trailing block
        if use_oz:
            T = T - ozaki_gram(L21)
        else:
            T = T - jnp.einsum("bip,bjp->bij", L21, L21)
        return T, L, Ms

    _, L, Ms = jax.lax.fori_loop(
        0, k, fac_body,
        (D, jnp.zeros_like(D), jnp.zeros((k, nb, p, p), dt)))

    # -- blocked triangular inverse, same fori structure: row-block i of
    #    X = L^{-1} is X_i,:i = -M_ii (L_i,:i @ X_:i,:i),  X_ii = M_ii
    def inv_body(i, X):
        a = i * p
        Mii = Ms[i]
        Lrows = dsl(L, (0, a, 0), (nb, p, n))
        Lrows = jnp.where((ri < a)[None, None, :], Lrows, 0.0)
        if use_oz:
            acc = ozaki_mm_pn_nm(Lrows, X)
        else:
            acc = jnp.einsum("bpn,bnm->bpm", Lrows, X)
        rowwrite = dus(-jnp.einsum("bpq,bqm->bpm", Mii, acc),
                       Mii, (0, 0, a))
        return dus(X, rowwrite, (0, a, 0))

    X = jax.lax.fori_loop(0, k, inv_body, jnp.zeros_like(D))
    return L, X


# ----------------------------------------------------------------------
# Ozaki-sliced exact f64 matvec on the f32 MXU path
# ----------------------------------------------------------------------
# The IPM's refinement needs EXACT residuals r = rhs - K dx (f32 ones get
# kappa-amplified by the correction -- measured divergence, see
# f32_refine_enabled), but the emulated-f64 batched matvec costs ~26 ms
# per (640,64,64) product on this chip vs ~0.02 ms in f32.  The Ozaki
# scheme splits each f64 operand into narrow integer-valued f32 slices
# whose pairwise products ACCUMULATE EXACTLY in f32 (slice width w=9:
# |S| <= 2^8+1, products <= 2^16.1, summed over bs<=128 lanes < 2^24),
# then recombines the level sums in f64.  Result: f64-grade (~2^-53
# relative to row norms) products built entirely from cheap f32 ops.

_OZ_W = 9          # slice significand width (exact for bs <= 128)
_OZ_K = 6          # slices: 6*9 = 54 bits >= f64's 53


def ozaki_slices(A, axis):
    """Split f64 ``A`` into ``_OZ_K`` integer-valued f32 slices along the
    contraction ``axis`` with per-row max-abs scaling.

    Returns ``(S, s)``: ``S`` is (k,) + A.shape float32, ``s`` the f64
    scale with ``axis`` kept as size 1; ``A ~= s * sum_j S_j 2^-(w(j+1))``
    to ~2^-54 relative."""
    w = _OZ_W
    s = jnp.max(jnp.abs(A), axis=axis, keepdims=True)
    s = jnp.where(s == 0, 1.0, s)
    anorm = A / s
    slices = []
    Rprev = jnp.zeros_like(anorm)
    for j in range(_OZ_K):
        R = jnp.round(anorm * (2.0 ** (w * (j + 1))))
        slices.append((R - Rprev * (2.0 ** w)).astype(jnp.float32))
        Rprev = R
    return jnp.stack(slices), s


def _oz_pair_contract(SA, SB, einstr):
    """Σ_lvl 2^-(w(lvl+2)) Σ_{i+j=lvl} einsum(einstr, SA_i, SB_j), f64.

    The pairwise slice products accumulate EXACTLY in f32 (integer slice
    values < 2^9, contraction length <= 128 lanes keeps partial sums
    < 2^24); cross-pair and cross-level sums run on the f64 result --
    the same truncation (~2^-54 relative) as ``ozaki_bmv``.

    The pairs of each level run as ONE stacked einsum (level batch in the
    leading axis): 21 separate small products would be launch-latency
    bound on the device, and each is far below MXU saturation anyway."""
    lhs, rhs = einstr.split("->")
    a, b = lhs.split(",")
    bat = f"x{a},x{b}->x{rhs}"
    out = None
    for lvl in range(_OZ_K):
        SAl = SA[:lvl + 1]
        SBl = jnp.flip(SB[:lvl + 1], 0)
        acc = jnp.einsum(bat, SAl, SBl).astype(jnp.float64).sum(0)
        term = acc * (2.0 ** (-_OZ_W * (lvl + 2)))
        out = term if out is None else out + term
    return out


def ozaki_gram(A):
    """Exact-f64 batched Gram ``A @ A^T`` ((nb, n, p) -> (nb, n, n)) from
    f32 MXU slice products -- the Schur trailing update of the blocked
    factorization, its single dominant emulated-f64 matmul."""
    SA, sA = ozaki_slices(A, axis=-1)
    C = _oz_pair_contract(SA, SA, "bip,bjp->bij")
    return C * sA * jnp.swapaxes(sA, -1, -2)


def ozaki_mm_pn_nm(A, B):
    """Exact-f64 batched matmul ``A @ B`` for (nb, p, n) x (nb, n, m)
    (the blocked inverse's row-block substitution product)."""
    SA, sA = ozaki_slices(A, axis=-1)          # (k, nb, p, n), (nb, p, 1)
    SB, sB = ozaki_slices(B, axis=1)           # (k, nb, n, m), (nb, 1, m)
    C = _oz_pair_contract(SA, SB, "bpn,bnm->bpm")
    return C * sA * sB


def ozaki_factor_enabled(dtype) -> bool:
    """Run the blocked factorization's full-width matmuls (Schur gram,
    panel-column transform, inverse substitution) through Ozaki-sliced
    exact f32 products on TPU-f64 (IXM_OZAKI_FACTOR=0 kills, =1 forces
    for CPU tests).  Accuracy is ~2^-54 relative per product -- the same
    grade as the emulated-f64 matmuls it replaces."""
    env = os.environ.get("IXM_OZAKI_FACTOR", "auto")
    if env == "0" or jnp.dtype(dtype) != jnp.float64:
        return False
    if env == "1":
        return True
    try:
        return jax.devices()[0].platform not in ("cpu", "gpu")
    except Exception:
        return False


def ozaki_bmv(SA, sA, v):
    """Exact-accumulation batched matvec ``A @ v`` from pre-sliced ``A``.

    ``SA``: (k, nb, m, n) f32 slices, ``sA``: (nb, m, 1) f64 scales,
    ``v``: (nb, n) f64.  Returns (nb, m) f64 with ~2^-53 relative error
    (to row-scale * max|v| per block) -- f64-grade for residual purposes.
    """
    w = _OZ_W
    Sv, sv = ozaki_slices(v, axis=-1)          # (k, nb, n), (nb, 1)
    # each pair-product einsum accumulates EXACTLY in f32 (integer values
    # < 2^24); cross-pair and cross-level accumulation happens on small
    # (nb, m) f64 vectors, so no precision is lost anywhere downstream
    out = jnp.zeros(SA.shape[1:3], jnp.float64)
    for lvl in range(_OZ_K):
        acc = jnp.zeros(SA.shape[1:3], jnp.float64)
        for i in range(lvl + 1):
            j = lvl - i
            acc = acc + jnp.einsum("kij,kj->ki", SA[i],
                                   Sv[j]).astype(jnp.float64)
        out = out + acc * (2.0 ** (-_OZ_W * (lvl + 2)))
    return out * sA[..., 0] * sv


def ozaki_refine_enabled(dtype) -> bool:
    """Use Ozaki-sliced exact matvecs for the f64 refinement residuals on
    TPU (IXM_OZAKI=0 kills, =1 forces -- tests exercise it on CPU)."""
    env = os.environ.get("IXM_OZAKI", "auto")
    if env == "0" or jnp.dtype(dtype) != jnp.float64:
        return False
    if env == "1":
        return True
    try:
        return jax.devices()[0].platform not in ("cpu", "gpu")
    except Exception:
        return False


def f32_refine_enabled(dtype) -> bool:
    """EXPERIMENTAL (off unless IXM_F32_REFINE=1): compute the f64 path's
    refinement residuals in f32.

    Measured round-4 and rejected as a default: the refinement CORRECTION
    dx += K^{-1} r amplifies the f32 residual noise by kappa (~1e8 on the
    condensed KKT), so correction rounds inject O(kappa*eps32)-relative
    garbage into the step -- quad-40 at tol=1e-8 diverged to max_iter
    with the objective off by 35%.  Exact residuals are load-bearing;
    the production answer is the Ozaki-sliced exact matvec (ozaki_bmv
    below), which gets f64-grade residuals out of exact-accumulating f32
    MXU products."""
    return os.environ.get("IXM_F32_REFINE", "0") == "1" \
        and jnp.dtype(dtype) == jnp.float64


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
