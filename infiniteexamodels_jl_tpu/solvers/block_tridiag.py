"""Structured condensed-KKT backends: block-tridiagonal / block-diagonal
plus dense arrowhead.

Transcribed problems have two dominant KKT structures (SURVEY.md §5, §7):
time-stencil coupling -> block-banded; scenario coupling through first-stage
variables -> block-diagonal + arrowhead border.  Both are instances of

    K = [ T    B ]      T: nb blocks of size bs (tridiagonal or diagonal)
        [ B^T  C ]      B: (nT, m) border, C: (m, m) dense corner

The reference pipeline hands this structure to CUDSS/MA27 as a general
sparse matrix (README.md:36-41); the TPU-native design *recovers* the
structure once at build time and factorizes with dense per-block kernels on
the MXU:

- high-degree variables form the border (first-stage coupling),
- the remaining T-subgraph is split into connected components: many small
  components (scenarios) -> component-aligned blocks, selL empty, batched
  (vmap) Cholesky -- embarrassingly parallel over blocks and shardable over
  a device mesh; one big component (time) -> reverse-Cuthill-McKee band,
  scan-based blocked Cholesky,
- the border is eliminated with a dense Schur complement
  S = C - Y^T Y, Y = L_T^{-1} B.

Everything is static-shape; per-iteration assembly is a handful of
scatter-adds from the same per-family COO value stream the dense backend
uses.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from .kkt import DenseKKT


def _round_up(x, m):
    return ((x + m - 1) // m) * m


class BlockTridiagKKT:
    """Structured condensed-KKT backend.  Build-time analysis happens once;
    per-iteration work is scatter-add assembly + block factorization.

    ``factor_dtype=jnp.float32`` enables mixed precision: the blocks are
    Jacobi-scaled (symmetric diagonal equilibration) and factorized in
    native f32 -- on TPU this runs on the hardware path instead of the
    emulated-f64 one -- while the IPM's f64 iterative refinement (driven
    through :meth:`matvec` on the f64 blocks) restores full accuracy.
    """

    def __init__(self, model, max_block=512, min_blocks=4, max_border=4096,
                 factor_dtype=None):
        self.factor_dtype = factor_dtype
        self.model = model
        n = model.nvar
        rows = model.hess_rows_np
        cols = model.hess_cols_np

        import scipy.sparse as sp
        from scipy.sparse.csgraph import (reverse_cuthill_mckee,
                                          connected_components)

        adj = sp.coo_matrix(
            (np.ones(len(rows)), (rows, cols)), shape=(n, n)).tocsr()
        adj.sum_duplicates()
        deg = np.diff(adj.indptr)

        # border = unusually high-degree variables (first-stage coupling)
        med = max(int(np.median(deg)), 1)
        thresh = max(8 * med, 32)
        border_mask = deg > thresh
        if border_mask.sum() > max_border:
            order = np.argsort(deg)[::-1]
            border_mask = np.zeros(n, bool)
            border_mask[order[:max_border]] = True
        t_mask = ~border_mask
        t_ids = np.nonzero(t_mask)[0]
        b_ids = np.nonzero(border_mask)[0]
        nT, mB = len(t_ids), len(b_ids)
        self.n, self.nT, self.mB = n, nT, mB
        if nT == 0:
            self.usable = False
            return

        sub = adj[t_ids][:, t_ids]
        ncomp, labels = connected_components(sub, directed=False)
        comp_sizes = np.bincount(labels) if ncomp else np.zeros(0, int)

        # padded position of every T variable + block size
        slot = np.full(n, -1, dtype=np.int64)
        if ncomp >= min_blocks and comp_sizes.max() <= max_block:
            # scenario mode: one block per component, padded to a common bs
            bs = _round_up(int(comp_sizes.max()), 8)
            nb = int(ncomp)
            offsets = np.zeros(n, dtype=np.int64)
            counter = np.zeros(ncomp, dtype=np.int64)
            for k, v in zip(labels, t_ids):
                offsets[v] = counter[k]
                counter[k] += 1
            slot[t_ids] = labels * bs + offsets[t_ids]
            self.mode = "block_diag"
        else:
            # time mode: RCM band ordering
            perm = reverse_cuthill_mckee(sub, symmetric_mode=True)
            t_order_band = t_ids[perm]
            pos = np.full(n, -1, dtype=np.int64)
            pos[t_order_band] = np.arange(nT)
            tt = t_mask[rows] & t_mask[cols]
            bw = int(np.max(np.abs(pos[rows[tt]] - pos[cols[tt]]),
                            initial=0))
            bs = _round_up(max(bw, 1) + 1, 8)
            nb = max((nT + bs - 1) // bs, 1)
            slot[t_ids] = pos[t_ids]
            self.mode = "band"

        self.bs, self.nb = bs, nb
        self.usable = bs <= max_block and nb >= min_blocks
        if not self.usable:
            return
        nTpad = nb * bs
        self.nTpad = nTpad

        # -- entry classification (static) -------------------------------
        rr, cc = rows, cols
        tt = t_mask[rr] & t_mask[cc]
        pr, pc = slot[rr], slot[cc]
        blk_r = np.where(pr >= 0, pr // bs, -9)
        blk_c = np.where(pc >= 0, pc // bs, -9)
        off_r, off_c = pr % bs, pc % bs

        selD = np.nonzero(tt & (blk_r == blk_c))[0]
        selL = np.nonzero(tt & (blk_r == blk_c + 1))[0]
        if tt.any():
            cross = tt & (np.abs(blk_r - blk_c) > 1)
            if cross.any():
                # structure assumption violated; caller falls back
                self.usable = False
                return
        selB = np.nonzero(t_mask[rr] & border_mask[cc])[0]
        selC = np.nonzero(border_mask[rr] & border_mask[cc])[0]
        self.block_diag = (self.mode == "block_diag") or len(selL) == 0

        bpos = np.full(n, -1, dtype=np.int64)
        bpos[b_ids] = np.arange(mB)

        as_j = jnp.asarray
        self.selD, self.selL = as_j(selD), as_j(selL)
        self.selB, self.selC = as_j(selB), as_j(selC)
        self.D_idx = (as_j(blk_r[selD]), as_j(off_r[selD]),
                      as_j(off_c[selD]))
        self.L_idx = (as_j(blk_c[selL]), as_j(off_r[selL]),
                      as_j(off_c[selL]))
        self.B_idx = (as_j(pr[selB]), as_j(bpos[cc[selB]]))
        self.C_idx = (as_j(bpos[rr[selC]]), as_j(bpos[cc[selC]]))

        # scatter targets for diagonal additions + rhs permutation
        self.t_ids_np = t_ids
        self.t_ids = as_j(t_ids)
        self.t_slots = as_j(slot[t_ids])        # padded positions
        self.b_ids = as_j(b_ids)
        tslot = slot[t_ids]
        self.diagD_idx = (as_j(tslot // bs), as_j(tslot % bs))
        # unit diagonal on padding slots so Cholesky stays well-posed
        occupied = np.zeros(nTpad, bool)
        occupied[tslot] = True
        pad = (~occupied).astype(np.float64).reshape(nb, bs)
        self.pad_eye = as_j(np.einsum("bi,ij->bij", pad, np.eye(bs)))

    # ------------------------------------------------------------------
    def assemble(self, x, theta, lam, sigma, d, diag_extra):
        m = self.model
        vals = m.kkt_vals(x, theta, lam, sigma, d)
        dt = vals.dtype
        nb, bs, mB = self.nb, self.bs, self.mB
        D = jnp.zeros((nb, bs, bs), dt).at[self.D_idx].add(vals[self.selD])
        L = jnp.zeros((max(nb - 1, 1), bs, bs), dt)
        if nb > 1 and not self.block_diag:
            L = L.at[self.L_idx].add(vals[self.selL])
        B = jnp.zeros((self.nTpad, mB), dt).at[self.B_idx].add(
            vals[self.selB])
        C = jnp.zeros((mB, mB), dt).at[self.C_idx].add(vals[self.selC])
        dT = diag_extra[self.t_ids]
        D = D.at[self.diagD_idx[0], self.diagD_idx[1],
                 self.diagD_idx[1]].add(dT)
        D = D + self.pad_eye
        C = C + jnp.diag(diag_extra[self.b_ids]) if mB else C
        return (D, L, B.reshape(nb, bs, mB), C)

    # ------------------------------------------------------------------
    def matvec(self, K, v):
        """K @ v from the block representation (used by the IPM's iterative
        refinement of the condensed solve)."""
        D, L, B, C = K
        nb, bs, mB = self.nb, self.bs, self.mB
        dt = v.dtype
        vT = jnp.zeros(self.nTpad, dt).at[self.t_slots].set(
            v[self.t_ids]).reshape(nb, bs)
        out_T = jnp.einsum("bij,bj->bi", D, vT)
        if nb > 1 and not self.block_diag:
            low = jnp.einsum("bij,bj->bi", L, vT[:-1])
            up = jnp.einsum("bji,bj->bi", L, vT[1:])
            out_T = out_T.at[1:].add(low).at[:-1].add(up)
        if mB:
            vB = v[self.b_ids]
            out_T = out_T + jnp.einsum("bij,j->bi", B, vB)
            out_B = jnp.einsum("bij,bi->j", B, vT) + C @ vB
        out = jnp.zeros(self.n, dt)
        out = out.at[self.t_ids].set(out_T.reshape(-1)[self.t_slots])
        if mB:
            out = out.at[self.b_ids].set(out_B)
        return out

    # ------------------------------------------------------------------
    def factor(self, K):
        D, L, B, C = K
        nb, bs, mB = self.nb, self.bs, self.mB

        if self.factor_dtype is not None and self.factor_dtype != D.dtype:
            # Jacobi (symmetric diagonal) equilibration, then cast: the
            # low-precision factorization runs on the native hardware path;
            # the IPM's refinement against the f64 matvec restores accuracy
            dg = jnp.abs(jnp.einsum("bii->bi", D))
            sT = 1.0 / jnp.sqrt(jnp.maximum(dg, 1e-30))      # (nb, bs)
            D = D * sT[:, :, None] * sT[:, None, :]
            if nb > 1 and not self.block_diag:
                L = L * sT[1:, :, None] * sT[:-1, None, :]
            if mB:
                sB = 1.0 / jnp.sqrt(jnp.maximum(jnp.abs(jnp.diag(C)),
                                                1e-30))
                B = B * sT[:, :, None] * sB[None, None, :]
                C = C * sB[:, None] * sB[None, :]
            else:
                sB = jnp.zeros(0, D.dtype)
            fdt = self.factor_dtype
            D, L, B, C = (D.astype(fdt), L.astype(fdt), B.astype(fdt),
                          C.astype(fdt))
        else:
            sT = sB = None

        if self.block_diag:
            # batched over blocks: embarrassingly parallel on the MXU and
            # shardable over a scenario mesh axis
            Lc_all = jnp.linalg.cholesky(D)
            Ltil_all = jnp.zeros((0, bs, bs), D.dtype)
            if mB:
                Y = jsl.solve_triangular(Lc_all, B, lower=True)
            else:
                Y = jnp.zeros((nb, bs, 0), D.dtype)
        else:
            def step(carry, inp):
                Lprev = carry
                Di, Li = inp
                Ltil = jsl.solve_triangular(Lprev, Li.T, lower=True).T
                Lc = jnp.linalg.cholesky(Di - Ltil @ Ltil.T)
                return Lc, (Lc, Ltil)

            L0 = jnp.linalg.cholesky(D[0])
            if nb > 1:
                _, (Lcs, Ltils) = jax.lax.scan(step, L0,
                                               (D[1:], L[:nb - 1]))
                Lc_all = jnp.concatenate([L0[None], Lcs])
                Ltil_all = Ltils
            else:
                Lc_all = L0[None]
                Ltil_all = jnp.zeros((0, bs, bs), D.dtype)
            if mB:
                def fwd_step(carry, inp):
                    Yprev = carry
                    Lc, Ltil, Bi = inp
                    Yi = jsl.solve_triangular(Lc, Bi - Ltil @ Yprev,
                                              lower=True)
                    return Yi, Yi

                Y0 = jsl.solve_triangular(Lc_all[0], B[0], lower=True)
                if nb > 1:
                    _, Yrest = jax.lax.scan(
                        fwd_step, Y0, (Lc_all[1:], Ltil_all, B[1:]))
                    Y = jnp.concatenate([Y0[None], Yrest])
                else:
                    Y = Y0[None]
            else:
                Y = jnp.zeros((nb, bs, 0), D.dtype)

        if mB:
            S = C - jnp.einsum("bij,bik->jk", Y, Y)
            Ls = jnp.linalg.cholesky(S)
        else:
            Ls = jnp.zeros((0, 0), D.dtype)

        ok = jnp.all(jnp.isfinite(Lc_all))
        if mB:
            ok = ok & jnp.all(jnp.isfinite(Ls))
        return (Lc_all, Ltil_all, Y, Ls, sT, sB), ok

    # ------------------------------------------------------------------
    def _t_forward(self, Lc_all, Ltil_all, r):
        """Solve L_T u = r over blocks (r: (nb, bs, 1))."""
        nb = self.nb
        if self.block_diag:
            return jsl.solve_triangular(Lc_all, r, lower=True)

        def step(carry, inp):
            uprev = carry
            Lc, Ltil, ri = inp
            ui = jsl.solve_triangular(Lc, ri - Ltil @ uprev, lower=True)
            return ui, ui

        u0 = jsl.solve_triangular(Lc_all[0], r[0], lower=True)
        if nb > 1:
            _, urest = jax.lax.scan(step, u0, (Lc_all[1:], Ltil_all, r[1:]))
            return jnp.concatenate([u0[None], urest])
        return u0[None]

    def _t_backward(self, Lc_all, Ltil_all, u):
        """Solve L_T^T x = u over blocks (backward)."""
        nb = self.nb
        if self.block_diag:
            return jsl.solve_triangular(
                jnp.swapaxes(Lc_all, -1, -2), u, lower=False)
        xlast = jsl.solve_triangular(Lc_all[-1].T, u[-1], lower=False)
        if nb == 1:
            return xlast[None]

        def step(carry, inp):
            xnext = carry
            Lc, Ltil, ui = inp
            xi = jsl.solve_triangular(Lc.T, ui - Ltil.T @ xnext,
                                      lower=False)
            return xi, xi

        _, xrest = jax.lax.scan(
            step, xlast,
            (Lc_all[:-1][::-1], Ltil_all[::-1], u[:-1][::-1]))
        return jnp.concatenate([xrest[::-1], xlast[None]])

    def solve(self, fac, rhs):
        Lc_all, Ltil_all, Y, Ls, sT, sB = fac
        nb, bs, mB = self.nb, self.bs, self.mB
        dt = rhs.dtype
        fdt = Lc_all.dtype
        rT = jnp.zeros(self.nTpad, dt).at[self.t_slots].set(
            rhs[self.t_ids]).reshape(nb, bs, 1)
        if sT is not None:
            rT = (rT * sT[:, :, None]).astype(fdt)
        else:
            rT = rT.astype(fdt)
        if mB:
            rB = rhs[self.b_ids]
            if sB is not None:
                rB = (rB * sB)
            rB = rB.astype(fdt)
            u = self._t_forward(Lc_all, Ltil_all, rT)
            rhs2 = rB - jnp.einsum("bij,bik->j", Y, u)
            z2 = jsl.solve_triangular(Ls, rhs2, lower=True)
            x2 = jsl.solve_triangular(Ls.T, z2, lower=False)
            x1 = self._t_backward(Lc_all, Ltil_all,
                                  u - (Y @ x2)[..., None])
        else:
            u = self._t_forward(Lc_all, Ltil_all, rT)
            x1 = self._t_backward(Lc_all, Ltil_all, u)
            x2 = jnp.zeros(0, dt)
        x1 = x1.astype(dt)
        if sT is not None:
            x1 = x1 * sT[:, :, None]
        out = jnp.zeros(self.n, dt)
        out = out.at[self.t_ids].set(x1.reshape(-1)[self.t_slots])
        if mB:
            x2 = x2.astype(dt)
            if sB is not None:
                x2 = x2 * sB
            out = out.at[self.b_ids].set(x2)
        return out


def make_structured_kkt(model, fallback=True, **kwargs):
    """Detect block structure; fall back to the dense backend when the
    problem is too small or has no usable block layout."""
    try:
        kkt = BlockTridiagKKT(model, **kwargs)
        if kkt.usable:
            return kkt
    except Exception:
        if not fallback:
            raise
    if fallback:
        return DenseKKT(model)   # f64; mixed precision is structured-only
    raise NotImplementedError(
        "no usable block structure and fallback disabled")
