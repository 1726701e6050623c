"""SimdModel: the frozen NLP with batched JAX evaluation kernels.

TPU-native ExaModel analogue (observed interface of the reference's upstream:
ExaModel fields theta/x0/lvar/uvar and the solution/multipliers API at
/root/reference/src/infiniteopt_backend.jl:464-527).  All evaluation methods
are pure functions of ``(x, theta)`` so solvers can jit over them; each
objective/constraint family contributes one vmapped template trace plus
static-index gathers/scatters, which XLA fuses into a handful of kernels.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .compile import CompiledFamily


class SimdModel:
    def __init__(self, core, dtype=None, device=None):
        self.core = core
        self.dtype = dtype or jnp.float64
        self.device = device
        self.sense = 1.0 if core.minimize else -1.0
        self.nvar = core.nvar
        self.ncon = core.ncon
        self.ntheta = core.ntheta

        self.con_fams = [
            CompiledFamily(f.expr, f.itr, offset=f.offset, name=f.name)
            for f in core.con_families
        ]
        self.obj_fams = [
            CompiledFamily(f.expr, f.itr, name=f.name)
            for f in core.obj_families
        ]

        if core.con_families:
            self.lcon = jnp.asarray(
                np.concatenate([f.lcon for f in core.con_families]), self.dtype)
            self.ucon = jnp.asarray(
                np.concatenate([f.ucon for f in core.con_families]), self.dtype)
        else:
            self.lcon = jnp.zeros(0, self.dtype)
            self.ucon = jnp.zeros(0, self.dtype)

        # device copies of per-family static data
        self._fam_dev = {}
        for fam in self.con_fams + self.obj_fams:
            self._fam_dev[id(fam)] = (
                jnp.asarray(fam.vidx), jnp.asarray(fam.pidx),
                jnp.asarray(fam.fdata, self.dtype),
            )

        # static sparsity patterns (numpy + device copies)
        self.jac_rows_np = (np.concatenate([f.jac_rows() for f in self.con_fams])
                            if self.con_fams else np.zeros(0, np.int64))
        self.jac_cols_np = (np.concatenate([f.jac_cols() for f in self.con_fams])
                            if self.con_fams else np.zeros(0, np.int64))
        hp = [f.hess_rows_cols() for f in self.con_fams + self.obj_fams]
        self.hess_rows_np = (np.concatenate([p[0] for p in hp]) if hp
                             else np.zeros(0, np.int64))
        self.hess_cols_np = (np.concatenate([p[1] for p in hp]) if hp
                             else np.zeros(0, np.int64))
        self.jac_rows = jnp.asarray(self.jac_rows_np)
        self.jac_cols = jnp.asarray(self.jac_cols_np)

        self.refresh_from_core()

        # jitted entry points (shared across solves)
        self.obj_j = jax.jit(self.obj)
        self.cons_j = jax.jit(self.cons)
        self.grad_j = jax.jit(self.grad)

    # -- mutable data ----------------------------------------------------
    def refresh_from_core(self):
        """Re-materialize x0/bounds/theta device arrays after host-side
        mutation of the core (start-value updates, parameter updates)."""
        c = self.core
        self.x0 = jnp.asarray(c.x0, self.dtype)
        self.lvar = jnp.asarray(c.lvar, self.dtype)
        self.uvar = jnp.asarray(c.uvar, self.dtype)
        self.theta = jnp.asarray(c.theta, self.dtype)
        # warm-start multiplier storage (NLPModels get_y0 analogue,
        # reference /root/reference/src/infiniteopt_backend.jl:600-601)
        if not hasattr(self, "y0") or self.y0.shape[0] != self.ncon:
            self.y0 = jnp.zeros(self.ncon, self.dtype)

    def set_parameter(self, par, values):
        """In-place theta update without rebuild (reference
        ExaModels.set_parameter! at infiniteopt_backend.jl:522-527)."""
        self.core.set_parameter(par, values)
        self.theta = jnp.asarray(self.core.theta, self.dtype)

    def set_x0(self, x0):
        self.x0 = jnp.asarray(x0, self.dtype)

    def set_y0(self, y0):
        self.y0 = jnp.asarray(y0, self.dtype)

    # -- family building block ------------------------------------------
    def _gather(self, fam, x, theta):
        vidx, pidx, fdata = self._fam_dev[id(fam)]
        return x[vidx], theta[pidx], fdata

    def _fam_vals(self, fam, x, theta):
        xg, pg, fv = self._gather(fam, x, theta)
        return jax.vmap(fam.fn)(xg, pg, fv)

    def _fam_grads(self, fam, x, theta):
        xg, pg, fv = self._gather(fam, x, theta)
        return jax.vmap(jax.grad(fam.fn))(xg, pg, fv)     # (n, kx)

    def _fam_hess(self, fam, x, theta):
        xg, pg, fv = self._gather(fam, x, theta)
        return jax.vmap(jax.hessian(fam.fn))(xg, pg, fv)  # (n, kx, kx)

    # -- evaluations (user sense; solvers fold in self.sense) ------------
    def obj(self, x, theta):
        total = jnp.zeros((), self.dtype)
        for fam in self.obj_fams:
            total = total + jnp.sum(self._fam_vals(fam, x, theta))
        return total

    def grad(self, x, theta):
        g = jnp.zeros(self.nvar, self.dtype)
        for fam in self.obj_fams:
            if fam.kx == 0:
                continue
            gv = self._fam_grads(fam, x, theta)
            vidx = self._fam_dev[id(fam)][0]
            g = g.at[vidx.reshape(-1)].add(gv.reshape(-1))
        return g

    def cons(self, x, theta):
        if not self.con_fams:
            return jnp.zeros(0, self.dtype)
        return jnp.concatenate(
            [self._fam_vals(f, x, theta) for f in self.con_fams])

    # -- fused value+derivative sweeps (one trace per family instead of
    # two; halves the per-family kernel count in the jitted IPM step) -----
    def obj_and_grad(self, x, theta):
        total = jnp.zeros((), self.dtype)
        g = jnp.zeros(self.nvar, self.dtype)
        for fam in self.obj_fams:
            xg, pg, fv = self._gather(fam, x, theta)
            if fam.kx == 0:
                total = total + jnp.sum(jax.vmap(fam.fn)(xg, pg, fv))
                continue
            v, gv = jax.vmap(jax.value_and_grad(fam.fn))(xg, pg, fv)
            total = total + jnp.sum(v)
            vidx = self._fam_dev[id(fam)][0]
            g = g.at[vidx.reshape(-1)].add(gv.reshape(-1))
        return total, g

    def cons_and_jac(self, x, theta):
        vals, jparts = [], []
        for fam in self.con_fams:
            xg, pg, fv = self._gather(fam, x, theta)
            if fam.kx == 0:
                vals.append(jax.vmap(fam.fn)(xg, pg, fv))
                continue
            v, gv = jax.vmap(jax.value_and_grad(fam.fn))(xg, pg, fv)
            vals.append(v)
            jparts.append(gv.reshape(-1))
        cval = (jnp.concatenate(vals) if vals
                else jnp.zeros(0, self.dtype))
        jvals = (jnp.concatenate(jparts) if jparts
                 else jnp.zeros(0, self.dtype))
        return cval, jvals

    def jac_vals(self, x, theta):
        """Values matching (jac_rows, jac_cols)."""
        parts = []
        for fam in self.con_fams:
            if fam.kx == 0:
                continue
            parts.append(self._fam_grads(fam, x, theta).reshape(-1))
        if not parts:
            return jnp.zeros(0, self.dtype)
        return jnp.concatenate(parts)

    def _obj_hess_parts(self, x, theta, sigma):
        for fam in self.obj_fams:
            if fam.kx == 0:
                continue
            H = self._fam_hess(fam, x, theta)
            yield fam, sigma * H

    def _con_hess_parts(self, x, theta, lam):
        for fam in self.con_fams:
            if fam.kx == 0:
                continue
            H = self._fam_hess(fam, x, theta)
            w = jax.lax.dynamic_slice_in_dim(lam, fam.offset, fam.n)
            yield fam, w[:, None, None] * H

    def hess_vals(self, x, theta, lam, sigma):
        """Lagrangian Hessian COO values (full symmetric pattern
        hess_rows/cols): sigma * H(obj) + sum_i lam_i * H(c_i).

        NOTE the concat order is con families then obj families, matching
        the pattern construction in __init__.
        """
        parts = []
        for fam, Hw in self._con_hess_parts(x, theta, lam):
            parts.append(Hw.reshape(fam.n, -1)[:, self._sq(fam)].reshape(-1))
        for fam, Hw in self._obj_hess_parts(x, theta, sigma):
            parts.append(Hw.reshape(fam.n, -1)[:, self._sq(fam)].reshape(-1))
        if not parts:
            return jnp.zeros(0, self.dtype)
        return jnp.concatenate(parts)

    @staticmethod
    def _sq(fam):
        # (kx,kx) Hessian flattened in C order == pairs (a,b) meshgrid order
        return slice(None)

    def kkt_vals(self, x, theta, lam, sigma, d):
        """COO values of the condensed-KKT sparse part
        ``sigma*H_f + sum lam_i H_ci + J^T diag(d) J`` on the Hessian
        pattern: per con family the rank-1 ``d_r g_r g_r^T`` has exactly the
        family's square slot pattern, so it fuses into the same scatter."""
        parts = []
        for fam in self.con_fams:
            if fam.kx == 0:
                continue
            xg, pg, fv = self._gather(fam, x, theta)
            H = jax.vmap(jax.hessian(fam.fn))(xg, pg, fv)
            g = jax.vmap(jax.grad(fam.fn))(xg, pg, fv)
            w = jax.lax.dynamic_slice_in_dim(lam, fam.offset, fam.n)
            dr = jax.lax.dynamic_slice_in_dim(d, fam.offset, fam.n)
            M = w[:, None, None] * H + dr[:, None, None] * (
                g[:, :, None] * g[:, None, :])
            parts.append(M.reshape(-1))
        for fam, Hw in self._obj_hess_parts(x, theta, sigma):
            parts.append(Hw.reshape(-1))
        if not parts:
            return jnp.zeros(0, self.dtype)
        return jnp.concatenate(parts)

    # -- COO matvec helpers ----------------------------------------------
    def jprod(self, jvals, v):
        out = jnp.zeros(self.ncon, self.dtype)
        return out.at[self.jac_rows].add(jvals * v[self.jac_cols])

    def jtprod(self, jvals, w):
        out = jnp.zeros(self.nvar, self.dtype)
        return out.at[self.jac_cols].add(jvals * w[self.jac_rows])

    # -- solution extraction ---------------------------------------------
    def solution(self, xflat, var):
        """Reshape a flat solution slice to a variable's support grid
        (ExaModels.solution analogue, infiniteopt_backend.jl:464)."""
        seg = np.asarray(xflat)[var.offset:var.offset + var.length]
        return seg.reshape(var.shape) if var.shape else float(seg[0])

    def theta_view(self, par):
        seg = np.asarray(self.theta)[par.offset:par.offset + par.length]
        return seg.reshape(par.shape) if par.shape else float(seg[0])

    def multipliers(self, yflat, fam):
        return np.asarray(yflat)[fam.offset:fam.offset + len(fam)]
