"""Condensed-KKT systems.

The IPM reduces each Newton step to a symmetric positive-definite (after
regularization) system in the primal x variables only:

    K = W + Sigma_x + delta_w I + J^T D J,    K dx = rhs

(the LiftedKKT-style condensation of the GPU IPM literature; the reference's
pipeline obtains the same effect via MadNLP+CUDSS, README.md:36-41).  The
sparse part of K is assembled directly from per-family COO values
(`SimdModel.kkt_vals`) -- the J^T D J term has exactly the per-family square
slot pattern of the Hessian, so no sparse matmul ever materializes.

Backends:
- :class:`DenseKKT` -- scatter into a dense (n, n) matrix; Cholesky via XLA.
  Right for small/medium n and the correctness oracle path.
- :class:`BlockTridiagKKT` (solvers/block_tridiag.py) -- exploits the
  block-tridiagonal + arrowhead structure of transcribed OCP/SP problems.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


class DenseKKT:
    """Dense condensed KKT backend."""

    def __init__(self, model):
        self.model = model
        self.n = model.nvar
        self.rows = jnp.asarray(model.hess_rows_np)
        self.cols = jnp.asarray(model.hess_cols_np)

    def assemble(self, x, theta, lam, sigma, d, diag_extra):
        """K = sigma*Hf + sum lam_i Hc_i + J^T diag(d) J + diag(diag_extra).

        diag_extra carries Sigma_x + delta_w."""
        vals = self.model.kkt_vals(x, theta, lam, sigma, d)
        K = jnp.zeros((self.n, self.n), x.dtype)
        K = K.at[self.rows, self.cols].add(vals)
        return K + jnp.diag(diag_extra)

    def factor(self, K):
        L = jnp.linalg.cholesky(K)
        ok = jnp.all(jnp.isfinite(L))
        return L, ok

    def solve(self, L, rhs):
        z = jsl.solve_triangular(L, rhs, lower=True)
        return jsl.solve_triangular(L.T, z, lower=False)

    def matvec(self, K, v):
        return K @ v
