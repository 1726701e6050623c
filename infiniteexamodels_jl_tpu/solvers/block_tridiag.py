"""Structured condensed-KKT backends (block-tridiagonal + arrowhead).

Transcribed problems have two dominant KKT structures (SURVEY.md §5,§7):
time-stencil coupling -> block-tridiagonal; scenario coupling through
first-stage variables -> block-diagonal + arrowhead.  Both are special cases
of "block-tridiagonal T plus dense border B/C":

    K = [ T   B ]      T: (nb, bs, bs) diag + (nb-1, bs, bs) lower blocks
        [ B^T C ]      B: (nb*bs, nb2), C: (nb2, nb2)

factorized as blocked Cholesky of T (lax.scan over blocks; dense per-block
ops on the MXU) followed by a dense Schur complement for the border.

NOTE round 1 ships the interface with a dense fallback; the scan-based
factorization lands next.
"""
from __future__ import annotations

from .kkt import DenseKKT


def make_structured_kkt(model, fallback=True):
    # TODO(round 1, later pass): detect block-tridiagonal ordering from the
    # hessian pattern + variable metadata and return the structured backend.
    if fallback:
        return DenseKKT(model)
    raise NotImplementedError("block-tridiagonal KKT backend in progress")
