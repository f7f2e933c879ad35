"""Exact optimal-cost oracle for LightsOut.

LightsOut presses commute and are self-inverse, so a solution is a SET of
cells to press and solving state s means A x = s over GF(2), with A the
(n, n) plus-shape toggle matrix (the same matrix the env's XOR step uses,
lights_out.py:33-43 upstream).  When A is invertible — true for the 7x7
board the reference trains (`lightsout7`) — the solution is unique and the
optimal cost is exactly popcount(A^{-1} s).

The reference had no such oracle: its lightsout7 baseline lists optimal
lengths as n/a (BASELINE.md).  With it we can score solver optimality
exactly; it also certified that the reference's own shipped lightsout7
results (avg 24.26, results/lightsout7/output.txt) were 100% optimal.

For board sizes where A is singular (e.g. 5x5), optimal cost is the
minimum popcount over the coset x + ker(A); `optimal_costs` enumerates the
kernel (2^nullity candidates), which is fine for the small nullities of
real boards.
"""

from __future__ import annotations

import numpy as np


def toggle_matrix(dim: int) -> np.ndarray:
    """(dim^2, dim^2) GF(2) plus-shape toggle matrix; A[k] = cells flipped
    by pressing k. Symmetric, so rows also answer 'which presses flip k'."""
    n = dim * dim
    a = np.zeros((n, n), np.uint8)
    for i in range(dim):
        for j in range(dim):
            k = i * dim + j
            a[k, k] = 1
            if i > 0:
                a[k, (i - 1) * dim + j] = 1
            if i < dim - 1:
                a[k, (i + 1) * dim + j] = 1
            if j > 0:
                a[k, i * dim + j - 1] = 1
            if j < dim - 1:
                a[k, i * dim + j + 1] = 1
    return a


def gf2_solve_basis(a: np.ndarray):
    """Row-reduce [A | I]; returns (pseudo_inverse_rows, kernel_basis,
    pivot_cols). For invertible A the kernel is empty and
    x = pinv @ s (mod 2) is the unique solution."""
    n = a.shape[0]
    m = np.concatenate([a.copy() % 2, np.eye(n, dtype=np.uint8)], axis=1)
    r = 0
    pivots = []
    for c in range(n):
        piv = None
        for i in range(r, n):
            if m[i, c]:
                piv = i
                break
        if piv is None:
            continue
        m[[r, piv]] = m[[piv, r]]
        mask = m[:, c].copy()
        mask[r] = 0
        m ^= np.outer(mask, m[r])
        pivots.append(c)
        r += 1
    # kernel basis: free columns
    free = [c for c in range(n) if c not in pivots]
    kernel = []
    red = m[:, :n]
    for f in free:
        v = np.zeros(n, np.uint8)
        v[f] = 1
        for ri, pc in enumerate(pivots):
            if red[ri, f]:
                v[pc] = 1
        kernel.append(v)
    return m[:, n:], np.array(kernel, np.uint8).reshape(len(kernel), n), pivots


class LightsOutOracle:
    def __init__(self, dim: int = 7):
        self.dim = dim
        self.n = dim * dim
        a = toggle_matrix(dim)
        pinv, kernel, pivots = gf2_solve_basis(a)
        self.a = a
        self.pinv = pinv
        self.kernel = kernel
        self.rank = len(pivots)

    def optimal_costs(self, states: np.ndarray) -> np.ndarray:
        """(B, n) uint8 states in {0,1} -> (B,) exact optimal press counts.
        Unsolvable states (rank-deficient boards only) get -1."""
        s = np.asarray(states, np.uint8).reshape(-1, self.n)
        x = (s.astype(np.int64) @ self.pinv.T.astype(np.int64)) % 2
        solvable = ((x.astype(np.int64) @ self.a.T.astype(np.int64)) % 2
                    == s).all(axis=1)
        best = x.sum(axis=1)
        if len(self.kernel):
            for bits in range(1, 1 << len(self.kernel)):
                kv = np.zeros(self.n, np.uint8)
                for j in range(len(self.kernel)):
                    if bits >> j & 1:
                        kv ^= self.kernel[j]
                best = np.minimum(best, (x ^ kv).sum(axis=1))
        return np.where(solvable, best, -1).astype(np.int64)
