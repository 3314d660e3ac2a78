"""Low-rank factorized SPMF: each term A_i = L_i U_i^H
(reference ``src/low_rank_nep.jl``).  The rank metadata ``r`` is consumed by
NLEIGS/CORK-LR to shrink linearization block length from n to r."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .spmf import AbstractSPMF, SPMF_NEP

__all__ = ["LowRankFactorizedNEP", "LowRankMatrixAndFunction",
           "low_rank_factors"]


def low_rank_factors(A, tol=None):
    """Compact factors ``A = L @ U^H`` of a (sparse) matrix whose nonzeros
    live in a small bounding box (reference ``rk_nep.jl:71-98`` uses a
    bounding-box LU + compaction; here a bounding-box SVD gives the same
    compact factors without the unpivoted-LU caveat the reference TODOs)."""
    import scipy.sparse as sp

    if sp.issparse(A):
        Ac = A.tocoo()
        n, m = Ac.shape
        if Ac.nnz == 0:
            return np.zeros((n, 0)), np.zeros((m, 0))
        # compact onto the unique nonzero rows/cols (tighter than the
        # reference's contiguous bounding box — exact for scattered supports)
        urows = np.unique(Ac.row)
        ucols = np.unique(Ac.col)
        B = np.asarray(Ac.tocsr()[urows][:, ucols].toarray())
    else:
        B = np.asarray(A)
        n, m = B.shape
        urows = np.arange(n)
        ucols = np.arange(m)
    Us, s, Vh = np.linalg.svd(B, full_matrices=False)
    if tol is None:
        tol = max(B.shape) * np.finfo(s.dtype).eps * (s[0] if s.size else 0.0)
    r = int(np.sum(s > tol))
    L = np.zeros((n, r), dtype=B.dtype)
    U = np.zeros((m, r), dtype=B.dtype)
    L[urows] = Us[:, :r] * s[:r]
    U[ucols] = Vh[:r].conj().T
    return L, U


class LowRankMatrixAndFunction:
    """One low-rank term ``(A = L U^H, f)`` (reference ``rk_nep.jl:43-57``).

    Either pass precomputed ``L``/``U`` factors, or just ``A`` and the
    compact factorization is computed from its nonzero bounding box."""

    def __init__(self, A, f, L=None, U=None):
        if L is None or U is None:
            L, U = low_rank_factors(A)
        self.A = A
        self.L = L
        self.U = U
        self.f = f


def _dense(A):
    import scipy.sparse as sp

    if sp.issparse(A):
        return A.toarray()
    return np.asarray(A)


class LowRankFactorizedNEP(AbstractSPMF):
    def __init__(self, L, U, f, A=None):
        L = [_dense(Li) for Li in L]
        U = [_dense(Ui) for Ui in U]
        if A is None:
            A = [Li @ Ui.conj().T for Li, Ui in zip(L, U)]
        self.L = [jnp.asarray(Li) for Li in L]
        self.U = [jnp.asarray(Ui) for Ui in U]
        self.r = sum(Ui.shape[1] for Ui in U)
        self.spmf = SPMF_NEP(A, list(f))
        self.n = self.spmf.n

    @classmethod
    def from_amf(cls, amf):
        """Build from a list of :class:`LowRankMatrixAndFunction` (the
        reference's vector constructor, ``rk_nep.jl:59-69``)."""
        def term_matrix(m):
            if m.A is None or getattr(m.A, "size", 0) == 0:
                return np.asarray(_dense(m.L)) @ np.asarray(_dense(m.U)).conj().T
            return m.A

        return cls([m.L for m in amf], [m.U for m in amf],
                   [m.f for m in amf], A=[term_matrix(m) for m in amf])

    @property
    def bank(self):
        return self.spmf.bank

    @property
    def issparse(self):
        return self.spmf.issparse

    def get_Av(self):
        return self.spmf.get_Av()

    def get_fv(self):
        return self.spmf.get_fv()

    def Mder(self, lam, der: int = 0):
        return self.spmf.Mder(lam, der)

    def Mder_dense(self, lam, der: int = 0):
        return self.spmf.Mder_dense(lam, der)

    def Mlincomb(self, lam, V, a=None, startder: int = 0):
        return self.spmf.Mlincomb(lam, V, a=a, startder=startder)

    def MM(self, S, V):
        return self.spmf.MM(S, V)
