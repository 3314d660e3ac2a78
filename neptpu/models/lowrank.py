"""Low-rank factorized SPMF: each term A_i = L_i U_i^H
(reference ``src/low_rank_nep.jl``).  The rank metadata ``r`` is consumed by
NLEIGS/CORK-LR to shrink linearization block length from n to r."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .spmf import AbstractSPMF, SPMF_NEP

__all__ = ["LowRankFactorizedNEP"]


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
