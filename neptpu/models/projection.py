"""Projected NEPs  N(lam) = W^H M(lam) V  (reference ``NEPTypes.jl:591-821``).

For an SPMF, the projection is again an SPMF with small dense operands
``B_i = W^H A_i V``; the B-memory is preallocated (default maxsize 201) and
``expand_projectmatrices`` performs the rank-1 border update that
Jacobi-Davidson/NLAR do once per outer iteration.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.sparse import DenseTermBank
from .spmf import AbstractSPMF, SPMF_NEP

__all__ = ["Proj_NEP", "Proj_SPMF_NEP", "create_proj_NEP"]


def _apply_A(A, X):
    """A @ X for dense jnp array or CSR operand."""
    if isinstance(A, jnp.ndarray):
        return np.asarray(A) @ X
    return np.asarray(A.matmat(jnp.asarray(X)))


class Proj_NEP(AbstractSPMF):
    pass


class Proj_SPMF_NEP(Proj_NEP):
    def __init__(self, orgnep: AbstractSPMF, maxsize: int = None, dtype=np.complex128):
        if maxsize is None:
            maxsize = min(orgnep.n, 201)
        self.orgnep = orgnep
        self.orgnep_Av = orgnep.get_Av()
        self.orgnep_fv = orgnep.get_fv()
        m = len(self.orgnep_Av)
        self.B_mem = [np.zeros((maxsize, maxsize), dtype=dtype) for _ in range(m)]
        self.maxsize = maxsize
        self.k = 0
        self.W = np.zeros((orgnep.n, 0), dtype=dtype)
        self.V = np.zeros((orgnep.n, 0), dtype=dtype)
        self.nep_proj = None

    # -- projection updates ------------------------------------------------
    def _rebuild(self):
        k = self.k
        if k == 0:
            self.nep_proj = None
            self.n = 0
            return
        B = np.stack([Bm[:k, :k] for Bm in self.B_mem])
        bank = DenseTermBank(jnp.asarray(B))
        self.nep_proj = SPMF_NEP([None] * len(self.orgnep_fv), self.orgnep_fv, bank=bank)
        self.n = k

    def set_projectmatrices(self, W, V):
        W = np.asarray(W)
        V = np.asarray(V)
        k = V.shape[1]
        assert k <= self.maxsize, "projection exceeds preallocated memory"
        self.W = W.astype(self.B_mem[0].dtype)
        self.V = V.astype(self.B_mem[0].dtype)
        for i, A in enumerate(self.orgnep_Av):
            self.B_mem[i][:k, :k] = self.W.conj().T @ _apply_A(A, self.V)
        self.k = k
        self._rebuild()

    def expand_projectmatrices(self, Wnew, Vnew):
        """Rank-1 border update: Wnew/Vnew contain the old basis plus one new
        column each (reference ``NEPTypes.jl:773-790``)."""
        Wnew = np.asarray(Wnew)
        Vnew = np.asarray(Vnew)
        k = Vnew.shape[1] - 1
        assert k + 1 <= self.maxsize, "projection exceeds preallocated memory"
        w = Wnew[:, -1]
        v = Vnew[:, -1]
        for i, A in enumerate(self.orgnep_Av):
            Avv = _apply_A(A, v[:, None])[:, 0]
            self.B_mem[i][:k, k] = Wnew[:, :k].conj().T @ Avv
            self.B_mem[i][k, : k + 1] = w.conj() @ _apply_A(A, Vnew[:, : k + 1])
        self.W = Wnew.astype(self.B_mem[0].dtype)
        self.V = Vnew.astype(self.B_mem[0].dtype)
        self.k = k + 1
        self._rebuild()

    # -- delegate compute functions ---------------------------------------
    @property
    def issparse(self):
        return False

    def get_Av(self):
        return self.nep_proj.get_Av()

    def get_fv(self):
        return self.orgnep_fv

    def Mder(self, lam, der: int = 0):
        return self.nep_proj.Mder(lam, der)

    def Mder_dense(self, lam, der: int = 0):
        return self.nep_proj.Mder_dense(lam, der)

    def Mlincomb(self, lam, V, a=None, startder: int = 0):
        return self.nep_proj.Mlincomb(lam, V, a=a, startder=startder)

    def MM(self, S, V):
        return self.nep_proj.MM(S, V)


def create_proj_NEP(orgnep, maxsize: int = None, dtype=np.complex128):
    if isinstance(orgnep, AbstractSPMF):
        return Proj_SPMF_NEP(orgnep, maxsize, dtype)
    raise NotImplementedError(
        "create_proj_NEP requires an AbstractSPMF (like the reference's ProjectableNEP)"
    )
