"""DerSPMF: SPMF with a precomputed derivative table at a fixed shift
(reference ``NEPTypes.jl:1055-1160``): 2m+2 derivatives of each f_i at sigma
via the bidiagonal-S matrix-function trick, so compute_Mlincomb at sigma is a
pure GEMM + fused SpMV — the shape IAR wants."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import matfun
from .spmf import AbstractSPMF

__all__ = ["DerSPMF"]


class DerSPMF(AbstractSPMF):
    def __init__(self, spmf: AbstractSPMF, sigma, m: int):
        self.spmf = spmf
        self.sigma = complex(sigma)
        self.n = spmf.n
        k = 2 * m + 2
        # fD[j, i] = f_i^{(j)}(sigma)
        fD = [matfun.fun_derivatives(f, jnp.asarray(self.sigma), k) for f in spmf.get_fv()]
        self.fD = jnp.stack(fD, axis=1)  # (2m+2, p)

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

    def MM(self, S, V):
        return self.spmf.MM(S, V)

    def Mlincomb(self, lam, V, a=None, startder: int = 0):
        if complex(np.asarray(lam)) != self.sigma or startder != 0:
            return self.spmf.Mlincomb(lam, V, a=a, startder=startder)
        V = jnp.asarray(V)
        if V.ndim == 1:
            V = V[:, None]
        k = V.shape[1]
        if k > self.fD.shape[0]:
            return self.spmf.Mlincomb(lam, V, a=a, startder=startder)
        if a is None:
            a = jnp.ones((k,))
        a = jnp.asarray(a)
        # W[:, i] = V @ (a * fD[:k, i]) -> one GEMM, then the fused bank apply
        W = V @ (a[:, None] * self.fD[:k, :])
        if hasattr(self.spmf, "bank"):
            return self.spmf.bank.lincomb_apply(W)
        Av = self.get_Av()
        z = None
        for j, A in enumerate(Av):
            t = (A @ W[:, j]) if isinstance(A, jnp.ndarray) else A.matvec(W[:, j])
            z = t if z is None else z + t
        return z
