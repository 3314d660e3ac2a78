"""RKNEP classification for NLEIGS (reference ``src/rk_helper/rk_nep.jl``):
detects SPMF-ness, a PEP + SPMF split (``SPMFSumNEP(PEP, S)``), and low-rank
structure of the nonlinear part."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...models.lowrank import LowRankFactorizedNEP
from ...models.pep import PEP
from ...models.spmf import AbstractSPMF
from ...models.sumnep import SPMFSumNEP

__all__ = ["RKNEP", "get_rk_nep"]


class RKNEP:
    def __init__(self, nep, spmf=False, p=0, q=0, is_low_rank=False, r=0, L=None, U=None):
        self.nep = nep
        self.spmf = spmf
        self.p = p
        self.q = q
        self.is_low_rank = is_low_rank
        self.r = r
        self.L = L or []
        self.U = U or []
        if is_low_rank:
            # compacted low-rank factors (reference ``rk_nep.jl:102-153``
            # BBCC/LL): UU drives the r-sized tail recurrences, LL the
            # matrix-free application of the tail divided differences
            # D_nb = hcat_i(sgdd[p+1+i, nb] * L_i) — kept as ONE n x r
            # matrix plus per-degree scalar weights, so memory is O(n r)
            # independent of the number of Leja degrees.
            self.UU = np.hstack([np.asarray(u) for u in self.U])
            self.LL = np.hstack([np.asarray(l) for l in self.L])
            self._ri = np.array([np.asarray(l).shape[1] for l in self.L])
        else:
            self.UU = None
            self.LL = None
        self._Av = nep.get_Av() if spmf else None

    def apply_tail(self, sgdd, nb, z):
        """Matrix-free tail divided difference: D_nb @ z for nb > p, using
        the compacted LL and the per-term scalar weights (reference
        ``method_nleigs.jl:507-511``); z is the r-sized tail block."""
        w = np.repeat(np.asarray(sgdd)[self.p + 1: self.p + 1 + self.q, nb],
                      self._ri)
        return self.LL @ (w * np.asarray(z))

    def apply_weighted(self, coeffs, x):
        """sum_i coeffs[i] * (Av[i] @ x) over the full get_Av list."""
        x = jnp.asarray(x)
        z = None
        for c, A in zip(np.asarray(coeffs), self._Av):
            t = (A @ x) if isinstance(A, jnp.ndarray) else A.matvec(x)
            t = complex(c) * t
            z = t if z is None else z + t
        return z

    def construct_D(self, nb, sgdd):
        """Explicit generalized divided difference (reference ``constructD``):
        full n x n for nb <= p; for the low-rank tail (nb > p) the compact
        n x r matrix hcat_i(sgdd[p+1+i, nb] * L_i)."""
        n = self.nep.n
        if self.is_low_rank and nb > self.p:
            cols = []
            for i in range(self.q):
                cols.append(complex(sgdd[self.p + 1 + i, nb]) * np.asarray(self.L[i]))
            return np.hstack(cols)
        D = None
        for i, A in enumerate(self._Av):
            Ad = A if isinstance(A, jnp.ndarray) else A.to_dense()
            t = complex(sgdd[i, nb]) * Ad
            D = t if D is None else D + t
        return D


def get_rk_nep(nep):
    if not isinstance(nep, AbstractSPMF):
        return RKNEP(nep, spmf=False)
    Av = nep.get_Av()
    if isinstance(nep, PEP):
        return RKNEP(nep, spmf=True, p=len(Av) - 1, q=0)
    if isinstance(nep, SPMFSumNEP) and isinstance(nep.nep1, PEP):
        p = len(nep.nep1.get_Av()) - 1
        q = len(nep.nep2.get_Av())
        if q > 0 and isinstance(nep.nep2, LowRankFactorizedNEP):
            return RKNEP(nep, spmf=True, p=p, q=q, is_low_rank=True,
                         r=nep.nep2.r, L=list(nep.nep2.L), U=list(nep.nep2.U))
        return RKNEP(nep, spmf=True, p=p, q=q)
    return RKNEP(nep, spmf=True, p=-1, q=len(Av))
