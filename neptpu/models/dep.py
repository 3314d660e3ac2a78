"""Delay eigenvalue problem  M(lam) = -lam*I + sum_i A_i exp(-tau_i lam).

Fast paths avoid matrix functions entirely: derivative weights are the closed
forms ``(-tau_i)^j exp(-tau_i lam)`` (reference ``NEPTypes.jl:427-513`` for the
type and ``:940-968`` for the fast Mlincomb), so compute_Mlincomb is a tiny
coefficient GEMM followed by one fused multi-term SpMV.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..ops import matfun
from ..ops.sparse import make_term_bank
from .spmf import AbstractSPMF

__all__ = ["DEP"]


class DEP(AbstractSPMF):
    def __init__(self, A: Sequence, tauv=(0.0, 1.0), dtype=None, bank=None):
        if bank is None:
            bank = make_term_bank(A, dtype=dtype)
        self.bank = bank
        if np.iscomplexobj(np.asarray(tauv)):
            raise ValueError("The delays need to be real.")
        tau = np.asarray(tauv, dtype=float)
        if tau.shape[0] != bank.nterms:
            raise ValueError("one delay per matrix required")
        self.tauv = jnp.asarray(tau)
        self.n = bank.n

    @property
    def issparse(self):
        return self.bank.is_sparse

    # -- SPMF view (reference get_Av/get_fv prepend the -lam*I term) -------
    def get_Av(self):
        b = self.bank
        if b.is_sparse:
            import scipy.sparse as sp

            from ..ops.sparse import CSR

            eye = CSR.from_scipy(sp.eye(self.n, format="csr"), dtype=b.dtype)
            return [eye] + [b.term(i) for i in range(b.nterms)]
        eye = jnp.eye(self.n, dtype=b.dtype)
        return [eye] + [b.A[i] for i in range(b.nterms)]

    def get_fv(self):
        fv = [lambda S: -S]
        for tau in np.asarray(self.tauv):
            if tau == 0:
                fv.append(matfun.eye_like)
            else:
                fv.append(lambda S, t=float(tau): matfun.expm(-t * S))
        return fv

    # -- compute functions -------------------------------------------------
    def _exp_coeffs(self, lam, k: int, a, startder: int):
        """C[i, j] = a_j * (-tau_i)^(j+startder) * exp(-tau_i*lam)."""
        lam = jnp.asarray(lam)
        a = jnp.asarray(a)
        dt = jnp.result_type(lam, a, self.bank.dtype)
        tau = self.tauv.astype(dt)
        j = jnp.arange(startder, startder + k)
        pw = jnp.where(
            (tau[:, None] == 0) & (j[None, :] == 0),
            jnp.ones((), dt),
            (-tau[:, None]) ** j[None, :],
        )
        return a[None, :].astype(dt) * pw * jnp.exp(-tau[:, None] * lam.astype(dt))

    def Mder(self, lam, der: int = 0):
        lam = jnp.asarray(lam)
        w = self._exp_coeffs(lam, 1, jnp.ones((1,)), der)[:, 0]
        M = self.bank.combine(w)
        dt = jnp.result_type(lam, self.bank.dtype)
        if isinstance(M, jnp.ndarray):
            M = M.astype(dt)
            if der == 0:
                M = M - lam * jnp.eye(self.n, dtype=dt)
            elif der == 1:
                M = M - jnp.eye(self.n, dtype=dt)
            return M
        # CSR case: the identity may be outside the shared pattern -> densify
        # only when the -lam*I/-I correction applies; callers wanting sparse
        # assembly use Mder_csr on patterns that include the diagonal.
        if der <= 1:
            Md = M.to_dense().astype(dt)
            eye = jnp.eye(self.n, dtype=dt)
            return Md - (lam * eye if der == 0 else eye)
        return M

    def Mder_dense(self, lam, der: int = 0):
        M = self.Mder(lam, der)
        return M if isinstance(M, jnp.ndarray) else M.to_dense()

    def Mlincomb(self, lam, V, a=None, startder: int = 0):
        V = jnp.asarray(V)
        if V.ndim == 1:
            V = V[:, None]
        k = V.shape[1]
        if a is None:
            a = jnp.ones((k,))
        a = jnp.asarray(a)
        lam = jnp.asarray(lam)
        C = self._exp_coeffs(lam, k, a, startder)  # (m, k)
        wdt = jnp.promote_types(V.dtype, C.dtype)
        W = V.astype(wdt) @ C.T.astype(wdt)  # (n, m)
        y = self.bank.lincomb_apply(W)
        # the -lam*I term contributes only at derivative orders 0 and 1
        if startder == 0:
            y = y - a[0] * lam * V[:, 0]
            if k > 1:
                y = y - a[1] * V[:, 1]
        elif startder == 1:
            y = y - a[0] * V[:, 0]
        return y

    def MM(self, S, V):
        S = jnp.asarray(S)
        V = jnp.asarray(V)
        dt = jnp.result_type(S, V, self.bank.dtype)
        F = jnp.stack(
            [matfun.expm(-float(t) * S.astype(dt)) for t in np.asarray(self.tauv)]
        )
        return self.bank.mm_apply(V, F) - V.astype(dt) @ S.astype(dt)
