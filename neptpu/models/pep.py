"""Polynomial eigenvalue problem  M(lam) = sum_d A_d lam^d.

Closed-form monomial derivative weights (reference ``src/types_poly.jl:31-98``
and the fast Mlincomb ``NEPTypes.jl:1016-1045``): compute_Mlincomb is a small
coefficient GEMM + one fused multi-term SpMV over the TermBank.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..ops.sparse import make_term_bank
from .spmf import AbstractSPMF

__all__ = ["PEP", "interpolate_pep"]


def _falling(d: int, j: int) -> float:
    """d!/(d-j)! (0 when j > d)."""
    if j > d:
        return 0.0
    return float(math.factorial(d) // math.factorial(d - j))


class PEP(AbstractSPMF):
    def __init__(self, A: Sequence, dtype=None, bank=None):
        if bank is None:
            bank = make_term_bank(A, dtype=dtype)
        self.bank = bank
        self.n = bank.n
        self.degree = bank.nterms - 1

    @property
    def issparse(self):
        return self.bank.is_sparse

    def get_Av(self):
        b = self.bank
        if b.is_sparse:
            return [b.term(i) for i in range(b.nterms)]
        return [b.A[i] for i in range(b.nterms)]

    def get_fv(self):
        from ..ops import matfun

        def mono(d):
            def f(S):
                S = jnp.asarray(S)
                if d == 0:
                    return jnp.eye(S.shape[-1], dtype=S.dtype)
                return jnp.linalg.matrix_power(S, d)

            def derivs(lam, k):
                import numpy as np

                out = np.zeros(k, dtype=complex)
                for j in range(min(k, d + 1)):
                    out[j] = _falling(d, j) * lam ** (d - j)
                return out

            return matfun.with_derivs(f, derivs)

        return [mono(d) for d in range(self.degree + 1)]

    # -- compute functions -------------------------------------------------
    def _coeffs(self, lam, k: int, a, startder: int):
        """C[d, j] = a_j * d!/(d-j-sd)! * lam^(d-j-sd)."""
        lam = jnp.asarray(lam)
        a = jnp.asarray(a)
        dt = jnp.result_type(lam, a, self.bank.dtype)
        lam = lam.astype(dt)
        rows = []
        for d in range(self.degree + 1):
            cols = []
            for j in range(k):
                e = d - j - startder
                c = _falling(d, j + startder)
                if e < 0 or c == 0.0:
                    cols.append(jnp.zeros((), dtype=dt))
                else:
                    cols.append(a[j].astype(dt) * c * lam**e)
            rows.append(jnp.stack(cols))
        return jnp.stack(rows)

    def Mder(self, lam, der: int = 0):
        w = self._coeffs(lam, 1, jnp.ones((1,)), der)[:, 0]
        return self.bank.combine(w)

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
        C = self._coeffs(lam, k, a, startder)  # (deg+1, k)
        # promote BOTH ways: real-lam coefficient tables must not truncate a
        # complex V (caught by the NEP-class dtype sweep)
        dt = jnp.result_type(V.dtype, C.dtype)
        W = V.astype(dt) @ C.astype(dt).T
        return self.bank.lincomb_apply(W)

    def MM(self, S, V):
        """sum_d A_d V S^d via the power recurrence P_{d} = P_{d-1} S."""
        S = jnp.asarray(S)
        V = jnp.asarray(V)
        dt = jnp.result_type(S, V, self.bank.dtype)
        S = S.astype(dt)
        k = S.shape[0]
        P = jnp.eye(k, dtype=dt)
        F = [P]
        for _ in range(self.degree):
            P = P @ S
            F.append(P)
        return self.bank.mm_apply(V, jnp.stack(F))


def interpolate_pep(nep, points):
    """Interpolate any NEP at ``points`` into a PEP of degree len(points)-1
    (reference ``interpolate``, ``src/types_poly.jl:101-167``): solve the
    Vandermonde system entrywise over the stacked Mder(lam_j) evaluations."""
    import numpy.polynomial.polynomial as _  # noqa: F401

    pts = np.asarray(points)
    d = len(pts) - 1
    Ms = [np.asarray(nep.Mder_dense(p) if hasattr(nep, "Mder_dense") else nep.Mder(p)) for p in pts]
    V = np.vander(pts, d + 1, increasing=True)  # (d+1, d+1)
    stacked = np.stack([M.reshape(-1) for M in Ms])  # (d+1, n*n)
    coeffs = np.linalg.solve(V, stacked)  # (d+1, n*n)
    n = Ms[0].shape[0]
    A = [coeffs[i].reshape(n, n) for i in range(d + 1)]
    if not any(np.iscomplexobj(a) and np.abs(a.imag).max() > 0 for a in A):
        A = [a.real for a in A]
    return PEP(A)
