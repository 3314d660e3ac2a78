"""ChebPEP: Chebyshev interpolant of a NEP on [a, b]
(reference ``src/types_cheb_pep.jl``).

The interpolant is stored as an SPMF whose term functions are the Chebyshev
polynomials T_j scaled to [a, b].  Matrix evaluation uses the three-term
recurrence (instead of the reference's cos(k*acos(x)) route, which needs a
matrix acos) — exact for polynomials and traceable on Jordan-chain inputs.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.sparse import make_term_bank
from .spmf import AbstractSPMF, SPMF_NEP

__all__ = ["ChebPEP", "chebyshev_nodes", "chebyshev_compute_coefficients", "cheb_fun"]


def chebyshev_nodes(a, b, k):
    """k Chebyshev points scaled to [a, b] (reference ``types_cheb_pep.jl:5-8``)."""
    return (a + b) / 2 + (b - a) / 2 * np.cos((2 * np.arange(1, k + 1) - 1) * np.pi / (2 * k))


def cheb_fun(a, b, j):
    """Matrix function S -> T_j(2 (S - aI)/(b-a) - I) via the three-term
    recurrence (valid for scalars-as-1x1 and defective matrices)."""

    def f(S):
        S = jnp.asarray(S)
        I = jnp.eye(S.shape[-1], dtype=S.dtype)
        X = 2.0 * (S - a * I) / (b - a) - I
        if j == 0:
            return I
        Tkm1, Tk = I, X
        for _ in range(j - 1):
            Tkm1, Tk = Tk, 2.0 * X @ Tk - Tkm1
        return Tk

    return f


def chebyshev_compute_coefficients(a, b, Fk, xk):
    """Chebyshev coefficients of matrix samples Fk at the Chebyshev points xk
    (Mason & Handscomb ch. 8; reference ``types_cheb_pep.jl:93-114``)."""
    k = len(Fk)
    # Tmat[i, :] = T_i(x) * 2/k at each node (first row halved)
    Tmat = np.zeros((k, k))
    xs = np.asarray(xk)
    t = 2 * (xs - a) / (b - a) - 1
    theta = np.arccos(np.clip(t, -1, 1))
    for i in range(k):
        Tmat[i, :] = np.cos(i * theta) * 2 / k
    Tmat[0, :] *= 0.5
    return [sum(Fk[j] * Tmat[i, j] for j in range(k)) for i in range(k)]


class ChebPEP(AbstractSPMF):
    """Chebyshev-basis interpolant of ``orgnep`` with k interpolation points on
    [a, b] (reference ctor ``types_cheb_pep.jl:194-218``)."""

    def __init__(self, orgnep, k: int = 9, a: float = -1.0, b: float = 1.0):
        xk = chebyshev_nodes(a, b, k)
        Fk = []
        for x in xk:
            M = orgnep.Mder(x) if hasattr(orgnep, "Mder") else orgnep(x)
            if not isinstance(M, (np.ndarray, jnp.ndarray)):
                M = M.to_dense()
            Fk.append(np.asarray(M))
        Ck = chebyshev_compute_coefficients(a, b, Fk, xk)
        fv = [cheb_fun(a, b, j) for j in range(k)]
        self.spmf = SPMF_NEP(Ck, fv)
        self.a = float(a)
        self.b = float(b)
        self.k = k
        self.n = self.spmf.n
        self.orgnep = orgnep

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
