"""Effenberger deflation (reference ``src/nep_deflation.jl``; Effenberger
2013): extend the NEP with an invariant pair (S0, V0) into

    [ M(lam)   U(lam) ]        U(lam) = sum_i M^(i)(lam) V0 (lam I - S0)^{-(i+1)}-style
    [ X^H        0    ]        terms via binomial expansion

so converged pairs never reconverge.  Three representations, matching the
reference modes:

* ``:SPMF``    — diagonalize S0 and extend to a low-rank SPMF sum
  (``create_spmf_dnep``); the result is again an AbstractSPMF.
* ``:Generic`` — binomial-expansion compute functions.
* ``:MM``      — delegate everything through compute_MM on a bordered pencil.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..core.nep import NEP, compute_Mder, compute_Mlincomb, compute_MM, mder_from_mm, mlincomb_from_mm
from ..ops import matfun
from .lowrank import LowRankFactorizedNEP
from .spmf import AbstractSPMF, SPMF_NEP
from .sumnep import SumNEP

__all__ = [
    "DeflatedNEP",
    "DeflatedNEPMM",
    "DeflatedGenericNEP",
    "DeflatedSPMF",
    "deflate_eigpair",
    "get_deflated_eigpairs",
    "deflated_nep_compute_Q",
    "normalize_schur_pair",
]


def normalize_schur_pair(S, V):
    """Make V orthonormal: V = QR, S <- R S R^{-1}
    (reference ``normalize_schur_pair!``)."""
    S = np.asarray(S, dtype=complex)
    V = np.asarray(V, dtype=complex)
    if V.shape[1] > V.shape[0]:
        import warnings

        warnings.warn("Cannot normalize short and skinny V-matrices.")
        return S, V
    Q, R = np.linalg.qr(V)
    return R @ S @ np.linalg.inv(R), Q


class _DeflatedBase(NEP):
    def __init__(self, orgnep, S0, V0):
        self.orgnep = orgnep
        self.S0 = np.asarray(S0, dtype=complex)
        self.V0 = np.asarray(V0, dtype=complex)
        self.n = orgnep.n + self.S0.shape[0]

    @property
    def n0(self):
        return self.orgnep.n

    @property
    def p(self):
        return self.S0.shape[0]


class DeflatedNEPMM(_DeflatedBase):
    """All compute functions through compute_MM on the bordered pencil
    (reference ``nep_deflation.jl:183-202``)."""

    def MM(self, S, V):
        S = np.asarray(S)
        V = np.asarray(V)
        n0 = self.n0
        p0 = self.p
        p = S.shape[0]
        V1 = V[:n0, :]
        V2 = V[n0:, :]
        Stilde = np.block([
            [self.S0, V2],
            [np.zeros((p, p0), dtype=complex), S],
        ])
        Vtilde = np.hstack([self.V0, V1])
        R = np.asarray(compute_MM(self.orgnep, jnp.asarray(Stilde), jnp.asarray(Vtilde)))
        return jnp.asarray(np.vstack([R[:n0, p0:], self.V0.conj().T @ V1]))

    def Mlincomb(self, lam, V, a=None, startder: int = 0):
        return mlincomb_from_mm(self, lam, V, a, startder)

    def Mder(self, lam, der: int = 0):
        return mder_from_mm(self, lam, der)

    Mder_dense = Mder


def deflated_nep_compute_Q(nep: _DeflatedBase, lam, der: int):
    """U^(der)(lam) block (reference ``nep_deflation.jl:149-170``)."""
    X = nep.V0
    S = nep.S0
    n0 = nep.n0
    p = nep.p
    lam = complex(np.asarray(lam))
    A = lam * np.eye(p) - S
    Q = np.zeros((n0, p), dtype=complex)
    Vnew = X
    for i in range(der, -1, -1):
        Vnew = np.linalg.solve(A.T, Vnew.T).T  # Vnew / (lam I - S)
        factor = ((-1.0) ** (der - i)) * (math.factorial(der) / math.factorial(i))
        for j in range(p):
            Q[:, j] += np.asarray(
                compute_Mlincomb(nep.orgnep, lam, Vnew[:, j][:, None],
                                 jnp.asarray([factor]), startder=i)
            )
    return Q


class DeflatedGenericNEP(_DeflatedBase):
    """Binomial-expansion derivatives (reference ``nep_deflation.jl:65-146``)."""

    def Mlincomb(self, lam, V, a=None, startder: int = 0):
        if startder != 0:
            # fall back via Mder for shifted-derivative calls
            from ..core.nep import mlincomb_from_mder

            return mlincomb_from_mder(self, lam, V, a, startder)
        V = np.asarray(V)
        if V.ndim == 1:
            V = V[:, None]
        k = V.shape[1]
        if a is None:
            a = np.ones(k)
        a = np.asarray(a)
        X = self.V0
        S = self.S0
        n0 = self.n0
        p = self.p
        lam_c = complex(np.asarray(lam))
        A = lam_c * np.eye(p) - S
        Xhat = np.linalg.solve(A.T, X.T).T  # X / (lam I - S)
        # precompute Q[i][:, j] = (lam I - S)^{-(i-j)} V2[:, i]
        Qs = []
        for i in range(k):
            QQ = np.zeros((p, k), dtype=complex)
            QQ[:, i] = V[n0:, i]
            for j in range(i - 1, -1, -1):
                QQ[:, j] = np.linalg.solve(A, QQ[:, j + 1])
            Qs.append(QQ)
        Z = np.zeros((n0, k), dtype=complex)
        for j in range(k):
            z = np.zeros(n0, dtype=complex)
            for i in range(j, k):
                factor = ((-1.0) ** (i - j)) * (a[i] * math.factorial(i) / math.factorial(j))
                z += factor * (Xhat @ Qs[i][:, j])
            Z[:, j] = z
        Vnew = V[:n0, :] * a[None, :] + Z
        z_top = np.asarray(compute_Mlincomb(self.orgnep, lam, jnp.asarray(Vnew)))
        z_bottom = X.conj().T @ V[:n0, 0] * a[0]
        return jnp.asarray(np.concatenate([z_top, z_bottom]))

    def Mder(self, lam, der: int = 0):
        n0 = self.n0
        p = self.p
        Q = deflated_nep_compute_Q(self, lam, der)
        M0 = compute_Mder(self.orgnep, lam, der)
        M0 = np.asarray(M0 if isinstance(M0, jnp.ndarray) else M0.to_dense())
        bottom_left = self.V0.conj().T if der == 0 else np.zeros((p, n0), dtype=complex)
        out = np.block([
            [M0, Q],
            [bottom_left, np.zeros((p, p), dtype=complex)],
        ])
        return jnp.asarray(out)

    Mder_dense = Mder

    def MM(self, S, V):
        return DeflatedNEPMM.MM(self, S, V)


class DeflatedSPMF(AbstractSPMF, _DeflatedBase):
    """SPMF-form deflation via diagonalization of S0
    (reference ``create_spmf_dnep``, ``nep_deflation.jl:210-269``)."""

    def __init__(self, orgnep, spmf, S0, V0):
        _DeflatedBase.__init__(self, orgnep, S0, V0)
        self.spmf = spmf

    @property
    def bank(self):
        return getattr(self.spmf, "bank", None)

    def get_Av(self):
        return self.spmf.get_Av()

    def get_fv(self):
        return self.spmf.get_fv()

    def Mder(self, lam, der: int = 0):
        return self.spmf.Mder(lam, der)

    def Mder_dense(self, lam, der: int = 0):
        M = self.spmf.Mder(lam, der)
        return M if isinstance(M, jnp.ndarray) else M.to_dense()

    def Mlincomb(self, lam, V, a=None, startder: int = 0):
        return self.spmf.Mlincomb(lam, V, a=a, startder=startder)

    def MM(self, S, V):
        return self.spmf.MM(S, V)


DeflatedNEP = (_DeflatedBase,)


def create_spmf_dnep(nep: AbstractSPMF, S0, V0):
    """Extend an SPMF with the deflation terms as a low-rank SPMF sum."""
    Av_org = nep.get_Av()
    fv_org = nep.get_fv()
    m = len(fv_org)
    S0 = np.asarray(S0, dtype=complex)
    V0 = np.asarray(V0, dtype=complex)
    p = V0.shape[1]
    n0 = nep.n

    def _dense(A):
        return np.asarray(A if isinstance(A, (np.ndarray, jnp.ndarray)) else A.to_dense())

    # spmf1: the original terms padded to size n0+p
    A1 = []
    for A in Av_org:
        Ad = _dense(A)
        P = np.zeros((n0 + p, n0 + p), dtype=Ad.dtype)
        P[:n0, :n0] = Ad
        A1.append(P)
    spmf1 = SPMF_NEP(A1, list(fv_org))

    # spmf2: the deflation terms (diagonalize S0)
    lam_d, Xd = np.linalg.eig(S0)
    L2, U2, fv2 = [], [], []
    for i in range(p):
        y = V0 @ Xd[:, i]
        ei = np.zeros(p)
        ei[i] = 1.0
        x = np.linalg.solve(Xd.T, ei)  # row ei' / X  ->  solve X^T x = ei
        for r in range(m):
            Ar = Av_org[r]
            Ay = (np.asarray(Ar @ jnp.asarray(y)) if isinstance(Ar, jnp.ndarray)
                  else np.asarray(Ar.matvec(jnp.asarray(y))))
            L2.append(np.concatenate([Ay, np.zeros(p)])[:, None])
            U2.append(np.concatenate([np.zeros(n0), x.conj()])[:, None])
            li = complex(lam_d[i])
            fv2.append(
                lambda S, li=li, fr=fv_org[r]: jnp.linalg.solve(
                    jnp.asarray(S) - li * matfun.eye_like(S), fr(S)
                ) if jnp.asarray(S).ndim >= 2 else fr(S) / (S - li)
            )
    L2.append(np.vstack([np.zeros((n0, p)), np.eye(p)]))
    U2.append(np.vstack([V0, np.zeros((p, p))]))
    fv2.append(matfun.eye_like)
    spmf2 = LowRankFactorizedNEP(L2, U2, fv2)
    return SumNEP(spmf1, spmf2)


def _verify_mode(nep, mode):
    if mode == ":Auto":
        if isinstance(nep, DeflatedSPMF):
            return ":SPMF"
        if isinstance(nep, DeflatedNEPMM):
            return ":MM"
        if isinstance(nep, DeflatedGenericNEP):
            return ":Generic"
        return ":SPMF" if isinstance(nep, AbstractSPMF) else ":Generic"
    return mode


def _make(orgnep, S1, V1, mode):
    if mode == ":MM":
        return DeflatedNEPMM(orgnep, S1, V1)
    if mode == ":SPMF":
        if not isinstance(orgnep, AbstractSPMF):
            raise ValueError("SPMF-mode only possible for AbstractSPMF-NEPs")
        spmf = create_spmf_dnep(orgnep, S1, V1)
        return DeflatedSPMF(orgnep, spmf, S1, V1)
    if mode == ":Generic":
        return DeflatedGenericNEP(orgnep, S1, V1)
    raise ValueError(f"unknown deflation mode {mode}")


def deflate_eigpair(nep, lam, v, mode=":Auto"):
    """Create/extend a deflated NEP from eigenpair (lam, v)
    (reference ``deflate_eigpair``, ``nep_deflation.jl:369-425``)."""
    mode = _verify_mode(nep, mode)
    v = np.asarray(v, dtype=complex)
    if isinstance(nep, _DeflatedBase):
        n = nep.orgnep.n
        p0 = nep.p
        V1 = np.zeros((n, p0 + 1), dtype=complex)
        S1 = np.zeros((p0 + 1, p0 + 1), dtype=complex)
        V1[:, :-1] = nep.V0
        V1[:, -1] = v[:n]
        S1[:-1, :-1] = nep.S0
        S1[:, -1] = np.concatenate([v[n:], [complex(lam)]])
        S1, V1 = normalize_schur_pair(S1, V1)
        return _make(nep.orgnep, S1, V1, mode)
    n = nep.n
    S0 = np.array([[complex(lam)]])
    V0 = v.reshape(n, 1)
    S0, V0 = normalize_schur_pair(S0, V0)
    return _make(nep, S0, V0, mode)


def get_deflated_eigpairs(nep, lam=None, v=None):
    """Extract eigenpairs of the original NEP from the invariant pair
    (reference ``get_deflated_eigpairs``)."""
    n = nep.orgnep.n
    if lam is None:
        S, V = nep.S0, nep.V0
    else:
        v = np.asarray(v, dtype=complex)
        p0 = nep.p
        V = np.zeros((n, p0 + 1), dtype=complex)
        S = np.zeros((p0 + 1, p0 + 1), dtype=complex)
        V[:, :-1] = nep.V0
        V[:, -1] = v[:n]
        S[:-1, :-1] = nep.S0
        S[:, -1] = np.concatenate([v[n:], [complex(lam)]])
    D, X = np.linalg.eig(S)
    return jnp.asarray(D), jnp.asarray(V[:n, :] @ X)
