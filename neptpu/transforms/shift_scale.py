"""shift_and_scale / mobius_transform / taylor_expansion_pep
(reference ``NEPTransformations.jl:30-231``) with the type-preserving
specializations: PEP coefficient recombination, DEP delay rescaling, SPMF
function composition; generic wrapper types otherwise."""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..core.nep import NEP, compute_Mder, compute_Mlincomb, compute_MM, mder_from_mm, mlincomb_from_mm
from ..models.dep import DEP
from ..models.pep import PEP
from ..models.spmf import SPMF_NEP
from ..ops import matfun

__all__ = [
    "shift_and_scale",
    "mobius_transform",
    "taylor_expansion_pep",
    "ShiftScaledNEP",
    "MobiusTransformedNEP",
]


class ShiftScaledNEP(NEP):
    """T(lam) = M(scale*lam + shift) for a generic NEP."""

    def __init__(self, orgnep: NEP, shift=0.0, scale=1.0):
        self.orgnep = orgnep
        self.shift = shift
        self.scale = scale
        self.n = orgnep.n

    def Mder(self, lam, der: int = 0):
        return (self.scale**der) * compute_Mder(self.orgnep, self.scale * lam + self.shift, der)

    def Mder_dense(self, lam, der: int = 0):
        M = self.Mder(lam, der)
        return M if isinstance(M, jnp.ndarray) else M.to_dense()

    def MM(self, S, V):
        S = jnp.asarray(S)
        return compute_MM(self.orgnep, S * self.scale + self.shift * jnp.eye(S.shape[0], dtype=S.dtype), V)

    def Mlincomb(self, lam, V, a=None, startder: int = 0):
        V = jnp.asarray(V)
        if V.ndim == 1:
            V = V[:, None]
        p = V.shape[1]
        z = jnp.asarray(self.scale) ** jnp.arange(startder, startder + p)
        W = V * z[None, :]
        return compute_Mlincomb(self.orgnep, self.scale * lam + self.shift, W, a, startder)


def shift_and_scale(orgnep: NEP, shift=0.0, scale=1.0):
    if isinstance(orgnep, PEP):
        # coefficient recombination: T(lam) = sum_j (sum_i A_i binom-weights)
        Av = [np.asarray(A if isinstance(A, jnp.ndarray) else A.to_dense()) for A in orgnep.get_Av()]
        m = len(Av) - 1
        At = []
        for j in range(m + 1):
            AA = np.zeros_like(Av[0], dtype=np.result_type(Av[0].dtype, type(shift), type(scale)))
            for i in range(j, m + 1):
                factor = (scale**j) * (shift ** (i - j)) * math.factorial(i) / (
                    math.factorial(i - j) * math.factorial(j)
                )
                AA = AA + Av[i] * factor
            At.append(AA)
        return PEP(At)
    if isinstance(orgnep, DEP):
        tau = np.asarray(orgnep.tauv)
        scales = np.exp(-tau * shift) / scale
        A = [np.asarray(orgnep.bank.term_dense(i)) * scales[i] for i in range(orgnep.bank.nterms)]
        J = np.eye(orgnep.n)
        return DEP(A + [-shift / scale * J], list(tau * scale) + [0.0])
    if isinstance(orgnep, SPMF_NEP):
        orgfv = orgnep.get_fv()
        fv = [
            (lambda S, f=f: f(scale * jnp.asarray(S) + shift * matfun.eye_like(S)))
            for f in orgfv
        ]
        return SPMF_NEP([None] * len(fv), fv, bank=orgnep.bank)
    return ShiftScaledNEP(orgnep, shift=shift, scale=scale)


class MobiusTransformedNEP(NEP):
    """T(lam) = M((a lam + b)/(c lam + d)) for a generic NEP."""

    def __init__(self, orgnep: NEP, a=1.0, b=0.0, c=0.0, d=1.0):
        self.orgnep = orgnep
        self.a, self.b, self.c, self.d = a, b, c, d
        self.n = orgnep.n

    def MM(self, S, V):
        S = jnp.asarray(S)
        I = jnp.eye(S.shape[0], dtype=S.dtype)
        num = self.a * S + self.b * I
        den = self.c * S + self.d * I
        return compute_MM(self.orgnep, jnp.linalg.solve(den, num), V)

    def Mder(self, lam, der: int = 0):
        return mder_from_mm(self, lam, der)

    def Mder_dense(self, lam, der: int = 0):
        return self.Mder(lam, der)

    def Mlincomb(self, lam, V, a=None, startder: int = 0):
        return mlincomb_from_mm(self, lam, V, a, startder)


def mobius_transform(orgnep: NEP, a=1.0, b=0.0, c=0.0, d=1.0):
    if isinstance(orgnep, SPMF_NEP):
        orgfv = orgnep.get_fv()

        def make(f):
            def g(S):
                S = jnp.asarray(S)
                I = matfun.eye_like(S)
                num = a * S + b * I
                den = c * S + d * I
                if S.ndim >= 2:
                    arg = jnp.linalg.solve(den, num)
                else:
                    arg = num / den
                return f(arg)

            return g

        return SPMF_NEP([None] * len(orgfv), [make(f) for f in orgfv], bank=orgnep.bank)
    return MobiusTransformedNEP(orgnep, a=a, b=b, c=c, d=d)


def taylor_expansion_pep(nep: NEP, d: int = 2):
    """Truncated Taylor series at 0 -> PEP (reference ``:225-231``)."""
    A = []
    for i in range(d + 1):
        M = compute_Mder(nep, 0.0, i)
        M = M if isinstance(M, jnp.ndarray) else M.to_dense()
        A.append(np.asarray(M) / math.factorial(i))
    return PEP(A)
