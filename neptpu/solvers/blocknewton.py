"""Block Newton for invariant pairs (Kressner, Numer. Math. 2009; reference
``src/method_blocknewton.jl``): Newton on the coupled equations
``compute_MM(S, X) = 0``, ``V(X,S)^H [X; XS; ...] = I`` with Schur-form
transformed per-column linearized correction solves."""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..core.nep import compute_Mder, compute_MM
from ..models.spmf import AbstractSPMF
from ..ops import lapack
from .common import NoConvergenceException
from ..core.logger import parse_logger

__all__ = ["blocknewton"]


def _Vl(X, S):
    """[X; X S; X S^2; ...] with p block rows (reference ``Vl``)."""
    p = S.shape[0]
    n = X.shape[0]
    V = np.zeros((n * p, p), dtype=complex)
    B = X.copy()
    for j in range(p):
        V[j * n : (j + 1) * n, :] = B
        B = B @ S
    return V


def _dense(M):
    return np.asarray(M if isinstance(M, jnp.ndarray) else M.to_dense())


def blocknewton(nep: AbstractSPMF, S=None, X=None, errmeasure=None, tol=None,
                maxit=10, logger=0, armijo_factor=1.0, armijo_max=5):
    lg = parse_logger(logger)
    n = nep.n
    if S is None:
        S = np.zeros((2, 2))
    if X is None:
        X = np.eye(n, 2)
    S = np.asarray(S, dtype=complex)
    X = np.asarray(X, dtype=complex)
    if tol is None:
        tol = 100 * np.finfo(float).eps
    if errmeasure is None:
        errmeasure = lambda S_, X_: float(
            np.linalg.norm(np.asarray(compute_MM(nep, jnp.asarray(S_), jnp.asarray(X_))), 2)
        )
    p = S.shape[0]
    fv = nep.get_fv()
    Av = [_dense(A) for A in nep.get_Av()]
    m = len(fv)

    W = _Vl(X, S)
    WW = np.stack([W[j * n : (j + 1) * n, :] for j in range(p)], axis=2)  # (n, p, l)
    l = p
    err0 = np.inf

    def f_eval(f, M):
        return np.asarray(f(jnp.asarray(M)))

    def newtonstep_linsys(S_, X_, WW_, RT, RV):
        dX = np.zeros((n, p), dtype=complex)
        dS = np.zeros((p, p), dtype=complex)
        fS = np.stack([f_eval(f, S_) for f in fv], axis=2)  # (p, p, m)
        RT = RT.copy()
        RV = RV.copy()
        for i in range(p):
            s = S_[i, i]
            T11 = _dense(compute_Mder(nep, s))
            S_exp = np.block([
                [S_, np.eye(p)],
                [np.zeros((p, p)), s * np.eye(p)],
            ])
            T12 = np.zeros((n, p), dtype=complex)
            for j in range(m):
                DF = f_eval(fv[j], S_exp)
                T12 += Av[j] @ X_ @ DF[:p, p:]
            T21 = WW_[:, :, 0].conj().T.copy()
            for j in range(1, l):
                T21 += s ** j * WW_[:, :, j].conj().T
            DS = np.eye(p, dtype=complex)
            T22 = np.zeros((p, p), dtype=complex)
            Spow = np.eye(p, dtype=complex)  # S^(j-2) for j = 2.. -> S^0, S^1, ...
            for j in range(1, l):
                T22 += WW_[:, :, j].conj().T @ X_ @ DS
                DS = s * DS + Spow
                Spow = Spow @ S_
            TT = np.block([[T11, T12], [T21, T22]])
            sol = np.linalg.solve(TT, np.concatenate([RT[:, i], RV[:, i]]))
            dX[:, i] = sol[:n]
            dS[:, i] = sol[n:]
            if i < p - 1:
                Z = np.zeros((p, p), dtype=complex)
                Z[:, i] = dS[:, i]
                DS2 = Z.copy()
                S2_exp = np.block([[S_, Z], [np.zeros((p, p)), S_]])
                for j in range(m):
                    Za = np.outer(dX[:, i], fS[i, i + 1 :, j])
                    DF = f_eval(fv[j], S2_exp)
                    Zb = X_ @ DF[:p, p + i + 1 : 2 * p]
                    RT[:, i + 1 :] += -Av[j] @ (Za + Zb)
                Spow2 = np.eye(p, dtype=complex)
                for j in range(1, l):
                    Za = np.outer(dX[:, i], Spow2[i, i + 1 :])
                    Zb = X_ @ DS2[:, i + 1 :]
                    RV[:, i + 1 :] += -WW_[:, :, j].conj().T @ (Za + Zb)
                    DS2 = DS2 @ S_ + Spow2 @ DS2
                    Spow2 = Spow2 @ S_
        return dS, dX

    for k in range(maxit):
        err0 = errmeasure(S, X)
        lg.iteration(k, errs=err0)
        if err0 < tol:
            return jnp.asarray(S), jnp.asarray(X)
        Res = np.asarray(compute_MM(nep, jnp.asarray(S), jnp.asarray(X)))
        RR, QQ = (np.asarray(a) for a in lapack.schur(jnp.asarray(S)))
        dSt, dXt = newtonstep_linsys(RR, X @ QQ, WW, Res @ QQ, np.zeros((p, p), dtype=complex))
        dX = dXt @ QQ.conj().T
        dS = QQ @ dSt @ QQ.conj().T

        if armijo_factor < 1:
            DS, DV = -dS, -dX
            j = 0
            while errmeasure(S + DS, X + DV) > err0 and j < armijo_max:
                j += 1
                DS = DS * armijo_factor
                DV = DV * armijo_factor
            St, Xt = S + DS, X + DV
        else:
            St, Xt = S - dS, X - dX

        Wq, R = np.linalg.qr(_Vl(Xt, St))
        WW = np.stack([Wq[j * n : (j + 1) * n, :] for j in range(p)], axis=2)
        X = np.linalg.solve(R.T, Xt.T).T  # Xt / R
        S = (R @ St) @ np.linalg.inv(R)
    raise NoConvergenceException(S, X, err0, f"Number of iterations exceeded. maxit={maxit}.")
