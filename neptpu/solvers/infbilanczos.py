"""Infinite bi-Lanczos (Gaaf & Jarlebring; reference
``src/method_infbilanczos.jl``): two-sided three-term recurrences on
left/right infinite Krylov bases, tridiagonal Ritz extraction; needs the
transposed NEP."""
from __future__ import annotations

import math

import numpy as np

import jax.numpy as jnp

from ..core.errmeasure import estimate_error
from ..core.nep import compute_Mlincomb
from ..ops.linsolve import create_linsolver, lin_solve
from .common import NoConvergenceException, init_vec, setup_solver

__all__ = ["infbilanczos"]


def _lfact(j):
    return math.lgamma(j + 1)


def infbilanczos(nep, nept, dtype=None, maxit=30, linsolvercreator=None,
                 linsolvertcreator=None, v=None, u=None, tol=1e-12, neigs=5,
                 errmeasure=None, sigma=0.0, gamma=1.0, logger=0,
                 check_error_every=1):
    dtype, em, lg = setup_solver(nep, dtype, errmeasure, logger)
    n = nep.n
    sigma = complex(sigma)
    v = np.asarray(init_vec(v, n, dtype, seed=8), dtype=complex)
    u = np.asarray(init_vec(u, n, dtype, seed=9), dtype=complex)

    M0inv = create_linsolver(linsolvercreator, nep, sigma)
    M0Tinv = create_linsolver(linsolvertcreator, nept, sigma)

    m = maxit
    qt = np.asarray(lin_solve(M0Tinv, jnp.asarray(u)))
    q = v.copy()
    # reference uses u:=v (types); normalization: q / <qt, M'(sigma) q>
    q = q / (qt.conj() @ np.asarray(
        compute_Mlincomb(nep, sigma, jnp.asarray(q)[:, None], jnp.ones(1), startder=1)))

    def mlin(nn, s, V, a, startder):
        return np.asarray(compute_Mlincomb(nn, s, jnp.asarray(V), jnp.asarray(a), startder=startder))

    def left_right_scalar_prod(At, B, ma, mb):
        c = 0.0 + 0.0j
        # XX is zero-padded to its final width so the Mlincomb inside
        # compiles once per derivative offset j (not once per (j, mb) pair)
        XX = np.zeros((n, m + 1), dtype=complex)
        ones = np.ones(m + 1)
        for j in range(1, ma + 1):
            dd = np.exp(-np.array([_lfact(i) for i in range(j, j + mb)]))
            XX[:, :mb] = B[:, :mb] * dd[None, :]
            XX[:, mb:] = 0.0
            z = -mlin(nep, sigma, XX, ones, j)
            c = c + At[:, j - 1].conj() @ z
        return c

    Q0 = np.zeros((n, m), dtype=complex)
    Qt0 = np.zeros((n, m), dtype=complex)
    R1 = np.zeros((n, m + 1), dtype=complex)
    R1[:, 0] = q
    Rt1 = np.zeros((n, m + 1), dtype=complex)
    Rt1[:, 0] = qt
    Z2 = np.zeros((n, m), dtype=complex)
    Zt2 = np.zeros((n, m), dtype=complex)
    Q_basis = np.zeros((n, m + 1), dtype=complex)
    R2 = np.zeros((n, m + 1), dtype=complex)
    Rt2 = np.zeros((n, m + 1), dtype=complex)
    Q1 = np.zeros((n, m), dtype=complex)
    Qt1 = np.zeros((n, m), dtype=complex)
    alpha = np.zeros(m + 1, dtype=complex)
    beta = np.zeros(m + 1, dtype=complex)
    gam = np.zeros(m + 1, dtype=complex)

    lam = np.zeros(0, dtype=complex)
    Q = np.zeros((n, 0), dtype=complex)
    TT = None
    err = np.zeros(0)
    for k in range(1, m + 1):
        omega = np.conj(left_right_scalar_prod(Rt1, R1, k, k))
        beta[k - 1] = np.sqrt(abs(omega))
        gam[k - 1] = np.conj(omega) / beta[k - 1]
        Q1[:, :k] = R1[:, :k] / beta[k - 1]
        Qt1[:, :k] = Rt1[:, :k] / np.conj(gam[k - 1])
        Q_basis[:, k - 1] = Q1[:, 0]

        Dk = np.exp(-np.array([_lfact(i) for i in range(1, k + 1)]))
        QD = np.zeros((n, m), dtype=complex)
        QD[:, :k] = Q1[:, :k] * Dk[None, :]
        b1 = -np.asarray(lin_solve(M0inv, jnp.asarray(
            mlin(nep, sigma, QD, np.ones(m), 1))))
        Z2[:, k - 1] = b1
        QD[:, :k] = Qt1[:, :k] * Dk[None, :]
        bt1 = -np.asarray(lin_solve(M0Tinv, jnp.asarray(
            mlin(nept, np.conj(sigma), QD, np.ones(m), 1))))
        Zt2[:, k - 1] = bt1

        R2[:, 0] = Z2[:, k - 1]
        R2[:, 1 : k + 1] = Q1[:, :k]
        if k > 1:
            R2[:, : k - 1] -= gam[k - 1] * Q0[:, : k - 1]
        Rt2[:, 0] = Zt2[:, k - 1]
        Rt2[:, 1 : k + 1] = Qt1[:, :k]
        if k > 1:
            Rt2[:, : k - 1] -= np.conj(beta[k - 1]) * Qt0[:, : k - 1]

        alpha[k] = left_right_scalar_prod(Qt1, R2, k, k + 1)
        R2[:, :k] -= alpha[k] * Q1[:, :k]
        Rt2[:, :k] -= np.conj(alpha[k]) * Qt1[:, :k]

        R1, R2 = R2, R1
        R2[:] = 0
        Rt1, Rt2 = Rt2, Rt1
        Rt2[:] = 0
        Q0, Q1 = Q1, Q0
        Q1[:] = 0
        Qt0, Qt1 = Qt1, Qt0
        Qt1[:] = 0

        if k % check_error_every == 0 or k == m:
            omega = left_right_scalar_prod(Rt1, R1, k + 1, k + 1)
            beta[k] = np.sqrt(abs(omega))
            gam[k] = np.conj(omega) / beta[k]
            alpha0 = alpha[1 : k + 1]
            beta0 = beta[1 : k + 1]
            gamma0 = gam[1 : k + 1]
            TT = (np.diag(alpha0[:k]) + np.diag(beta0[: k - 1], -1)
                  + np.diag(gamma0[: k - 1], 1))
            D, Z = np.linalg.eig(TT)
            lam = sigma + 1.0 / D
            Q = Q_basis[:, : k] @ Z[:k, :]
            errs = np.array(
                [float(estimate_error(em, lam[s], jnp.asarray(Q[:, s]))) for s in range(len(lam))]
            )
            conv_eig = int(np.sum(errs < tol))
            lg.iteration(k, errs=errs, lams=lam, level=2)
            lg.info("".join("+" if e < tol else "=" if e < tol * 10 else "-" for e in errs))
            idx = np.argsort(errs)
            err = errs[idx]
            if conv_eig >= neigs or k == m:
                nrof = int(min(len(lam), neigs, max(conv_eig, 1)))
                lam = lam[idx[:nrof]]
                Q = Q[:, idx[:nrof]]
                Q = Q / np.linalg.norm(Q, axis=0, keepdims=True)
                if conv_eig >= neigs or neigs == np.inf:
                    return jnp.asarray(lam), jnp.asarray(Q), jnp.asarray(TT)
    raise NoConvergenceException(lam, Q, err, f"Number of iterations exceeded. maxit={maxit}.")
