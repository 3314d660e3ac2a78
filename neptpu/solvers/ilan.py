"""Infinite Lanczos for symmetric NEPs (reference ``src/method_ilan.jl``):
indefinite-scalar-product three-term recurrence, structured B-multiplication
with the symmetrizer-coefficient matrix G and FDH derivative tables, and
extraction via projection (proj_solve=True default)."""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..core.errmeasure import estimate_error
from ..core.nep import compute_Mlincomb
from ..ops.linsolve import create_linsolver, lin_solve
from ..ops.orth import DGKS, orthogonalize_and_normalize
from .common import NoConvergenceException, init_vec, setup_solver

__all__ = ["ilan", "symmetrizer_coefficients"]


def symmetrizer_coefficients(m):
    """G[i, j] coefficients (reference ``symmetrizer_coefficients``)."""
    G = np.zeros((m + 1, m + 1))
    for i in range(m + 1):
        G[i, 0] = 1.0 / (i + 1)
    for j in range(m):
        for i in range(m + 1):
            G[i, j + 1] = G[i, j] * (j + 1) / (i + j + 2)
    return G


def _fdh_tables(nep, m, sigma, gamma):
    """FDH[t][i, j] = f_t^{(i+j+1)}(sigma) * gamma^{i+j+1} tables from the
    scaled bidiagonal trick (reference ``precompute_data`` SPMF branch)."""
    fv = nep.get_fv()
    p = len(fv)
    SS = complex(sigma) * np.eye(2 * m + 2, dtype=complex) + np.diag(
        complex(gamma) * np.arange(1, 2 * m + 2), -1
    )
    FDH = []
    for f in fv:
        fD = np.asarray(f(jnp.asarray(SS)))[:, 0]
        T = np.empty((m + 1, m + 1), dtype=complex)
        for i in range(m + 1):
            T[i, :] = fD[i + 1 : i + m + 2]
        FDH.append(T)
    return FDH


def ilan(nep, dtype=None, orthmethod=None, maxit=30, linsolvercreator=None,
         tol=None, neigs=6, errmeasure=None, sigma=0.0, gamma=1.0, v=None,
         logger=0, check_error_every=30, inner_solver_method=None,
         proj_solve=True, inner_logger=0):
    dtype, em, lg = setup_solver(nep, dtype, errmeasure, logger)
    if tol is None:
        tol = 10000 * float(jnp.finfo(jnp.result_type(dtype, jnp.float32)).eps)
    if orthmethod is None:
        orthmethod = DGKS()
    n = nep.n
    m = maxit
    sigma = complex(sigma)
    gamma = complex(gamma)

    V = np.zeros((n, m + 1), dtype=complex)
    Q = np.zeros((n, m + 1), dtype=complex)
    Qp = np.zeros((n, m + 1), dtype=complex)
    Qn = np.zeros((n, m + 1), dtype=complex)
    H = np.zeros((m + 1, m), dtype=complex)
    HH = np.zeros((m + 1, m), dtype=complex)
    omega = np.zeros(m + 1, dtype=complex)
    a = np.array([gamma**i for i in range(2 * m + 3)], dtype=complex)
    a[0] = 0.0
    M0inv = create_linsolver(linsolvercreator, nep, jnp.asarray(sigma, dtype=dtype))
    err_hist = np.full((m, m + 1), np.nan)
    W = np.zeros((n, m + 1), dtype=complex)
    QQ = np.zeros((n, m + 1), dtype=complex)

    Av = nep.get_Av()
    FDH = _fdh_tables(nep, m, sigma, gamma)
    G = symmetrizer_coefficients(m)

    v0 = np.asarray(init_vec(v, n, dtype))
    Q[:, 0] = v0 / np.linalg.norm(v0)
    omega[0] = np.sum(
        Q[:, 0] * np.asarray(
            compute_Mlincomb(nep, 0.0, jnp.asarray(np.column_stack([Q[:, 0], Q[:, 0]])),
                             jnp.asarray([0.0, 1.0]))
        )
    )
    V[:, 0] = Q[:, 0]

    def _apply_term(A, X):
        return (np.asarray(A @ jnp.asarray(X)) if isinstance(A, jnp.ndarray)
                else np.asarray(A.matmat(jnp.asarray(X))))

    is_dep = hasattr(nep, "tauv")

    def Bmult(k, Qn_):
        """Z = sum_t Av[t] Qn (G .* FDH[t]) (reference ``Bmult!`` SPMF).

        DEP fast path (reference DEP branch, ``method_ilan.jl:394-419``):
        for a delay term f = e^{-tau lam}, FDH[i, j] = c * w_i w_j with
        w_i = (gamma (-tau))^i, c = gamma (-tau) e^{-sigma tau} — rank one.
        So G .* FDH = c diag(w) G diag(w); compressing G by SVD to rank q
        (tolG = 1e-12, q ~ log k) turns the per-term SpMM from k+1 columns
        into q columns: Z_t = c A_t [Qn (w .* U)] (w .* V)^H.
        """
        if is_dep:
            Gk = G[: k + 1, : k + 1]
            U, S, Vt = np.linalg.svd(Gk)
            q = int(np.sum(S > 1e-12))
            Us = U[:, :q] * np.sqrt(S[:q])
            Vs = Vt[:q].T * np.sqrt(S[:q])
            Z = np.zeros((n, k + 1), dtype=complex)
            # identity term -lam I: only FDH[0][0,0] = -gamma survives
            Z[:, 0] = -gamma * Qn_[:, 0]
            for t, tau in enumerate(np.asarray(nep.tauv, dtype=float)):
                w = (gamma * (-tau)) ** np.arange(k + 1)
                c = gamma * (-tau) * np.exp(-sigma * tau)
                QQ = Qn_[:, : k + 1] @ (Us * w[:, None])  # (n, q)
                if q <= k + 1:
                    Z += c * (_apply_term(Av[t + 1], QQ)
                              @ (Vs * w[:, None]).T)
                else:
                    Z += c * _apply_term(
                        Av[t + 1], QQ @ (Vs * w[:, None]).T)
            return Z
        Z = np.zeros((n, k + 1), dtype=complex)
        for t, A in enumerate(Av):
            Wt = Qn_[:, : k + 1] @ (G[: k + 1, : k + 1] * FDH[t][: k + 1, : k + 1])
            Z += _apply_term(A, Wt)
        return Z

    lam = np.zeros(0, dtype=complex)
    k = 1
    conv_eig = 0
    while k <= m and conv_eig < neigs:
        Qn[:, 1 : k + 1] = Q[:, :k] / np.arange(1, k + 1)
        Qn[:, 0] = np.asarray(
            compute_Mlincomb(nep, sigma, jnp.asarray(Qn[:, : k + 1]), jnp.asarray(a[: k + 1]))
        )
        Qn[:, 0] = -np.asarray(lin_solve(M0inv, jnp.asarray(Qn[:, 0])))

        Z = Bmult(k, Qn)

        beta = np.sum(Z[:, :k] * Qp[:, :k]) if k > 1 else 0.0
        alpha = np.sum(Z[:, :k] * Q[:, :k])
        eta = np.sum(Z[:, : k + 1] * Qn[:, : k + 1])

        H[k - 1, k - 1] = alpha / omega[k - 1]
        if k > 1:
            H[k - 2, k - 1] = beta / omega[k - 2]
        Qn[:, :k] -= H[k - 1, k - 1] * Q[:, :k]
        if k > 1:
            Qn[:, :k] -= H[k - 2, k - 1] * Qp[:, :k]
        H[k, k - 1] = np.linalg.norm(Qn)
        Qn[:, : k + 1] /= H[k, k - 1]
        omega[k] = eta - 2 * alpha * H[k - 1, k - 1] + omega[k - 1] * H[k - 1, k - 1] ** 2
        if k > 1:
            omega[k] += -2 * beta * H[k - 2, k - 1] + omega[k - 2] * H[k - 2, k - 1] ** 2
        omega[k] /= H[k, k - 1] ** 2
        V[:, k] = Qn[:, 0]
        wout, hh, _ = orthogonalize_and_normalize(
            jnp.asarray(V[:, :k]), jnp.asarray(V[:, k]), orthmethod
        )
        HH[:k, k - 1] = np.asarray(hh)
        V[:, k] = np.asarray(wout)
        QQ[:, k - 1] = Q[:, 0]

        if (k % check_error_every == 0) or k == m:
            if not proj_solve:
                D, W_Ritz = np.linalg.eig(H[:k, :k])
                W[:, :k] = QQ[:, :k] @ W_Ritz
                lam = sigma + gamma / D
            else:
                from ..models.projection import create_proj_NEP
                from .inner import inner_solve

                VV = V[:, : k + 1]
                pnep = create_proj_NEP(nep, VV.shape[1])
                pnep.set_projectmatrices(VV, VV)
                lamproj, Wproj = inner_solve(inner_solver_method, dtype, pnep,
                                             neigs=m, tol=tol, inner_logger=inner_logger)
                lamproj = np.atleast_1d(np.asarray(lamproj))
                q = min(len(lamproj), m)
                lam = lamproj[:q]
                W[:, :q] = VV @ np.asarray(Wproj)[:, :q]
            errs = np.array(
                [float(estimate_error(em, lam[s], jnp.asarray(W[:, s]))) for s in range(len(lam))]
            )
            err_hist[k - 1, : len(lam)] = errs
            lg.iteration(k, errs=errs, lams=lam, level=2)
            conv_eig = int(np.sum(errs < tol))
            lg.info("".join("+" if e < tol else "=" if e < tol * 10 else "-" for e in errs))
            idx = np.argsort(errs)
            if k == m or conv_eig >= neigs:
                nrof = int(min(conv_eig, neigs))
                lam = lam[idx[:nrof]]
                W = W[:, idx[: len(lam)]]
        k += 1
        Qp[:] = Q
        Q[:] = Qn
        Qn[:] = 0

    k -= 1
    if conv_eig < neigs and neigs != np.inf:
        msg = f"Number of iterations exceeded. maxit={maxit}."
        raise NoConvergenceException(lam, W, err_hist, msg)
    return (jnp.asarray(lam), jnp.asarray(W[:, : len(lam)]), err_hist,
            jnp.asarray(V[:, : k + 1]))
