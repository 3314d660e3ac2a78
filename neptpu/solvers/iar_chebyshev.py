"""IAR in the Chebyshev basis on [a, b] (reference
``src/method_iar_chebyshev.jl``): per-class ``compute_y0`` —

* DEP:  T_i(-kk*tau + cc) tables (robust for delay problems, the default)
* PEP:  derivation-matrix recurrence
* SPMF: divided-difference matrix functions f[S, 0] via the block trick
* generic: Chebyshev <-> monomial conversion (may be unstable at high degree)
"""
from __future__ import annotations

import warnings

import numpy as np

import jax.numpy as jnp

from ..core.errmeasure import estimate_error
from ..core.nep import compute_Mlincomb, compute_resnorm
from ..models.dep import DEP
from ..models.pep import PEP
from ..models.spmf import AbstractSPMF, SPMF_NEP
from ..ops import lapack
from ..ops.linsolve import create_linsolver, lin_solve
from ..ops.orth import DGKS, orthogonalize_and_normalize
from .common import NoConvergenceException, init_vec, setup_solver

__all__ = ["iar_chebyshev"]


def _cheb_vals(x, m):
    """[T_0(x), ..., T_m(x)] stable for |x| <= 1 and beyond
    (reference precompute Tc/Ttau)."""
    II = np.arange(m + 1)
    if abs(x) <= 1:
        return np.cos(II * np.arccos(x))
    if x >= 1:
        return np.cosh(II * np.arccosh(x))
    return ((-1.0) ** II) * np.cosh(II * np.arccosh(-x))


def _L_matrix(m, a, b):
    L = np.diag(np.concatenate([[2.0], 1.0 / np.arange(2, m + 1)]))
    L += np.diag(-1.0 / np.arange(1, m - 1), -2)
    return L * (b - a) / 4


def _mon2cheb(rho, gamma_, avec):
    n = len(avec) - 1
    al = 1 / (2 * rho)
    be = -gamma_ / rho
    b = np.zeros(n + 3, dtype=complex)
    for j in range(n, -1, -1):
        bb = np.zeros(n + 3, dtype=complex)
        bb[0] = al * b[1] + be * b[0] + avec[j]
        bb[1] = be * b[1] + al * b[2] + 2 * al * b[0]
        for k in range(3, n - j):
            bb[k - 1] = al * b[k - 2] + be * b[k - 1] + al * b[k]
        if n - j > 2:
            bb[n - j - 1] = al * b[n - j - 2] + be * b[n - j - 1]
        if n - j + 1 > 2:
            bb[n - j] = al * b[n - j - 1]
        b = bb
    return b[: n + 1]


def _cheb2mon(rho, gamma_, cvec):
    n = len(cvec) - 1
    al = 1 / (2 * rho)
    be = -gamma_ / rho
    a = np.zeros(n + 3, dtype=complex)
    bb = np.zeros(n + 3, dtype=complex)
    bb[: n + 1] = cvec
    for j in range(1, n + 2):
        b = np.zeros(n + 3, dtype=complex)
        for k in range(n - j + 1, 1, -1):
            b[k - 1] = (bb[k] - be * b[k] - al * b[k + 1]) / al
        b[0] = (bb[1] - be * b[1] - al * b[2]) / (2 * al)
        a[j - 1] = bb[0] - al * b[1] - be * b[0]
        bb = b
    return a[: n + 1]


def _dd0_mat_fun(f, S, sigma):
    """Divided-difference matrix function f[S, sigma I] via the 2x2 block
    trick (reference ``DD0_mat_fun``)."""
    n = S.shape[0]
    A = np.zeros((2 * n, 2 * n), dtype=complex)
    A[:n, :n] = S
    A[:n, n:] = np.eye(n)
    A[n:, n:] = sigma * np.eye(n)
    return np.asarray(f(jnp.asarray(A)))[:n, n:]


def iar_chebyshev(nep, dtype=None, orthmethod=None, maxit=30,
                  linsolvercreator=None, tol=None, neigs=6, errmeasure=None,
                  sigma=0.0, gamma=1.0, v=None, logger=0, check_error_every=1,
                  compute_y0_method=":Auto", a=None, b=None):
    """Chebyshev-basis infinite Arnoldi (reference
    ``method_iar_chebyshev.jl``).  ``compute_y0_method`` selects the next-
    vector computation: ``":Auto"``/``":DEP"``/``":PEP"``/``":SPMF"``/
    ``":Generic"``, or a CALLABLE ``(nep, X, Y, k, M0inv, a, b) -> y0``
    implementing the reference's ``compute_y0_cheb`` extension point for
    problem classes with their own Chebyshev recurrence."""
    dtype, em, lg = setup_solver(nep, dtype, errmeasure, logger)
    if tol is None:
        tol = 10000 * float(jnp.finfo(jnp.result_type(dtype, jnp.float32)).eps)
    if orthmethod is None:
        orthmethod = DGKS()
    if a is None:
        a = -float(np.max(np.asarray(nep.tauv))) if isinstance(nep, DEP) else -1.0
    if b is None:
        b = 0.0 if isinstance(nep, DEP) else 1.0
    if compute_y0_method == ":Auto":
        if isinstance(nep, DEP):
            compute_y0_method = ":DEP"
        elif isinstance(nep, PEP):
            compute_y0_method = ":PEP"
        elif isinstance(nep, SPMF_NEP):
            compute_y0_method = ":SPMF"
        else:
            compute_y0_method = ":Generic"
    sigma = complex(sigma)
    gamma = complex(gamma)
    sigma_orig = None
    if (sigma != 0 or gamma != 1) and compute_y0_method in (":DEP", ":PEP"):
        from ..transforms import shift_and_scale

        warnings.warn(
            "The problem will be explicitly shifted and scaled. The shift and "
            "scaling feature is not supported in the general version of iar_chebyshev."
        )
        orgnep = nep
        em = lambda mu, vv: float(compute_resnorm(orgnep, sigma + gamma * mu, vv))
        nep = shift_and_scale(nep, shift=sigma, scale=gamma)
        sigma_orig, gamma_orig = sigma, gamma
        sigma, gamma = 0.0 + 0j, 1.0 + 0j
    lg.info(f"IAR Chebyshev with interval [{a},{b}]")
    cc = (a + b) / (a - b)
    kk = 2 / (b - a)
    n = nep.n
    m = maxit

    V = np.zeros((n * (m + 1), m + 1), dtype=complex)
    H = np.zeros((m + 1, m), dtype=complex)
    alpha = np.array([gamma**i for i in range(m + 1)], dtype=complex)
    alpha[0] = 0.0
    M0inv = create_linsolver(linsolvercreator, nep, jnp.asarray(sigma))
    err_hist = np.ones((m, m + 1))
    lams = np.zeros(0, dtype=complex)
    Q = np.zeros((n, 0), dtype=complex)
    v0 = np.asarray(init_vec(v, n, dtype))
    V[:n, 0] = v0 / np.linalg.norm(v0)
    L = _L_matrix(m, a, b)

    # precomputation per y0 method
    Tc = _cheb_vals(cc, m)
    if compute_y0_method == ":DEP":
        tauv = np.asarray(nep.tauv)
        Ttau = np.stack([_cheb_vals(-kk * t + cc, m + 1) for t in tauv])
        Av = nep.get_Av()  # [I, A_1, ...]
    elif compute_y0_method == ":PEP":
        Linv = np.linalg.inv(L[:m, :m])
        Dmat = np.vstack([np.zeros((1, m)), Linv[: m - 1, :]])
        Av = nep.get_Av()
    elif compute_y0_method == ":SPMF":
        Linv = np.linalg.inv(L[:m, :m])
        Dmat = np.vstack([np.zeros((1, m)), Linv[: m - 1, :]])
        fv = nep.get_fv()
        Av = nep.get_Av()
        DDf = []
        for f in fv:
            DDs = sigma * np.eye(m) + gamma * Dmat
            DDf.append(gamma * _dd0_mat_fun(f, DDs, sigma))
    elif callable(compute_y0_method):
        pass  # user-supplied y0 computer needs no precomputation here
    else:
        P = np.column_stack(
            [_cheb2mon(kk, cc, np.eye(m + 1)[:, j]) for j in range(m + 1)]
        ).T
        P_inv = np.column_stack(
            [_mon2cheb(kk, cc, np.eye(m + 1)[:, j]) for j in range(m + 1)]
        ).T

    def apply_A(A, X):
        return (np.asarray(A @ jnp.asarray(X)) if isinstance(A, jnp.ndarray)
                else np.asarray(A.matmat(jnp.asarray(X))))

    def compute_y0(X, Y, k):
        if callable(compute_y0_method):
            # user extension point (reference ``compute_y0_cheb`` dispatch,
            # method_iar_chebyshev.jl): the callable receives the NEP, the
            # Chebyshev-coefficient block X (n x k), the partially-filled
            # candidate Y (n x k+1, columns 1..k = X @ L), the degree k,
            # the shifted linear solver, and the interval (a, b); it must
            # return the new 0th Chebyshev coefficient y0 (length n)
            return np.asarray(
                compute_y0_method(nep, X, Y, k, M0inv, a, b)).ravel()
        if compute_y0_method == ":DEP":
            y0 = np.sum(X * Tc[None, :k], axis=1, keepdims=True)
            for j in range(len(tauv)):
                y0 = y0 - apply_A(Av[j + 1], np.sum(Y[:, : k + 1] * Ttau[j, None, : k + 1], axis=1, keepdims=True))
            return np.asarray(lin_solve(M0inv, jnp.asarray(y0[:, 0])))
        if compute_y0_method == ":PEP":
            d = len(Av) - 1
            vv = Tc[:k].copy()
            y0 = np.zeros(n, dtype=complex)
            for j in range(d):
                y0 += apply_A(Av[j + 1], (X @ vv)[:, None])[:, 0]
                vv = Dmat[:k, :k] @ vv
            y0 = -np.asarray(lin_solve(M0inv, jnp.asarray(y0)))
            return y0 - Y[:, : k + 1] @ Tc[: k + 1]
        if compute_y0_method == ":SPMF":
            # pad to the final column count so apply_A compiles once
            y0 = np.zeros((n, m), dtype=complex)
            Z = np.zeros((n, m), dtype=complex)
            for i, f in enumerate(fv):
                Z[:, :k] = X @ DDf[i][:k, :k]
                y0 += apply_A(Av[i], Z)
            y0 = y0[:, :k] @ Tc[:k]
            y0 = -np.asarray(lin_solve(M0inv, jnp.asarray(y0)))
            return y0 - Y[:, : k + 1] @ Tc[: k + 1]
        # generic: cheb -> monomial -> Taylor-IAR step -> back
        # (padded to m+1 columns with zero coefficients: one compile)
        Y2 = np.zeros((n, m + 1), dtype=complex)
        Y2[:, 1 : k + 1] = (X @ P[:k, :k]) / np.arange(1, k + 1)
        a_k = np.zeros(m + 1, dtype=complex)
        a_k[: k + 1] = alpha[: k + 1]
        z = compute_Mlincomb(nep, sigma, jnp.asarray(Y2), jnp.asarray(a_k))
        Y2[:, 0] = -np.asarray(lin_solve(M0inv, z))
        Y2 = Y2[:, : k + 1] @ P_inv[: k + 1, : k + 1]
        Y[:, : k + 1] = Y2
        return Y2[:, 0]

    k = 1
    conv_eig = 0
    while k <= m and conv_eig < neigs:
        X = V[: n * k, k - 1].reshape(k, n).T
        y = np.zeros((n, k + 1), dtype=complex)
        if compute_y0_method != ":Generic":
            y[:, 1 : k + 1] = X @ L[:k, :k]
        y[:, 0] = compute_y0(X, y, k)
        # fixed-shape orthogonalization: the zero tail of the preallocated
        # basis/candidate contributes nothing, and every jax call in the
        # loop compiles exactly once
        vv = np.zeros(n * (m + 1), dtype=complex)
        vv[: n * (k + 1)] = y[:, : k + 1].T.reshape(-1)
        w, h, beta = orthogonalize_and_normalize(
            jnp.asarray(V), jnp.asarray(vv), orthmethod
        )
        H[:k, k - 1] = np.asarray(h)[:k]
        H[k, k - 1] = complex(beta)
        V[:, k] = np.asarray(w)

        if ((k % check_error_every == 0) or k == m) and k > 2:
            D, Z = np.linalg.eig(H[:k, :k].astype(np.complex128))
            Q = V[:n, :k] @ Z
            lams = sigma + gamma / D
            errs = np.array(
                [float(estimate_error(em, lams[s], jnp.asarray(Q[:, s]))) for s in range(len(lams))]
            )
            err_hist[k - 1, : len(lams)] = errs
            lg.iteration(k, errs=errs, lams=lams, level=2)
            conv_eig = int(np.sum(errs < tol))
            lg.info("".join("+" if e < tol else "=" if e < tol * 10 else "-" for e in errs))
            idx = np.argsort(errs)
            if k == m or conv_eig >= neigs:
                nrof = int(min(len(lams), neigs))
                lams = lams[idx[:nrof]]
                Q = Q[:, idx[:nrof]]
        k += 1
    k -= 1
    if conv_eig < neigs and neigs != np.inf:
        msg = f"Number of iterations exceeded. maxit={maxit}."
        if conv_eig < 3:
            msg += " Check that sigma is not an eigenvalue."
        raise NoConvergenceException(lams, Q, err_hist, msg)
    if sigma_orig is not None:
        lams = sigma_orig + gamma_orig * lams
    nc = int(min(len(lams), conv_eig))
    return jnp.asarray(lams[:nc]), jnp.asarray(Q[:, :nc])
