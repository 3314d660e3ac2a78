"""Broyden's method with deflation (Jarlebring, SIAM J. Sci. Comput. 2019;
reference ``src/method_broyden.jl``): rank-1 Jacobian updates on the bordered
deflated system, step-length thresholding, conjugate-pair auto-add, and an
:eig/:invpow restart eigsolver.  Returns an invariant pair (S, X)."""
from __future__ import annotations

import time as _time

import numpy as np

import jax.numpy as jnp

from ..core.nep import compute_Mder, compute_Mlincomb
from ..core.logger import parse_logger
from ..ops import lapack
from .common import NoConvergenceException

__all__ = ["broyden"]


def broyden_default_errmeasure(lam, v, r):
    return float(np.linalg.norm(r) / np.linalg.norm(v))


def _mlin(nep, lam, v):
    return np.asarray(compute_Mlincomb(nep, complex(lam), jnp.asarray(v)))


def _broyden_T(nep, v1, u1, lam1, CH, T1, W1, S, X, maxit, check_error_every,
               threshold, tol, errmeasure, lg):
    """Inner Broyden iteration ("version T" of the paper; reference
    ``broyden_T``)."""
    v = np.asarray(v1, dtype=complex)
    u = np.asarray(u1, dtype=complex)
    lam = complex(lam1)
    n = nep.n
    p = S.shape[0]
    II = np.eye(p, dtype=complex)

    def vv_of(v, u, lam):
        if p == 0:
            return v
        return v + X @ np.linalg.solve(lam * II - S, u)

    rk = _mlin(nep, lam, vv_of(v, u, lam))
    T = np.asarray(T1, dtype=complex)
    W = np.asarray(W1, dtype=complex)
    errhist = []
    Z = T @ W
    for j in range(1, maxit + 1):
        Trk = T @ rk
        dulam = -np.linalg.solve(CH @ Z, CH @ Trk)
        du = dulam[:p]
        dlam = dulam[-1]
        dv = -Z @ dulam - Trk
        gamma = 1.0
        tt = float(np.sqrt(abs(dlam) ** 2 + np.linalg.norm(dv) ** 2))
        if tt > threshold:
            gamma = threshold / tt
        v = v + gamma * dv
        u = u + gamma * du
        lam = lam + gamma * dlam
        rkp = _mlin(nep, lam, vv_of(v, u, lam))
        ztilde = (rkp - (1 - gamma) * rk) / gamma
        Tztilde = T @ ztilde
        denom = np.linalg.norm(dv) ** 2 + np.linalg.norm(du) ** 2 + abs(dlam) ** 2
        bH = np.concatenate([du.conj(), [np.conj(dlam)]])[None, :] / denom
        beta = denom + dv.conj() @ Tztilde
        aH = -(dv.conj() @ T)[None, :] / beta
        Z = Z + Tztilde[:, None] @ (aH @ W + (1 + (aH @ ztilde)[0]) * bH)
        W = W + ztilde[:, None] @ bH
        T = T + Tztilde[:, None] @ aH
        rk = rkp
        if j % check_error_every == 0:
            err = errmeasure(lam, vv_of(v, u, lam), rk)
            errhist.append(err)
            lg.iteration(j, errs=err, lams=lam)
            if err < tol:
                return lam, v, u, T, W, j, errhist
    lg.info("Too many iterations")
    return lam, v, u, T, W, maxit, errhist


def broyden(nep, dtype=None, approxnep=":eye", sigma=0.0, pmax=3, c=None,
            maxit=1000, addconj=False, check_error_every=10,
            print_error_every=1, threshold=0.2, tol=1e-12, errmeasure=None,
            eigmethod=":eig", logger=0, recompute_U=False, inner_logger=0):
    lg = parse_logger(logger)
    ilg = parse_logger(inner_logger)
    if errmeasure is None:
        errmeasure = broyden_default_errmeasure
    n = nep.n
    if pmax > n:
        import warnings

        warnings.warn("Too many eigenvalues requested. Reducing")
        pmax = n
    sigma = complex(sigma)
    if c is None:
        c = np.ones(n, dtype=complex)
    c = np.asarray(c, dtype=complex)

    if isinstance(approxnep, np.ndarray):
        M1 = approxnep.astype(complex)
    elif approxnep == ":eye":
        M1 = np.eye(n, dtype=complex)
    else:
        M = compute_Mder(approxnep, sigma)
        M1 = np.asarray(M if isinstance(M, jnp.ndarray) else M.to_dense(), dtype=complex)
    T1 = np.linalg.inv(M1)

    X = np.zeros((n, 0), dtype=complex)
    S = np.zeros((0, 0), dtype=complex)
    UU = np.eye(n, pmax + 1, dtype=complex)
    k = 1
    all_errhist = []
    while k <= pmax:
        km1 = k - 1
        U1 = UU[:, :km1]
        for i in range(km1):
            ei = np.zeros(km1)
            ei[i] = 1.0
            f = np.linalg.solve(sigma * np.eye(km1) - S, ei)
            U1[:, i] = _mlin(nep, sigma, X @ f)

        MM = np.block([
            [M1, U1],
            [X.conj().T, np.zeros((km1, km1), dtype=complex)],
        ])
        lg.info("running eigval comp for deflation")
        if eigmethod == ":eig":
            d, V = np.linalg.eig(MM)
        elif eigmethod == ":invpow":
            d, V = _eigs_invpow(MM, maxit=4000, sigma=0.0)
        else:
            raise ValueError(f"Unknown eig method {eigmethod}")
        x = V[:, int(np.argmin(np.abs(d)))]

        v0 = x[:n]
        u0 = x[n:]
        h = X.conj().T @ v0
        v0 = v0 - X @ h
        u0 = u0 + (sigma * np.eye(km1) - S) @ h
        CH = np.vstack([X.conj().T, c.conj()[None, :]])
        scale = c.conj() @ v0
        u0 = u0 / scale
        v0 = v0 / scale

        d_fd = np.sqrt(np.finfo(float).eps)
        lg.info("Computing initial matrix")
        f1a = (_mlin(nep, sigma + d_fd, v0) - _mlin(nep, sigma - d_fd, v0)) / (2 * d_fd)
        f1b = -U1 @ np.linalg.solve(sigma * np.eye(km1) - S, u0) if km1 else np.zeros(n, dtype=complex)
        f1 = f1a + f1b
        W1 = np.column_stack([U1, f1])

        lg.info(f"Starting broyden n={n}")
        lam_m, vm, um, Tm, Wm, itr, errhist = _broyden_T(
            nep, v0, u0, sigma, CH, T1, W1, S, X, maxit, check_error_every,
            threshold, tol, errmeasure, ilg)
        all_errhist += list(errhist)
        nv = np.linalg.norm(vm)
        um = um / nv
        vm = vm / nv
        lg.info(f"Found an eigval {k}:{lam_m}")
        X = np.column_stack([X, vm])
        Snew = np.zeros((k, k), dtype=complex)
        Snew[:km1, :km1] = S
        Snew[:km1, km1] = um
        Snew[km1, km1] = lam_m
        S = Snew

        if abs(lam_m.imag) > tol * 10 and addconj:
            v1 = np.conj(vm + X[:, :km1] @ np.linalg.solve(lam_m * np.eye(km1) - S[:km1, :km1], um)) if km1 else np.conj(vm)
            lam1c = np.conj(lam_m)
            rnorm = np.linalg.norm(_mlin(nep, lam1c, v1))
            lg.info(f"Adding conjugate {k}")
            if rnorm > tol * 10:
                import warnings

                warnings.warn("Trying to add a conjugate pair which does not have a very small residual.")
            h = X.conj().T @ v1
            v1t = v1 - X @ h
            beta = np.linalg.norm(v1t)
            X = np.column_stack([X, v1t / beta])
            k += 1
            S1 = np.zeros((k, k), dtype=complex)
            S1[: k - 1, : k - 1] = S
            S1[k - 1, k - 1] = lam1c
            R = np.eye(k, dtype=complex)
            R[: k - 1, -1] = h
            R[k - 1, k - 1] = beta
            S = (R @ S1) @ np.linalg.inv(R)
        k += 1
    return jnp.asarray(S), jnp.asarray(X)


def _eigs_invpow(MM, maxit=10, sigma=0.0):
    """Inverse power method restart eigsolver (reference ``eigs_invpow``)."""
    A = MM - sigma * np.eye(MM.shape[0])
    import scipy.linalg as sla

    lu, piv = sla.lu_factor(A)
    z = np.ones(MM.shape[0], dtype=complex)
    for _ in range(maxit):
        z = sla.lu_solve((lu, piv), z)
        z = z / np.linalg.norm(z)
    lam = z.conj() @ (MM @ z)
    return np.array([lam]), z[:, None]
