"""Leja-Bagby nodes and rational divided differences
(reference ``src/rk_helper/rk_utils.jl``)."""
from __future__ import annotations

import warnings

import jax.numpy as jnp
import numpy as np

__all__ = ["lejabagby", "scgendivdiffs", "ratnewtoncoeffs", "ratnewtoncoeffsm", "evalrat"]


def lejabagby(A, B, C, m, keepA=False, forceInf=0):
    """Leja-Bagby points (a, b) on (A, B) with sup-norm scaling on C
    (reference ``rk_utils.jl:14-46``)."""
    A = np.asarray(A, dtype=complex)
    B = np.asarray(B, dtype=complex)
    C = np.asarray(C, dtype=complex)
    if np.min(np.abs(B)) < 1e-9:
        warnings.warn(
            "There is at least one pole candidate in B being nearby zero. "
            "Consider shifting your problem for stability."
        )
    a = [A[0]]
    b = [np.inf if forceInf > 0 else B[0]]
    beta = [1.0]
    sA = np.ones(A.shape, dtype=complex)
    sB = np.ones(B.shape, dtype=complex)
    sC = np.ones(C.shape, dtype=complex)
    for j in range(m - 1):
        binv = 0.0 if np.isinf(b[j]) else 1.0 / b[j]
        betainv = 1.0 / beta[j]
        with np.errstate(all="ignore"):
            # inf pole candidates yield NaNs here by design; the argmin/argmax
            # guards below treat them as +-inf (same as the reference)
            sA *= betainv * (A - a[j]) / (1 - A * binv)
            sB *= betainv * (B - a[j]) / (1 - B * binv)
            sC *= betainv * (C - a[j]) / (1 - C * binv)
        if keepA:
            a.append(A[j + 1])
        else:
            vals = np.where(np.isnan(sA), -np.inf, np.abs(sA))
            a.append(A[int(np.argmax(vals))])
        if forceInf > j + 1:
            b.append(np.inf)
        else:
            vals = np.where(np.isnan(sB), np.inf, np.abs(sB))
            b.append(B[int(np.argmin(vals))])
        bj = float(np.max(np.abs(sC)))
        beta.append(1.0 if bj < np.finfo(float).eps else bj)
    return np.asarray(a), np.asarray(b), np.asarray(beta)


def evalrat(sigma, xi, beta, z):
    """Nodal rational function at points z (reference ``rk_utils.jl:121-128``)."""
    z = np.asarray(z, dtype=complex)
    r = np.ones_like(z) / beta[0]
    for j in range(len(sigma)):
        xij = xi[j]
        denom = np.ones_like(z) if np.isinf(xij) else (1 - z / xij)
        r = r * (z - sigma[j]) / denom / beta[j + 1]
    return r


def ratnewtoncoeffs(fun, sigma, xi, beta):
    """Rational divided differences by differencing; fun may be matrix valued
    (reference ``rk_utils.jl:73-93``)."""
    sigma = np.asarray(sigma, dtype=complex)
    m = len(sigma)
    D = []
    as_mat = lambda x: jnp.asarray([[x]])
    D.append(np.asarray(fun(as_mat(sigma[0]))) * beta[0])
    for j in range(1, m):
        Qj = np.zeros_like(D[0])
        for k in range(j):
            Qj = Qj + D[k] * evalrat(sigma[:k], xi[:k], beta[: k + 1], [sigma[j]])[0]
        denom = evalrat(sigma[:j], xi[:j], beta[: j + 1], [sigma[j]])[0]
        D.append((np.asarray(fun(as_mat(sigma[j]))) - Qj) / denom)
    return D


def ratnewtoncoeffsm(fm, sigma, xi, beta):
    """Rational divided differences via a matrix function of the bidiagonal
    Hessenberg pencil H/K (reference ``rk_utils.jl:99-119``)."""
    sigma = np.asarray(sigma, dtype=complex)
    xi = np.asarray(xi, dtype=complex)
    beta = np.asarray(beta, dtype=float)
    m = len(sigma) - 1
    K = np.eye(m + 1, dtype=complex)
    sub = beta[1 : m + 1] / np.where(np.isinf(xi[:m]), np.inf, xi[:m])
    sub = np.where(np.isinf(xi[:m]), 0.0, sub)
    K[np.arange(1, m + 1), np.arange(m)] = sub
    H = np.diag(sigma[: m + 1]).astype(complex)
    H[np.arange(1, m + 1), np.arange(m)] = beta[1 : m + 1]
    # column balancing
    P = np.diag(1.0 / np.max(np.abs(K), axis=0))
    K = K @ P
    H = H @ P
    HK = H @ np.linalg.inv(K)
    D = np.asarray(fm(jnp.asarray(HK)))[:, 0] * beta[0]
    return D


def scgendivdiffs(sigma, xi, beta, maxdgr, isfunm, pff):
    """Per-scalar-function divided-difference table (reference
    ``rk_utils.jl:56-66``): sgdd[i, :] over maxdgr+2 nodes."""
    sgdd = np.zeros((len(pff), maxdgr + 2), dtype=complex)
    for i, f in enumerate(pff):
        if isfunm:
            sgdd[i, :] = ratnewtoncoeffsm(f, sigma[: maxdgr + 2], xi, beta)
        else:
            D = ratnewtoncoeffs(f, sigma[: maxdgr + 2], xi, beta)
            sgdd[i, :] = np.array([d.ravel()[0] for d in D])
    return sgdd
