"""Standalone Leja-Bagby + divided-difference expansion
(reference ``src/nleigs_coefficients.jl:55-243``), used by
``NleigsCorkLinearization`` and as the setup phase of ``nleigs``."""
from __future__ import annotations

import warnings

import jax.numpy as jnp
import numpy as np

from ...core.nep import compute_Mder
from .polygon import discretizepolygon
from .rknep import get_rk_nep
from .utils import lejabagby, ratnewtoncoeffs, scgendivdiffs

__all__ = ["nleigs_coefficients"]


def nleigs_coefficients(nep, Sigma, Xi=(np.inf,), maxdgr=100, maxit=200,
                        tollin=None, isfunm=True, leja=1, nodes=(), logger=None):
    if tollin is None:
        tollin = 100 * np.finfo(float).eps
    P = get_rk_nep(nep)
    n = nep.n
    if n == 1:
        maxdgr = maxit + 1
    Xi = np.asarray(Xi, dtype=float)
    nodes = list(nodes)
    forceInf = max(P.p, 0)

    if leja == 0:
        if not nodes:
            raise ValueError("Interpolation nodes must be provided via 'nodes' when leja == 0")
        gamma, _ = discretizepolygon(Sigma)
        max_count = max(maxit, maxdgr) + 2
        reps = int(np.ceil(max_count / len(nodes)))
        sigma = np.tile(np.asarray(nodes, dtype=complex), reps)
        _, xi, beta = lejabagby(sigma[: maxdgr + 2], Xi, gamma, maxdgr + 2, True, forceInf)
    elif leja == 1:
        if not nodes:
            gamma, nodes = discretizepolygon(Sigma, True)
            nodes = list(nodes)
        else:
            gamma, _ = discretizepolygon(Sigma)
        reps = int(np.ceil((maxit + 1) / len(nodes)))
        nodes = np.tile(np.asarray(nodes, dtype=complex), reps)
        sigma, xi, beta = lejabagby(gamma, Xi, gamma, maxdgr + 2, False, forceInf)
    else:
        gamma, _ = discretizepolygon(Sigma)
        max_count = max(maxit, maxdgr) + 2
        sigma, xi, beta = lejabagby(gamma, Xi, gamma, max_count, False, forceInf)

    sigma = np.asarray(sigma, dtype=complex)
    xi = np.asarray(xi, dtype=complex)
    beta = np.asarray(beta, dtype=float)
    if len(xi) > maxdgr + 1:
        xi[maxdgr + 1] = np.nan

    rng = slice(0, maxdgr + 2)
    if not P.spmf:
        D = ratnewtoncoeffs(
            lambda L: compute_Mder(nep, complex(np.asarray(L).ravel()[0])),
            sigma[rng], xi[rng], beta[rng],
        )
        nrmD = [float(np.linalg.norm(D[0]))]
        sgdd = None
    else:
        sgdd = scgendivdiffs(sigma[rng], xi[rng], beta[rng], maxdgr, isfunm, nep.get_fv())
        D = [np.asarray(P.construct_D(0, sgdd))]
        nrmD = [float(np.max(np.abs(sgdd[:, 0])))]
    if not np.isfinite(nrmD[0]):
        raise ValueError("The generalized divided differences must be finite.")

    expand = True
    kconv = None
    N = 0
    kmax = maxit
    k = 1
    while k <= kmax and expand:
        if P.spmf:
            D.append(np.asarray(P.construct_D(k, sgdd)))
            nrmD.append(float(np.max(np.abs(sgdd[:, k]))))
        else:
            if k >= len(D):
                break
            nrmD.append(float(np.linalg.norm(D[k])))
        if not np.isfinite(nrmD[k]):
            raise ValueError("The generalized divided differences must be finite.")
        N += 1
        if n > 1 and k >= 5:
            # freeze once five consecutive divided-difference norms are tiny
            # (reference ``nleigs_coefficients.jl:160-186``, 1-based k)
            if sum(nrmD[k - 4 : k + 1]) < 5 * tollin:
                kconv = k - 1
                expand = False
                D = D[:k]
                xi = xi[:k]
                beta = beta[:k]
                nrmD = nrmD[:k]
            elif k == maxdgr + 1:
                kconv = k
                expand = False
                warnings.warn(f"NLEIGS: Linearization not converged after {maxdgr} iterations")
        k += 1

    return D, beta, xi, sigma
