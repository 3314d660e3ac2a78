"""Projected-NEP recovery patterns (reference ``test/proj.jl``): when the
eigenvector lies in the projection subspace, solving the PROJECTED problem
recovers the full eigenpair exactly — across a PEP, an exp-SPMF and a
sqrtm-SPMF, including after ``expand_projectmatrices``."""
import numpy as np
import pytest

import jax.numpy as jnp

import neptpu
from neptpu import SPMF_NEP, compute_Mlincomb, nep_gallery
from neptpu.models.projection import create_proj_NEP
from neptpu.ops import matfun


def _problems():
    out = {"pep": nep_gallery("pep0_sparse")}

    n, t = 5, 3.0
    r = np.arange(1, 6, dtype=float)
    A0 = np.outer(r, r)
    A1 = np.outer(r, np.arange(3, 8, dtype=float)) + np.eye(n)
    out["dep_spmf"] = SPMF_NEP(
        [np.eye(n), A0, A1],
        [lambda S: -jnp.asarray(S), matfun.eye_like,
         lambda S: matfun.expm(-t * jnp.asarray(S))])

    n = 8
    r = np.arange(1, n + 1, dtype=float)
    B1 = np.eye(n) + np.outer(r, r) / n
    B0 = np.outer(r, np.arange(3, n + 3, dtype=float)) + 2 * np.eye(n)
    B2 = np.outer(np.arange(-1, n - 1, dtype=float),
                  np.arange(3, n + 3, dtype=float)) / 8 - np.eye(n)
    out["sqrtm_spmf"] = SPMF_NEP(
        [B0, B1, B2],
        [lambda S: -jnp.asarray(S), matfun.eye_like,
         lambda S: matfun.sqrtm(-t * jnp.asarray(S)
                                + 30.0 * matfun.eye_like(S))])
    return out


@pytest.mark.parametrize("key", ["pep", "dep_spmf", "sqrtm_spmf"])
def test_projected_problem_recovers_eigenpair(key):
    nep = _problems()[key]
    n = nep.n
    lam, x = neptpu.newton(nep, lam=1 + 1j, v=np.ones(n), maxit=30,
                           tol=1e-12)
    assert float(np.linalg.norm(np.asarray(
        compute_Mlincomb(nep, lam, x)))) < 1e-9

    # subspace containing the eigenvector (``proj.jl:60-65``)
    pnep = create_proj_NEP(nep, maxsize=4)
    V = np.outer(np.arange(1, n + 1), np.arange(1, 3)) / n
    V[0, 0] = np.pi
    Q, _ = np.linalg.qr(np.column_stack([V, np.asarray(x)]))
    pnep.set_projectmatrices(Q, Q)

    lam1, z1 = neptpu.newton(pnep, lam=lam + 1e-5, v=np.ones(Q.shape[1]),
                             maxit=30)
    x1 = Q @ np.asarray(z1)
    x0 = np.asarray(x)
    assert np.linalg.norm(x0 / x0[0] - x1 / x1[0]) < 1e-8

    # Krylov on the projected problem finds the same eigenvalue
    # (reference accepts sqrt(eps) agreement, ``proj.jl:80-82``; for the
    # sqrtm problem the branch point at lam=10 caps the Taylor-basis
    # accuracy near 1e-9, so the tolerance must sit above that floor —
    # at 1e-11 the distant branch-free pairs converge first and crowd
    # out the nearest eigenvalue)
    try:
        lamv, X, _ = neptpu.iar(pnep,
                                sigma=complex(round(lam.real * 10) / 10,
                                              round(lam.imag * 10) / 10),
                                neigs=3, maxit=40,
                                v=np.ones(Q.shape[1]), tol=1e-8)
        lamv = np.asarray(lamv)
    except neptpu.NoConvergenceException as e:
        lamv = np.asarray(e.lam)  # partial results carry converged pairs
    assert np.min(np.abs(lamv - lam)) < 1e-7

    # expand the subspace (full old basis + one new column, the reference
    # expand_projectmatrices! contract); the pair must survive
    # (``proj.jl:85-96``)
    Vnew = np.column_stack([Q, np.ones(n)])
    pnep.expand_projectmatrices(Vnew, Vnew)
    lam2, z2 = neptpu.newton(pnep, lam=lam + 1e-7,
                             v=Vnew.T @ x0 + 1e-5 * np.ones(Vnew.shape[1]),
                             maxit=30)
    x2 = Vnew @ np.asarray(z2)
    assert np.linalg.norm(x0 / x0[0] - x2 / x2[0]) < 1e-7
