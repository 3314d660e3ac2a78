"""Tests for broyden, blocknewton, infbilanczos, ilan, iar_chebyshev
(reference ``test/broyden.jl``, ``test/blocknewton.jl``,
``test/infbilanczos.jl``, ``test/ilan.jl``, ``test/iar_chebyshev.jl``)."""
import jax.numpy as jnp
import numpy as np
import pytest

import neptpu
from neptpu import (
    DEP,
    blocknewton,
    broyden,
    compute_resnorm,
    iar_chebyshev,
    ilan,
    infbilanczos,
    nep_gallery,
)
from neptpu.models.deflation import get_deflated_eigpairs as _gde


def test_broyden_dep0():
    """reference broyden docstring: three specific eigenvalues."""
    nep = nep_gallery("dep0")
    S, X = broyden(nep)
    S = np.asarray(S)
    d = np.diag(S)
    oracles = [-0.15955391823299253,
               -0.5032087003825461 + 1.1969823800738464j,
               1.2699713558173726]
    for t in oracles:
        assert np.min(np.abs(d - t)) < 1e-8
    for lam in d:
        smin = np.linalg.svd(np.asarray(nep.Mder_dense(lam)), compute_uv=False)[-1]
        assert smin < 1e-10


def test_blocknewton():
    """reference test/blocknewton.jl config."""
    nep = nep_gallery("dep0", 4)
    S, V = blocknewton(nep, S=np.zeros((3, 3)), X=np.eye(4, 3),
                       armijo_factor=0.5, maxit=20)
    for lam in np.linalg.eigvals(np.asarray(S)):
        smin = np.linalg.svd(np.asarray(nep.Mder_dense(lam)), compute_uv=False)[-1]
        assert smin < np.sqrt(np.finfo(float).eps)


def test_infbilanczos_dep0():
    nep = nep_gallery("dep0")
    A = [np.asarray(a).T for a in [nep.bank.A[0], nep.bank.A[1]]]
    nept = DEP(A, np.asarray(nep.tauv))
    lam, Q, T = infbilanczos(nep, nept, v=np.ones(5), u=np.ones(5), neigs=2,
                             maxit=30, tol=1e-8)
    lam = np.asarray(lam)
    assert len(lam) >= 2
    for i in range(len(lam)):
        assert float(compute_resnorm(nep, lam[i], np.asarray(Q)[:, i])) < 1e-7


@pytest.mark.slow
def test_ilan_symmetric():
    nep = nep_gallery("dep_symm_double", 8)
    lam, W, err, V = ilan(nep, sigma=0.0, neigs=3, maxit=30, v=np.ones(nep.n),
                          tol=1e-8, check_error_every=10)
    lam = np.asarray(lam)
    assert len(lam) >= 3
    for i in range(len(lam)):
        r = float(compute_resnorm(nep, lam[i], np.asarray(W)[:, i]))
        assert r / np.linalg.norm(np.asarray(W)[:, i]) < 1e-7


def test_sgiter_real_quadratic():
    """reference ``test/sgiter.jl``: j-th eigenvalue by safeguarded iteration."""
    from neptpu.core.errmeasure import ResidualErrmeasure
    from neptpu.solvers.sgiter import sgiter

    nep = nep_gallery("real_quadratic")
    lam, v = sgiter(nep, 1, lam_min=-10, lam_max=0, lam=-10, maxit=100,
                    tol=1e-12)
    r = np.linalg.norm(np.asarray(neptpu.compute_Mlincomb(nep, lam, v)))
    assert r < 1e-9
    assert -10 <= float(np.real(lam)) <= 0

    lam2, v2 = sgiter(nep, 2, tol=1e-9, maxit=100,
                      errmeasure=ResidualErrmeasure(nep))
    r2 = np.linalg.norm(np.asarray(neptpu.compute_Mlincomb(nep, lam2, v2)))
    assert r2 < 1e-9


@pytest.mark.parametrize("method", [":DEP", ":SPMF", ":Generic"])
def test_iar_chebyshev_dep0(method):
    nep = nep_gallery("dep0")
    lam, Q = iar_chebyshev(nep, neigs=3, maxit=30, v=np.ones(5), tol=1e-10,
                           compute_y0_method=method)
    lam = np.asarray(lam)
    # must match the Taylor-IAR eigenvalues
    assert np.min(np.abs(lam - (-0.15955391823299267))) < 1e-8
    for i in range(len(lam)):
        assert float(compute_resnorm(nep, lam[i], np.asarray(Q)[:, i])) < 1e-9


@pytest.mark.slow
def test_iar_chebyshev_pep():
    nep = nep_gallery("pep0", 40)
    lam, Q = iar_chebyshev(nep, neigs=2, maxit=40, v=np.ones(40), tol=1e-8)
    lam = np.asarray(lam)
    for i in range(len(lam)):
        assert float(compute_resnorm(nep, lam[i], np.asarray(Q)[:, i])) < 1e-6
