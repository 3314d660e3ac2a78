"""Deflation + Jacobi-Davidson + NLAR tests (reference ``test/deflation.jl``,
``test/jd.jl``, ``test/nlar.jl``)."""
import jax.numpy as jnp
import numpy as np
import pytest

import neptpu
from neptpu import (
    compute_Mder,
    compute_Mlincomb,
    compute_resnorm,
    deflate_eigpair,
    get_deflated_eigpairs,
    jd_betcke,
    jd_effenberger,
    nep_gallery,
    nlar,
)


@pytest.fixture(scope="module")
def dep():
    return nep_gallery("dep0")


@pytest.mark.parametrize("mode", [":SPMF", ":Generic", ":MM"])
def test_deflation_modes(dep, mode):
    """reference deflate_eigpair docstring flow: deflate one pair, find a
    second, verify both are eigenpairs of the original NEP."""
    n = dep.n
    lam, v = neptpu.newton(dep, v=np.ones(n), tol=1e-13, maxit=30)
    dnep = deflate_eigpair(dep, lam, v, mode=mode)
    assert dnep.n == n + 1
    # FD-consistency of the deflated NEP
    x = np.random.default_rng(0).standard_normal(n + 1)
    z1 = np.asarray(compute_Mlincomb(dnep, 0.1, x[:, None], np.ones(1)))
    M = np.asarray(dnep.Mder_dense(0.1) if hasattr(dnep, "Mder_dense") else dnep.Mder(0.1))
    np.testing.assert_allclose(z1, M @ x, rtol=1e-7, atol=1e-8)
    # second eigenvalue via augnewton on the deflated problem
    lam2, v2 = neptpu.augnewton(dnep, v=np.ones(n + 1), tol=1e-12, maxit=100,
                                armijo_factor=0.5)
    assert abs(complex(lam2) - complex(lam)) > 1e-3  # no reconvergence
    smin = np.linalg.svd(np.asarray(dep.Mder_dense(lam2)), compute_uv=False)[-1]
    assert smin < 1e-9
    # extract both eigenpairs
    dnep2 = deflate_eigpair(dnep, lam2, v2, mode=mode)
    D, V = get_deflated_eigpairs(dnep2)
    D = np.asarray(D)
    V = np.asarray(V)
    assert len(D) == 2
    for i in range(2):
        r = float(compute_resnorm(dep, D[i], V[:, i])) / np.linalg.norm(V[:, i])
        assert r < 1e-8


def test_deflated_linsolver(dep):
    from neptpu import DeflatedNEPLinSolverCreator, create_linsolver, lin_solve

    n = dep.n
    lam, v = neptpu.newton(dep, v=np.ones(n), tol=1e-13, maxit=30)
    dnep = deflate_eigpair(dep, lam, v, mode=":Generic")
    solver = create_linsolver(DeflatedNEPLinSolverCreator(), dnep, 0.4)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(n + 1) + 0j
    x = np.asarray(lin_solve(solver, b))
    M = np.asarray(dnep.Mder_dense(0.4))
    np.testing.assert_allclose(M @ x, b, rtol=1e-8, atol=1e-9)


@pytest.mark.slow
def test_jd_betcke(dep):
    lam, V = jd_betcke(dep, neigs=1, maxit=dep.n, v=np.ones(dep.n), tol=1e-10)
    lam = np.asarray(lam)
    r = float(compute_resnorm(dep, lam[0], np.asarray(V)[:, 0]))
    assert r < 1e-8


@pytest.mark.slow
def test_jd_betcke_pep():
    nep = nep_gallery("pep0", 40)
    lam, V = jd_betcke(nep, neigs=2, maxit=40, v=np.ones(40), tol=1e-9)
    lam = np.asarray(lam)
    for i in range(2):
        assert float(compute_resnorm(nep, lam[i], np.asarray(V)[:, i])) < 1e-6


@pytest.mark.slow
def test_jd_effenberger():
    dep = nep_gallery("dep0", 30)
    lam, V = jd_effenberger(dep, neigs=2, maxit=30, lam=0.0, v=np.ones(dep.n), tol=1e-10)
    lam = np.asarray(lam)
    V = np.asarray(V)
    assert len(lam) == 2
    assert abs(lam[0] - lam[1]) > 1e-6
    for i in range(2):
        r = float(compute_resnorm(dep, lam[i], V[:, i])) / np.linalg.norm(V[:, i])
        assert r < 1e-8


@pytest.mark.slow
def test_nlar():
    nep = nep_gallery("pep0", 50)
    D, X, hist = nlar(nep, neigs=2, maxit=50, lam=0.0, v=np.ones(50), tol=1e-9,
                      num_restart_ritz_vecs=2)
    D = np.asarray(D)
    X = np.asarray(X)
    for i in range(2):
        r = float(compute_resnorm(nep, D[i], X[:, i])) / np.linalg.norm(X[:, i])
        assert r < 1e-7
    assert abs(D[0] - D[1]) > 1e-8
