"""Inner-solver protocol sweep on a projected NEP (reference
``test/inner_solves.jl``): every InnerSolver class must return usable
(lamv, V) for the projected problem through the one ``inner_solve``
entry point."""
import numpy as np
import pytest

import neptpu
from neptpu import (ContourBeynInnerSolver, DefaultInnerSolver,
                    IARChebInnerSolver, NewtonInnerSolver,
                    NleigsInnerSolver, nep_gallery)
from neptpu.core.nep import compute_Mlincomb
from neptpu.models.projection import create_proj_NEP
from neptpu.solvers.inner import inner_solve


@pytest.fixture(scope="module")
def pnep():
    dep = nep_gallery("dep0", 200)
    pnep = create_proj_NEP(dep, maxsize=6)
    # stable deterministic projection space (the reference uses pep0
    # coefficient columns for version-stable "randomness")
    pep = nep_gallery("pep0", 200)
    cols = np.asarray(pep.get_Av()[0])[:, 7:12]
    Q, _ = np.linalg.qr(cols)
    pnep.set_projectmatrices(Q, Q)
    return pnep


def _check(pnep, lamv, V, count, tol):
    lamv = np.asarray(lamv)
    V = np.asarray(V)
    assert len(lamv) >= count
    for i in range(count):
        r = np.linalg.norm(np.asarray(
            compute_Mlincomb(pnep, complex(lamv[i]), V[:, i])))
        assert r / max(np.linalg.norm(V[:, i]), 1e-300) < tol, (i, lamv[i], r)


def test_inner_solve_default(pnep):
    lamv, V = inner_solve(DefaultInnerSolver(), complex, pnep,
                          sigma=0.0 + 0j, neigs=3, tol=1e-13)
    _check(pnep, lamv, V, 3, 1e-10)


def test_inner_solve_newton(pnep):
    k = pnep.n
    lamv, V = inner_solve(NewtonInnerSolver(), complex, pnep,
                          lamv=np.array([0.0 + 0j, 1.0 + 0j]),
                          V=np.ones((k, 2)), tol=1e-13)
    _check(pnep, lamv, V, 2, 1e-10)


def test_inner_solve_iar_chebyshev(pnep):
    lamv, V = inner_solve(IARChebInnerSolver(), complex, pnep,
                          lamv=np.arange(4).astype(complex))
    _check(pnep, lamv, V, 4, 1e-6)


def test_inner_solve_contour_beyn(pnep):
    lamv, V = inner_solve(ContourBeynInnerSolver(), complex, pnep,
                          lamv=np.array([0.0 + 0j, 1.0 + 0j]), neigs=3)
    _check(pnep, lamv, V, 2, 1e-6)


def test_inner_solve_nleigs(pnep):
    lamv, V = inner_solve(NleigsInnerSolver(), complex, pnep,
                          lamv=np.arange(4).astype(complex))
    assert len(np.asarray(lamv)) >= 5
