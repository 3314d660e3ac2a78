"""Newton-family solver tests (reference ``test/newton.jl``, ``test/mslp.jl``)."""
import jax.numpy as jnp
import numpy as np
import pytest

import neptpu
from neptpu import (
    DEP,
    compute_resnorm,
    nep_gallery,
    newton,
    augnewton,
    quasinewton,
    newtonqr,
    implicitdet,
    resinv,
    mslp,
    rfi,
    rfi_b,
)

EPS = np.finfo(float).eps


@pytest.fixture(scope="module")
def dep():
    return nep_gallery("dep0")


def test_newton_equals_augnewton(dep):
    n = dep.n
    lam1, x1 = newton(dep, v=np.ones(n), lam=0, tol=EPS * 10, maxit=30)
    lam2, x2 = augnewton(dep, v=np.ones(n), lam=0, tol=EPS * 10, maxit=30)
    assert abs(complex(lam1) - complex(lam2)) < 1e-10
    assert float(compute_resnorm(dep, lam1, x1)) < EPS * 100
    assert float(compute_resnorm(dep, lam2, x2)) < EPS * 100


def test_quasinewton(dep):
    lam, x = quasinewton(dep, v=np.ones(dep.n), lam=0, tol=1e-12)
    assert float(compute_resnorm(dep, lam, x)) < 1e-11 * 100


def test_newtonqr(dep):
    lam, x, y = newtonqr(dep, lam=0, v=np.ones(dep.n), tol=EPS * 10)
    assert float(compute_resnorm(dep, lam, x)) < EPS * 100


def test_implicitdet(dep):
    lam, x = implicitdet(dep, lam=0, v=np.ones(dep.n))
    assert float(compute_resnorm(dep, lam, x)) / float(jnp.linalg.norm(x)) < 1e-12


def test_resinv(dep):
    lam, x = resinv(dep, lam=-0.5, v=np.ones(dep.n), tol=EPS * 10)
    assert float(compute_resnorm(dep, lam, x)) / float(jnp.linalg.norm(x)) < EPS * 100


def test_resinv_real_dtype(dep):
    lam, x = resinv(dep, dtype=np.float64, lam=-0.5, v=np.ones(dep.n), tol=1e-13)
    assert np.asarray(lam).dtype == np.float64
    assert float(compute_resnorm(dep, lam, x)) / float(jnp.linalg.norm(x)) < 1e-11


def test_mslp(dep):
    lam, x = mslp(dep, tol=EPS * 100)
    assert float(compute_resnorm(dep, lam, x)) < EPS * 500


def test_rfi(dep):
    A = [np.asarray(a).T for a in [dep.bank.A[0], dep.bank.A[1]]]
    nept = DEP(A, np.asarray(dep.tauv))
    n = dep.n
    lam, x, y = rfi(dep, nept, v=np.ones(n), u=np.ones(n), tol=1e-15)
    assert float(compute_resnorm(dep, lam, x)) < EPS * 100
    assert float(compute_resnorm(nept, lam, y)) < EPS * 100


def test_rfi_b(dep):
    A = [np.asarray(a).T for a in [dep.bank.A[0], dep.bank.A[1]]]
    nept = DEP(A, np.asarray(dep.tauv))
    n = dep.n
    lam, x, y = rfi_b(dep, nept, v=np.ones(n), u=np.ones(n), tol=1e-13)
    assert float(compute_resnorm(dep, lam, x)) < 1e-11


def test_newton_pep_real_quadratic():
    """Converge to one of the four known real eigenvalues
    (oracles in BASELINE.md)."""
    nep = nep_gallery("real_quadratic")
    lam, v = newton(nep, dtype=np.float64, lam=-4.0, v=np.ones(4), tol=1e-13, maxit=50)
    oracles = np.array(
        [-2051.741417993845, -182.101627437811, -39.344930222838, -4.039879577113]
    )
    assert np.min(np.abs(oracles - float(np.real(lam)))) < 1e-6


def test_quasinewton_sparse():
    nep = nep_gallery("dep0_sparse", 50, 0.25)
    # quasi-Newton keeps the M(lam0) factorization fixed -> locally convergent;
    # start near the eigenvalue at -0.15141595 (found via mslp)
    lam, x = quasinewton(nep, lam=-0.151 + 0.001j, v=np.ones(50), tol=1e-12,
                         maxit=100, armijo_factor=0.5)
    assert float(compute_resnorm(nep, lam, x)) / float(jnp.linalg.norm(x)) < 1e-10
