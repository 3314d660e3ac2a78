"""Waveguide eigenvalue problem tests (reference ``test/wep_small.jl``)."""
import jax.numpy as jnp
import numpy as np
import pytest

import neptpu
from neptpu import WEPLinSolverCreator, compute_Mlincomb, compute_resnorm, nep_gallery
from neptpu.models.gallery.waveguide import (
    SchurMatVec,
    WEPGMRESLinSolver,
    sqrt_derivative,
    wep_generate_preconditioner,
)


def test_spmf_vs_native_formats():
    """SPMF and native WEP formats agree to 1e-14
    (reference ``wep_small.jl:13-28``)."""
    nx, nz = 11, 7
    spmf = nep_gallery("waveguide", nx=nx, nz=nz, benchmark_problem="TAUSCH", neptype="SPMF")
    wep = nep_gallery("waveguide", nx=nx, nz=nz, benchmark_problem="TAUSCH", neptype="WEP")
    lam = -1.3 - 0.31j
    v1 = np.asarray(compute_Mlincomb(spmf, lam, np.ones(spmf.n)))
    v2 = np.asarray(compute_Mlincomb(wep, lam, np.ones(wep.n)))
    assert np.linalg.norm(v1 - v2) / np.linalg.norm(v1) < 1e-14
    # multi-derivative agreement
    V = np.random.default_rng(0).standard_normal((spmf.n, 3))
    a = np.array([1.0, 0.5, -0.2])
    z1 = np.asarray(compute_Mlincomb(spmf, lam, V, a))
    z2 = np.asarray(compute_Mlincomb(wep, lam, V, a))
    assert np.linalg.norm(z1 - z2) / np.linalg.norm(z1) < 1e-13


def test_smw_preconditioner_exact_inverse():
    """At N=nz the SMW preconditioner is an exact inverse of the Schur
    matvec (reference ``wep_small.jl:24-28``)."""
    nep = nep_gallery("waveguide", nx=11, nz=7, benchmark_problem="TAUSCH", neptype="WEP")
    lam = -1.3 - 0.31j
    precond = wep_generate_preconditioner(nep, 7, lam)
    rng = np.random.default_rng(5)
    b1 = rng.standard_normal(77) + 1j * rng.standard_normal(77)
    b2 = precond(SchurMatVec(nep, lam)(b1))
    assert np.linalg.norm(b1 - b2) / np.linalg.norm(b1) < 1e-13


def test_sqrt_derivative_fd():
    """Gegenbauer recurrence vs central differences."""
    a, b, c = 1.0, 2.0 + 1j, 5.0 - 0.3j
    x = 0.7 + 0.2j
    der = sqrt_derivative(a, b, c, 3, x)
    f = lambda z: np.sqrt(a * z**2 + b * z + c)
    eps = 1e-6
    fd1 = (f(x + eps) - f(x - eps)) / (2 * eps)
    assert abs(der[1] - fd1) < 1e-7
    fd2 = (f(x + eps) - 2 * f(x) + f(x - eps)) / eps**2
    assert abs(der[2] - fd2) < 1e-3


JARLEBRING_REF = -2.743228671961724 - 3.1439375599649972j


@pytest.fixture(scope="module")
def wep_jarlebring():
    return nep_gallery("waveguide", nx=3 * 5 * 7 + 4, nz=3 * 5 * 7,
                       benchmark_problem="JARLEBRING", neptype="WEP")


@pytest.mark.slow
def test_wep_jarlebring_resinv_oracle(wep_jarlebring):
    """lam_ref = -2.743228671961724 - 3.1439375599649972i via resinv with the
    factorized Schur-complement solver (reference ``wep_small.jl:31-50``)."""
    nep = wep_jarlebring
    em = neptpu.EigvalReferenceErrmeasure(nep, JARLEBRING_REF)
    lam, v = neptpu.resinv(nep, lam=-3 - 3.5j, v=np.ones(nep.n) / np.sqrt(nep.n),
                           errmeasure=em, tol=1e-12,
                           linsolvercreator=WEPLinSolverCreator())
    assert float(compute_resnorm(nep, lam, v)) / float(jnp.linalg.norm(v)) < 1e-10
    assert abs(complex(lam) - JARLEBRING_REF) < 1e-9


@pytest.mark.slow
def test_wep_jarlebring_gmres_preconditioned(wep_jarlebring):
    """GMRES + Sylvester-SMW preconditioner linear solver path
    (reference ``wep_small.jl:56-62``)."""
    nep = wep_jarlebring
    lam0 = -3 - 3.5j
    precond = wep_generate_preconditioner(nep, 3 * 7, lam0)
    solver = WEPGMRESLinSolver(nep, lam0, preconditioner=precond, reltol=1e-10)
    rng = np.random.default_rng(2)
    b = rng.standard_normal(nep.n) + 0j
    x = np.asarray(solver.solve(b))
    r = np.asarray(compute_Mlincomb(nep, lam0, x))
    assert np.linalg.norm(r - b) / np.linalg.norm(b) < 1e-8


@pytest.mark.slow
def test_wep_jarlebring_iar(wep_jarlebring):
    """iar finds 3 eigenpairs including lam_ref within 100 iterations
    (reference ``wep_small.jl:66-76``)."""
    nep = wep_jarlebring
    lams, Q, V = neptpu.iar(nep, sigma=-3 - 3.5j, neigs=3, maxit=100,
                            v=np.ones(nep.n) / np.sqrt(nep.n), tol=1e-8,
                            linsolvercreator=WEPLinSolverCreator(solver_type=":factorized"))
    lams = np.asarray(lams)
    assert len(lams) >= 3
    assert np.min(np.abs(lams - JARLEBRING_REF)) < 1e-10


@pytest.mark.slow
def test_wep_spmf_complex_as_real_iar():
    """TPU-resident WEP path: the SPMF form (Q0/Q1/Q2 + 2nz complex rank-one
    sqrt terms) through the complex-as-real IAR with the mixed bank — spectra
    must match the complex iar on the same NEP (CPU f64; the identical
    kernel runs on the real-only chip)."""
    import jax.numpy as jnp

    from neptpu.solvers.iar import iar
    from neptpu.solvers.spmf_real import iar_real_spmf

    nep = nep_gallery("waveguide", nx=11, nz=7, benchmark_problem="TAUSCH",
                      neptype="SPMF")
    sigma = -1.3 - 0.31j
    m = 70
    lam_c, _, _ = iar(nep, sigma=sigma, neigs=2, maxit=m,
                      v=np.ones(nep.n), tol=1e-7)
    lam_r, Q_r = iar_real_spmf(nep, sigma=sigma, maxit=m, neigs=2,
                               tol=1e-7, dtype=jnp.float64,
                               check_error_every=20)
    lam_c = np.asarray(lam_c)
    assert len(lam_r) >= 2
    for la in lam_r[:2]:
        # same modes; agreement limited by the eigenvalue conditioning
        assert min(abs(la - lam_c)) < 1e-4, (la, lam_c)
    for s in range(min(2, len(lam_r))):
        r = float(compute_resnorm(nep, lam_r[s], jnp.asarray(Q_r[:, s])))
        assert r < 1e-5
