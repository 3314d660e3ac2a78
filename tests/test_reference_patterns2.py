"""Second batch of reference test patterns (round 5): interpolation
(``test/interpolation.jl``), the Rayleigh functional (``test/compute_rf.jl``),
function-handle creator consistency (``test/nep_creator_helpers.jl``) and
SPMF compute-function stability (``test/spmf_stability.jl``)."""
import numpy as np
import pytest

import jax.numpy as jnp

import neptpu
from neptpu import (DEP, Mder_Mlincomb_NEP, Mder_NEP, SPMF_NEP,
                    compute_Mlincomb, compute_resnorm, interpolate)
from neptpu.ops import matfun


# -- test/interpolation.jl: Newton on the interpolating PEP ------------------

def test_interpolate_dep_degree2():
    """Newton's eigenvalue of dep0 is reproduced by Newton on the PEP
    interpolating M(lam) at 3 points around it (``interpolation.jl:10-21``)."""
    nep = neptpu.nep_gallery("dep0")
    n = nep.n
    lam1, x1 = neptpu.newton(nep, lam=-0.75, v=np.ones(n), maxit=40)
    assert float(compute_resnorm(nep, lam1, x1)) < 1e-12

    pep = interpolate(nep, [lam1 - 1, lam1, lam1 + 1])
    lam2, x2 = neptpu.newton(pep, lam=-0.75, v=np.ones(n), maxit=40)
    assert float(compute_resnorm(pep, lam2, x2)) < 1e-12
    assert abs(lam1 - lam2) / abs(lam1) < 1e-12


def test_interpolate_dep_degree8_complex_points():
    """Degree-8 interpolation at complex points reproduces the same
    eigenvalue (``interpolation.jl:23-28``)."""
    nep = neptpu.nep_gallery("dep0")
    n = nep.n
    lam1, _ = neptpu.newton(nep, lam=-0.75, v=np.ones(n), maxit=40)
    pts = [lam1 - 5, lam1 - 1, lam1, lam1 + 5, lam1 + 1,
           lam1 + 5j, lam1 + 1j, lam1 - 5j, lam1 - 1j]
    pep = interpolate(nep, pts)
    lam2, x2 = neptpu.newton(pep, lam=-0.75, v=np.ones(n), maxit=40)
    assert float(compute_resnorm(pep, lam2, x2)) < 1e-11
    assert abs(lam1 - lam2) / abs(lam1) < 1e-10


# -- test/compute_rf.jl: the Rayleigh functional -----------------------------

def _rf_dep():
    r = np.arange(1, 6, dtype=float)
    A0 = np.outer(r, r)
    A1 = np.outer(r, np.arange(3, 8, dtype=float)) + np.eye(5)
    return DEP([A0, A1])


def test_compute_rf_scalar_newton():
    """s = rf(x) makes x' M(s) x = 0 (``compute_rf.jl:12-16``)."""
    nep = _rf_dep()
    x = np.ones(5)
    s = neptpu.compute_rf(complex, nep, x, lam=-0.5 + 3j)[0]
    val = x @ np.asarray(compute_Mlincomb(nep, s, x))
    assert abs(val) < 1e-10


def test_compute_rf_two_sided():
    """With a left vector y: y' M(s) x = 0 (``compute_rf.jl:18-23``)."""
    nep = _rf_dep()
    x = np.ones(5)
    y = np.zeros(5)
    y[0] = 3.0
    s = neptpu.compute_rf(complex, nep, x, y=y, lam=-0.5 + 3j)[0]
    val = y @ np.asarray(compute_Mlincomb(nep, s, x))
    assert abs(val) < 1e-10


# -- test/nep_creator_helpers.jl: handle NEPs vs the SPMF they wrap ----------

def _A0A1():
    A0 = np.ones((3, 3))
    A1 = 3.0 * np.ones((3, 3))
    A1[1, 2] = 0.0
    return A0, A1


def _my_mder(s, der=0):
    """exp(3s) A0 + A1/(3.3+s), with analytic derivatives
    (``nep_creator_helpers.jl:8-13``)."""
    A0, A1 = _A0A1()
    from math import factorial
    return ((3.0 ** der) * np.exp(3 * s) * A0
            + factorial(der) * ((-1.0) ** der) * A1 / (3.3 + s) ** (der + 1))


def test_mder_nep_matches_spmf():
    A0, A1 = _A0A1()
    nep_ref = SPMF_NEP(
        [A0, A1],
        [lambda S: matfun.expm(3.0 * jnp.asarray(S)),
         lambda S: matfun.inv(jnp.asarray(S) + 3.3 * matfun.eye_like(S))])
    nep = Mder_NEP(3, _my_mder)

    M4 = np.asarray(nep.Mder_dense(3.3, 4))
    M4_ref = np.asarray(nep_ref.Mder_dense(3.3, 4))
    assert np.linalg.norm(M4 - M4_ref) / np.linalg.norm(M4_ref) < 1e-8

    lam = -1.2 + 0.2j
    X = np.array([[-0.715845, 0.865534, 0.254796],
                  [-0.856405, -0.482516, 0.0265129],
                  [1.02593, -0.62892, -2.09615]])
    z = np.asarray(compute_Mlincomb(nep, lam, X))
    z_ref = np.asarray(compute_Mlincomb(nep_ref, lam, X))
    assert np.linalg.norm(z - z_ref) / np.linalg.norm(z_ref) < 1e-10


def test_mder_mlincomb_nep_matches_mder_nep():
    """A user Mlincomb callback must agree with the Mder fallback
    (``nep_creator_helpers.jl:28-41``)."""
    def my_mlincomb(s, X, a, startder):
        z = np.zeros(3, dtype=complex)
        for k in range(np.asarray(X).shape[1]):
            z = z + np.asarray(a)[k] * (
                _my_mder(s, k + startder) @ np.asarray(X)[:, k])
        return z

    nep = Mder_NEP(3, _my_mder)
    nep_ml = Mder_Mlincomb_NEP(3, _my_mder, my_mlincomb)
    lam = -1.2 + 0.2j
    X = np.array([[-0.715845, 0.865534, 0.254796],
                  [-0.856405, -0.482516, 0.0265129],
                  [1.02593, -0.62892, -2.09615]])
    z1 = np.asarray(compute_Mlincomb(nep, lam, X))
    z2 = np.asarray(compute_Mlincomb(nep_ml, lam, X))
    assert np.linalg.norm(z1 - z2) / np.linalg.norm(z1) < 1e-12


# -- test/spmf_stability.jl: MM/Mlincomb consistency across scalar types -----

def test_spmf_mm_mlincomb_type_stability():
    n, m, t = 5, 4, 3.0
    rng = np.random.default_rng(1)
    A0 = rng.standard_normal((n, n))
    A1 = rng.standard_normal((n, n))
    J = np.eye(n)
    nep = SPMF_NEP([J, A0, A1],
                   [lambda S: -jnp.asarray(S), matfun.eye_like,
                    lambda S: matfun.expm(-t * jnp.asarray(S))])

    V = rng.standard_normal((n, m))
    S = rng.standard_normal((m, m))
    # MM with a matrix argument runs, and for S = lam*I it collapses to
    # the 0th-derivative action
    MM = np.asarray(neptpu.compute_MM(nep, S, V))
    assert MM.shape == (n, m)
    lam = 3.0
    MM_diag = np.asarray(neptpu.compute_MM(nep, lam * np.eye(m), V))
    M = np.asarray(nep.Mder_dense(lam))
    assert np.linalg.norm(MM_diag - M @ V) / np.linalg.norm(M @ V) < 1e-8

    # Mlincomb at real and complex lam: single dtype-stable code path
    for lam in (3.0, 3.0 + 1.0j):
        z = np.asarray(compute_Mlincomb(nep, lam, V))
        zd = sum(np.asarray(nep.Mder_dense(lam, j)) @ V[:, j]
                 for j in range(m))
        assert np.linalg.norm(z - zd) / np.linalg.norm(zd) < 1e-8


# -- round-5 regression: RF Newton divergence must not crash -----------------

def test_resinv_divergence_reports_nonconvergence():
    """resinv far outside its basin on dep0 must raise NoConvergenceException
    with partial results — not OverflowError from abs() of a huge complex
    step (r5 verify-drive regression)."""
    from neptpu.core.exceptions import NoConvergenceException
    nep = neptpu.nep_gallery("dep0")
    try:
        lam, v = neptpu.resinv(nep, lam=-0.7, v=np.ones(nep.n), tol=1e-11)
        # convergence from here would also be acceptable
        assert float(neptpu.compute_resnorm(nep, lam, v)) < 1e-9
    except NoConvergenceException as e:
        assert e.lam is not None  # partial results carried


# -- test/transf.jl: eigenvalue-level transform roundtrip + realness ---------

def test_shift_and_scale_eigenvalue_roundtrip():
    """Solve the TRANSFORMED problem, map the eigenvalue back through
    lam = scale*mu + shift, and check the residual in the ORIGINAL problem
    (``transf.jl:44-54``)."""
    nep = neptpu.nep_gallery("qdep0")
    lam0, v0 = neptpu.quasinewton(nep, lam=1 + 1j, v=np.ones(nep.n),
                                  maxit=200, tol=1e-11)
    sh, sc = -3 + 0.3j, 0.9
    from neptpu import shift_and_scale
    nept = shift_and_scale(nep, shift=sh, scale=sc)
    # the known pair transforms into the new coordinates: the residual in
    # the transformed problem equals the (relative) original residual
    v0 = np.asarray(v0)
    nv = np.linalg.norm(v0)
    r = np.linalg.norm(np.asarray(
        compute_Mlincomb(nept, (lam0 - sh) / sc, v0))) / nv
    r0 = np.linalg.norm(np.asarray(
        compute_Mlincomb(nep, lam0, v0))) / nv
    assert r < max(2 * r0, 1e-10)
    # Krylov on the transformed problem maps back to original residuals
    lams, V, _ = neptpu.iar(nept, sigma=0.0, neigs=2, maxit=60,
                            v=np.ones(nep.n), tol=1e-10)
    for mu, x in zip(np.asarray(lams), np.asarray(V).T):
        x = np.asarray(x)
        rr = np.linalg.norm(np.asarray(
            compute_Mlincomb(nep, sc * complex(mu) + sh, x)))
        # ||M(lam)|| ~ 124 on qdep0, so 1e-5 raw is ~1e-7 backward
        assert rr / np.linalg.norm(x) < 1e-5


def test_shift_and_scale_preserves_realness():
    """A real PEP under a REAL shift/scale stays real
    (``transf.jl:38-42``)."""
    from neptpu import shift_and_scale
    pep = neptpu.nep_gallery("pep0", 10)
    pept = shift_and_scale(pep, shift=3.0, scale=1.0)
    for A in pept.get_Av():
        assert not np.iscomplexobj(np.asarray(A))


# -- test/neptypes.jl: construction-time matrix-function contract check ------

def test_spmf_scalar_function_rejected_at_construction():
    """A term function returning a scalar (not a matrix) must be caught at
    construction (the reference warns via @code_typed inspection,
    ``neptypes.jl:14-17``; here it is a hard error)."""
    rng = np.random.default_rng(0)
    Av = [rng.standard_normal((3, 3)) for _ in range(2)]
    with pytest.raises(ValueError):
        SPMF_NEP(Av, [lambda S: 1, lambda S: -jnp.asarray(S)],
                 check_consistency=True)
