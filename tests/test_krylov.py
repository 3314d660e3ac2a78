"""Krylov-layer tests (reference ``test/iar.jl``, ``test/tiar.jl``,
``test/companion.jl``, ``test/proj.jl``, ``test/cheb.jl``)."""
import jax.numpy as jnp
import numpy as np
import pytest

import neptpu
from neptpu import (
    ChebPEP,
    DGKS,
    ModifiedGS,
    compute_Mder,
    compute_Mlincomb,
    compute_resnorm,
    create_proj_NEP,
    iar,
    nep_gallery,
    orthogonalize_and_normalize,
    polyeig,
    tiar,
)


def test_orthogonalization_methods():
    rng = np.random.default_rng(0)
    V, _ = np.linalg.qr(rng.standard_normal((50, 5)))
    w = rng.standard_normal(50)
    for method in (DGKS(), ModifiedGS(), None):
        wout, h, beta = orthogonalize_and_normalize(jnp.asarray(V), jnp.asarray(w), method)
        Z = np.column_stack([V, np.asarray(wout)])
        assert np.linalg.norm(Z.conj().T @ Z - np.eye(6)) < 1e-12
        # reconstruction: w = V h + beta * wout
        np.testing.assert_allclose(
            V @ np.asarray(h) + float(np.real(beta)) * np.asarray(wout), w, atol=1e-10
        )


@pytest.mark.slow
def test_iar_dep0():
    nep = nep_gallery("dep0")
    lams, Q, V = iar(nep, sigma=0.0, neigs=3, maxit=50, v=np.ones(nep.n), tol=1e-10)
    assert len(np.asarray(lams)) >= 3
    for i in range(len(np.asarray(lams))):
        r = float(compute_resnorm(nep, np.asarray(lams)[i], Q[:, i]))
        assert r / float(jnp.linalg.norm(Q[:, i])) < 1e-9
    # basis orthonormality (reference checks opnorm(V'V - I) small)
    Vn = np.asarray(V)
    G = Vn.conj().T @ Vn
    assert np.linalg.norm(G - np.eye(G.shape[0])) < 1e-8


@pytest.mark.slow
def test_tiar_matches_iar():
    nep = nep_gallery("dep0", 40)
    l1, Q1, _ = iar(nep, sigma=0.0, neigs=4, maxit=40, v=np.ones(nep.n), tol=1e-10)
    l2, Q2, _ = tiar(nep, sigma=0.0, neigs=4, maxit=40, v=np.ones(nep.n), tol=1e-10)
    l1 = np.asarray(l1)
    l2 = np.asarray(l2)
    # the two methods may pick different members of a conjugate pair when
    # truncating to neigs; match each iar value to its nearest tiar value
    # up to conjugation
    for lam in l1:
        d = min(np.min(np.abs(l2 - lam)), np.min(np.abs(l2 - np.conj(lam))))
        assert d < 1e-6


@pytest.mark.slow
def test_iar_pep0():
    nep = nep_gallery("pep0", 60)
    lams, Q, _ = iar(nep, sigma=0.0, neigs=3, maxit=60, v=np.ones(nep.n), tol=1e-9)
    for i in range(len(np.asarray(lams))):
        r = float(compute_resnorm(nep, np.asarray(lams)[i], Q[:, i]))
        assert r / float(jnp.linalg.norm(Q[:, i])) < 1e-6


def test_polyeig_real_quadratic():
    nep = nep_gallery("real_quadratic")
    lams, V = polyeig(nep)
    lams = np.asarray(lams)
    oracles = [-2051.741417993845, -182.101627437811, -39.344930222838, -4.039879577113]
    for t in oracles:
        assert np.min(np.abs(lams - t)) < 1e-6 * abs(t)


def test_polyeig_pep0_residuals():
    nep = nep_gallery("pep0", 30)
    lams, V = polyeig(nep)
    lams = np.asarray(lams)
    V = np.asarray(V)
    # check a couple of eigenpairs
    for i in [0, 5, 11]:
        r = float(compute_resnorm(nep, lams[i], jnp.asarray(V[:, i])))
        assert r / np.linalg.norm(V[:, i]) < 1e-8


def test_chebpep_interpolation():
    nep = nep_gallery("dep0")
    cheb = ChebPEP(nep, 9, -3.0, 1.0)
    # exact at the interpolation nodes; small truncation error elsewhere
    from neptpu.models.cheb import chebyshev_nodes

    for x in chebyshev_nodes(-3.0, 1.0, 9)[:3]:
        M1 = np.asarray(nep.Mder_dense(float(x)))
        M2 = np.asarray(cheb.Mder_dense(float(x)))
        assert np.linalg.norm(M1 - M2) < 1e-10
    for x in [-2.0, -0.5, 0.7]:
        M1 = np.asarray(nep.Mder_dense(x))
        M2 = np.asarray(cheb.Mder_dense(x))
        assert np.linalg.norm(M1 - M2) < 1e-3
    # colleague-matrix polyeig on the ChebPEP (reference docstring flow)
    lams, V = polyeig(cheb)
    lams = np.asarray(lams)
    ii = np.argmin(np.abs(lams))
    r = float(compute_resnorm(cheb, lams[ii], jnp.asarray(np.asarray(V)[:, ii])))
    assert r < 1e-10
    # and it approximates the original NEP
    r_org = float(compute_resnorm(nep, lams[ii], jnp.asarray(np.asarray(V)[:, ii])))
    assert r_org < 1e-4


def test_projection_equivalence():
    nep = nep_gallery("pep0", 40)
    rng = np.random.default_rng(1)
    V = np.linalg.qr(rng.standard_normal((40, 3)))[0]
    W = np.linalg.qr(rng.standard_normal((40, 3)))[0]
    pnep = create_proj_NEP(nep)
    pnep.set_projectmatrices(W, V)
    lam = 0.3 + 0.1j
    direct = W.conj().T @ np.asarray(nep.Mder_dense(lam)) @ V
    proj = np.asarray(pnep.Mder_dense(lam))
    np.testing.assert_allclose(proj, direct, rtol=1e-10, atol=1e-12)
    # expand by one vector: border update equals fresh projection
    vnew = rng.standard_normal(40)[:, None]
    wnew = rng.standard_normal(40)[:, None]
    Vn = np.hstack([V, vnew])
    Wn = np.hstack([W, wnew])
    pnep.expand_projectmatrices(Wn, Vn)
    direct = Wn.conj().T @ np.asarray(nep.Mder_dense(lam)) @ Vn
    np.testing.assert_allclose(np.asarray(pnep.Mder_dense(lam)), direct, rtol=1e-10, atol=1e-12)


def test_iar_proj_solve():
    nep = nep_gallery("dep0")
    from neptpu import NewtonInnerSolver

    lams, Q, _ = iar(nep, sigma=0.0, neigs=2, maxit=40, v=np.ones(nep.n),
                     tol=1e-10, proj_solve=True, check_error_every=5,
                     inner_solver_method=NewtonInnerSolver())
    for i in range(len(np.asarray(lams))):
        r = float(compute_resnorm(nep, np.asarray(lams)[i], Q[:, i]))
        assert r / float(jnp.linalg.norm(Q[:, i])) < 1e-8


def test_iar_jitted_matches_iar():
    """The fully-compiled lax.scan IAR (padded buffers, no host round-trips)
    reproduces the Python-loop IAR spectra."""
    from neptpu import iar_jitted

    nep = nep_gallery("dep0")
    l1, Q1, _ = iar(nep, sigma=0.0, neigs=3, maxit=40, v=np.ones(5), tol=1e-10)
    l2, Q2, _ = iar_jitted(nep, sigma=0.0, neigs=3, maxit=40, v=np.ones(5), tol=1e-10)
    l1 = np.asarray(l1)
    l2 = np.asarray(l2)
    assert len(l2) >= 3
    for lam in l1:
        d = min(np.min(np.abs(l2 - lam)), np.min(np.abs(l2 - np.conj(lam))))
        assert d < 1e-8
    for i in range(len(l2)):
        assert float(compute_resnorm(nep, l2[i], np.asarray(Q2)[:, i])) < 1e-8
