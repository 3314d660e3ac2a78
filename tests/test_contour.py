"""Contour-integral tests (reference ``test/beyn.jl``, ``test/block_SS.jl``,
``test/dep_distributed.jl``)."""
import jax.numpy as jnp
import numpy as np
import pytest

import neptpu
from neptpu import (
    MatrixGaussLegendre,
    MatrixTrapezoidal,
    compute_resnorm,
    contour_beyn,
    contour_block_SS,
    integrate_interval,
    nep_gallery,
)
from neptpu.models.gallery.distributed import DEP_DISTRIBUTED_EIGENVALUES


def test_dep_distributed_oracles():
    """The hard-coded reference eigenvalues are reproduced: M(lam_ref) is
    singular to machine precision and Newton from a nearby start converges to
    them (reference ``test/dep_distributed.jl:7-17,53-60``)."""
    nep = nep_gallery("dep_distributed")
    for lam_ref in DEP_DISTRIBUTED_EIGENVALUES:
        smin = np.linalg.svd(np.asarray(nep.Mder_dense(lam_ref)), compute_uv=False)[-1]
        assert smin < 1e-9
    for lam_ref in DEP_DISTRIBUTED_EIGENVALUES[:4]:
        lam, v = neptpu.augnewton(
            nep, lam=lam_ref + 1e-3, v=np.ones(3), tol=1e-13, maxit=100,
            armijo_factor=0.5,
        )
        assert abs(complex(lam) - lam_ref) < 100 * np.finfo(float).eps * abs(lam_ref)


def test_integrate_interval_scalarlike():
    # int_0^{2pi} cos(t)*1 dt = 0;  int_0^{2pi} cos(t)*cos(t) dt = pi
    f = lambda t: np.array([[np.cos(t)]])
    gv = [lambda s: 1.0, lambda s: np.cos(s)]
    S = integrate_interval(MatrixTrapezoidal, complex, f, gv, 0, 2 * np.pi, 200)
    assert abs(S[0, 0, 0]) < 1e-12
    assert abs(S[0, 0, 1] - np.pi) < 1e-10
    S2 = integrate_interval(MatrixGaussLegendre, complex, f, gv, 0, 2 * np.pi, 60)
    assert abs(S2[0, 0, 1] - np.pi) < 1e-10


def test_contour_beyn_dep_distributed():
    nep = nep_gallery("dep_distributed")
    lams, V = contour_beyn(nep, sigma=0.0, radius=1.5, neigs=2, N=64, k=3,
                           sanity_check=False)
    lams = np.asarray(lams)
    # should find the conjugate pair -0.4002 +/- 0.9706i inside the contour
    pair = DEP_DISTRIBUTED_EIGENVALUES[:2]
    for t in pair:
        assert np.min(np.abs(lams - t)) < 1e-6
    for i in range(2):
        r = float(compute_resnorm(nep, lams[i], jnp.asarray(np.asarray(V)[:, i])))
        assert r < 1e-6


def test_contour_beyn_batched_equals_loop():
    """Batched shifted-solve path == generic integrator loop path
    (the 'same math two ways' testing template)."""
    nep = nep_gallery("dep0")
    l1, V1 = contour_beyn(nep, sigma=-0.16, radius=0.3, neigs=1, N=50, k=2,
                          sanity_check=False)
    l2, V2 = contour_beyn(nep, sigma=-0.16, radius=0.3, neigs=1, N=50, k=2,
                          sanity_check=False, integrator=MatrixTrapezoidal)
    np.testing.assert_allclose(np.asarray(l1)[0], np.asarray(l2)[0], rtol=1e-10)
    assert abs(np.asarray(l1)[0] - (-0.15955391823299267)) < 1e-8


def test_contour_block_SS_dep_distributed():
    nep = nep_gallery("dep_distributed")
    lams, V = contour_block_SS(nep, sigma=0.0, radius=1.5, k=2, K=2, N=64)
    lams = np.asarray(lams)
    for t in DEP_DISTRIBUTED_EIGENVALUES[:2]:
        assert np.min(np.abs(lams - t)) < 1e-6


def test_contour_block_SS_jsiam_mode():
    nep = nep_gallery("dep0")
    lams, V = contour_block_SS(nep, sigma=-0.1, radius=0.3, k=2, K=2, N=64,
                               Shat_mode=":JSIAM")
    lams = np.asarray(lams)
    assert np.min(np.abs(lams - (-0.15955391823299267))) < 1e-6
