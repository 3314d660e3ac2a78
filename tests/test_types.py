"""Tests for SumNEP / LowRank / DerSPMF / REP / Mder_NEP / data-file gallery."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

import neptpu
from neptpu import (
    DEP,
    PEP,
    REP,
    DerSPMF,
    LowRankFactorizedNEP,
    Mder_NEP,
    SPMF_NEP,
    SumNEP,
    compute_Mder,
    compute_Mlincomb,
    compute_resnorm,
    matfun,
    nep_gallery,
)

RNG = np.random.default_rng(5)

from neptpu.models.gallery.examples import data_dir
HAS_DATA = os.path.exists(os.path.join(data_dir(), "converted_misc"))


def test_sumnep_mder():
    nep1 = DEP([np.ones((3, 3)), RNG.standard_normal((3, 3))])
    nep2 = PEP([np.ones((3, 3)), RNG.standard_normal((3, 3)), RNG.standard_normal((3, 3))])
    s = SumNEP(nep1, nep2)
    lam = 3.0
    M = np.asarray(s.Mder_dense(lam))
    M12 = np.asarray(nep1.Mder_dense(lam)) + np.asarray(nep2.Mder_dense(lam))
    np.testing.assert_allclose(M, M12, rtol=1e-12)
    # SPMF-ness is preserved: get_Av/get_fv concatenate
    assert len(s.get_Av()) == len(nep1.get_Av()) + len(nep2.get_Av())
    v = RNG.standard_normal((3, 2))
    z1 = np.asarray(compute_Mlincomb(s, 0.4, v))
    z2 = np.asarray(compute_Mlincomb(nep1, 0.4, v)) + np.asarray(compute_Mlincomb(nep2, 0.4, v))
    np.testing.assert_allclose(z1, z2, rtol=1e-12)


def test_lowrank_factorized():
    L = RNG.standard_normal((5, 1))
    U = RNG.standard_normal((5, 1))
    nep = LowRankFactorizedNEP([L], [U], [matfun.expm])
    X = RNG.standard_normal((5, 2))
    z = np.asarray(compute_Mlincomb(nep, 0.0, X))
    want = (L @ U.T @ X) @ np.ones(2)
    np.testing.assert_allclose(z, want, atol=1e-13)
    assert nep.r == 1


def test_derspmf_fast_path():
    A0 = np.array([[1.0, 3], [4, 5]])
    A1 = np.array([[3.0, 4], [5, 6]])
    nep = SPMF_NEP([A0, A1], [matfun.eye_like, matfun.expm])
    sigma = 3.3
    dnep = DerSPMF(nep, sigma, 5)
    V = RNG.standard_normal((2, 5))
    z1 = np.asarray(compute_Mlincomb(dnep, sigma, V))
    z2 = np.asarray(compute_Mlincomb(nep, sigma, V))
    np.testing.assert_allclose(z1, z2, rtol=1e-9)
    # off-shift falls back
    z3 = np.asarray(compute_Mlincomb(dnep, 1.1, V))
    z4 = np.asarray(compute_Mlincomb(nep, 1.1, V))
    np.testing.assert_allclose(z3, z4, rtol=1e-9)


def test_rep():
    """Reference docstring flow (``NEPTypes.jl:533-544``)."""
    A0 = np.array([[1.0, 2], [3, 4]])
    A1 = np.array([[3.0, 4], [5, 6]])
    nep = REP([A0, A1], [1, 3], [4, 5, 6])
    lam, x = neptpu.quasinewton(nep, v=[1.0, 0.0], tol=1e-12, maxit=100)
    lam = complex(lam)
    assert abs(lam - (-0.3689603779201249)) < 1e-8
    x = np.asarray(x)
    resid = -lam * x + A0 @ x + A1 @ x * (lam - 1) * (lam - 3) / ((lam - 4) * (lam - 5) * (lam - 6))
    assert np.linalg.norm(resid) < 1e-10 * np.linalg.norm(x)


def test_mder_nep_wrapper():
    A = RNG.standard_normal((4, 4))
    B = RNG.standard_normal((4, 4))

    def mder(lam, der):
        # M(lam) = A + lam^2 B
        if der == 0:
            return A + lam**2 * B
        if der == 1:
            return 2 * lam * B
        if der == 2:
            return 2 * B + 0 * A
        return 0 * A

    nep = Mder_NEP(4, mder)
    lam = 0.7 + 0.1j
    v = RNG.standard_normal(4)
    z = np.asarray(compute_Mlincomb(nep, lam, v[:, None], np.ones(1), startder=1))
    np.testing.assert_allclose(z, 2 * lam * (B @ v), rtol=1e-12)


@pytest.mark.skipif(not HAS_DATA, reason="gallery data files not present")
def test_qdep0_quasinewton():
    """Reference docstring oracle: resinv/quasinewton on qdep0 from lam=-2
    converges (``LinSolvers.jl:54-62``, ``method_newton.jl`` docstring)."""
    nep = nep_gallery("qdep0")
    lam, v = neptpu.quasinewton(nep, lam=-2.0, v=np.ones(nep.n), tol=100 * np.finfo(float).eps, maxit=200)
    r = float(compute_resnorm(nep, lam, v)) / float(jnp.linalg.norm(v))
    assert r < 1e-9


@pytest.mark.skipif(not HAS_DATA, reason="gallery data files not present")
def test_sine_nep_structure():
    nep = nep_gallery("sine")
    assert nep.n == 1000
    # FD-derivative consistency on the sum type
    lam = 0.1
    eps = 1e-6
    v = RNG.standard_normal(nep.n)
    Mp = np.asarray(nep.Mder_dense(lam + eps))
    Mm = np.asarray(nep.Mder_dense(lam - eps))
    fd = (Mp - Mm) @ v / (2 * eps)
    an = np.asarray(compute_Mlincomb(nep, lam, v[:, None], np.ones(1), startder=1))
    np.testing.assert_allclose(an, fd, rtol=1e-4, atol=1e-4)


def test_schrodinger_movebc():
    nep = nep_gallery("schrodinger_movebc", 200)
    lam = -3.0  # on the real axis left of V0 branch issues? use S+V0>0
    v = RNG.standard_normal(nep.n)
    # consistency: Mlincomb == Mder @ v
    z1 = np.asarray(compute_Mlincomb(nep, lam, v[:, None], np.ones(1)))
    z2 = np.asarray(nep.Mder_dense(lam)) @ v
    np.testing.assert_allclose(z1, z2, rtol=1e-8, atol=1e-8)
