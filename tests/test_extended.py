"""Extended-precision (BigFloat-parity) tests.

Mirror of the reference's ``test/bigfloats.jl``: build the same 4x4 PEP in
arbitrary precision, converge Newton to ~eps(prec)*100, and check that the
float64 solver path agrees with the high-precision oracle — the reference's
"BigFloat precomputation then compare against machine types" pattern.
"""
import numpy as np
import pytest

import neptpu
from neptpu import PEP, DEP
from neptpu.utils.extended import (
    augnewton_mp,
    mp_from_nep,
    newton_mp,
    resnorm_mp,
)


def _bigfloat_pep():
    # reference test/bigfloats.jl:10-19
    A0 = np.ones((4, 4)) - np.eye(4)
    u = np.arange(1.0, 5.0)
    v = u - 2
    A1 = np.outer(u, v)
    A2 = np.eye(4)
    A2[1, 0] = np.pi
    return PEP([A0, A1, A2])


def test_newton_mp_converges_beyond_f64():
    import mpmath as mp

    nep = _bigfloat_pep()
    mpnep = mp_from_nep(nep, prec=256)
    lam, v = newton_mp(mpnep, lam0=0.2, v0=np.ones(4), prec=256)
    res = resnorm_mp(mpnep, lam, v)
    assert res < mp.mpf(2) ** (1 - 200)  # far beyond double precision

    # f64 solver path must agree with the high-precision oracle
    lam64, v64 = neptpu.augnewton(nep, lam=0.2, v=np.ones(4), maxit=100)
    assert abs(complex(lam) - complex(lam64)) < 1e-12


def test_mp_dep_matches_f64_path():
    rng = np.random.default_rng(0)
    A = [rng.standard_normal((3, 3)), rng.standard_normal((3, 3))]
    nep = DEP(A, tauv=[0.0, 1.0])
    mpnep = mp_from_nep(nep, prec=128)

    lam = 0.3 + 0.1j
    M_mp = mpnep.mder(lam, 0)
    M64 = np.asarray(nep.Mder(lam, 0))
    M_mp_np = np.array([[complex(M_mp[i, j]) for j in range(3)] for i in range(3)])
    assert np.linalg.norm(M_mp_np - M64) < 1e-13 * np.linalg.norm(M64)

    # first derivative against the f64 analytic derivative
    Md_mp = mpnep.mder(lam, 1)
    Md64 = np.asarray(nep.Mder(lam, 1))
    Md_mp_np = np.array([[complex(Md_mp[i, j]) for j in range(3)] for i in range(3)])
    assert np.linalg.norm(Md_mp_np - Md64) < 1e-12 * np.linalg.norm(Md64)


def test_newton_mp_nonconvergence_carries_partial_results():
    nep = _bigfloat_pep()
    mpnep = mp_from_nep(nep, prec=128)
    with pytest.raises(neptpu.NoConvergenceException) as ei:
        newton_mp(mpnep, lam0=1e6, v0=np.ones(4), maxit=2, prec=128)
    assert ei.value.lam is not None and ei.value.v is not None
