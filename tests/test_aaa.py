"""AAAeigs tests (reference ``test/AAAeigs.jl`` analogues)."""
import numpy as np
import pytest

import neptpu
from neptpu import AAAeigs, svAAA, nep_gallery


def test_svaaa_approximates():
    nep = nep_gallery("nlevp_native_loaded_string")
    Z = np.linspace(0.01, 50, 300) + 0j
    z, fz, w, err, *_ = svAAA(nep, Z)
    assert err[-1] < 1e-10
    # barycentric interpolant reproduces f values at sample points
    from neptpu.solvers.aaa import reval
    from neptpu.models.spmf import fun_scalar

    fv = nep.get_fv()
    pts = np.array([5.3 + 0j, 17.2 + 0j])
    R = reval(pts, z, fz, w)
    for j, f in enumerate(fv):
        for i, p in enumerate(pts):
            assert abs(R[i, j] - complex(fun_scalar(f, p))) < 1e-8


def test_aaaeigs_loaded_string():
    nep = nep_gallery("nlevp_native_loaded_string", 20, 1.0, 1.0)
    Z = np.linspace(0.01, 50, 400) + 0j
    lam, X, res, _ = AAAeigs(nep, Z, neigs=3, shifts=[4.0 + 0j, 20.0 + 0j],
                             maxit=40, check_error_every=5)
    lam = np.asarray(lam)
    assert len(lam) == 3
    assert np.all(np.asarray(res) < 1e-6)
    for i in range(3):
        smin = np.linalg.svd(np.asarray(nep.Mder_dense(lam[i])), compute_uv=False)[-1]
        assert smin < 1e-10


def test_aaaeigs_pep_plus_spmf():
    """Exercises the general-case (polynomial + nonlinear) compact pencil."""
    rng = np.random.default_rng(0)
    n = 30
    pep = neptpu.PEP([rng.standard_normal((n, n)), rng.standard_normal((n, n))])
    spmf = neptpu.SPMF_NEP([rng.standard_normal((n, n)) / 5], [neptpu.matfun.expm])
    nep = neptpu.SumNEP(pep, spmf)
    th = np.linspace(0, 2 * np.pi, 300, endpoint=False)
    lam, X, res, _ = AAAeigs(nep, 2.0 * np.exp(1j * th), neigs=3,
                             shifts=[0.0 + 0j], maxit=40, check_error_every=5)
    lam = np.asarray(lam)
    for i in range(len(lam)):
        smin = np.linalg.svd(np.asarray(nep.Mder_dense(lam[i])), compute_uv=False)[-1]
        assert smin < 1e-10
