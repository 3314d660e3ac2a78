"""Rational layer tests (reference ``test/nleigs/``, ``test/cork.jl``,
``test/transformations.jl``)."""
import warnings

import jax.numpy as jnp
import numpy as np
import pytest

import neptpu
from neptpu import (
    CORKPencil,
    IarCorkLinearization,
    NleigsCorkLinearization,
    PEP,
    build_pencil,
    compute_Mder,
    compute_resnorm,
    inpolygon,
    lejabagby,
    low_rank_compress,
    mobius_transform,
    nep_gallery,
    nleigs,
    shift_and_scale,
    taylor_expansion_pep,
)

RNG = np.random.default_rng(11)


@pytest.fixture(scope="module")
def pep2x2():
    B = [np.array([[1.0, 3], [5, 6]]), np.array([[3.0, 4], [6, 6]]), np.eye(2)]
    return neptpu.PEP(B)


SIGMA = [-10.0 - 2j, 10 - 2j, 10 + 2j, -10 + 2j]


def _true_eigs(pep):
    B = [np.asarray(A) for A in pep.get_Av()]
    n = B[0].shape[0]
    C = np.block([
        [np.zeros((n, n)), np.eye(n)],
        [-np.linalg.solve(B[2], B[0]), -np.linalg.solve(B[2], B[1])],
    ])
    return np.sort_complex(np.linalg.eigvals(C))


def test_nleigs_basic(pep2x2):
    """reference ``test/nleigs/nleigs_basic.jl:9-19``: 4 lambdas, residual."""
    lam, X, res, _ = nleigs(pep2x2, SIGMA, maxit=10, v=np.ones(2) + 0j, blksize=5)
    lam = np.asarray(lam)
    assert len(lam) == 4
    for i in range(4):
        assert float(compute_resnorm(pep2x2, lam[i], np.asarray(X)[:, i])) < 1e-5
    true = _true_eigs(pep2x2)
    for t in true:
        assert np.min(np.abs(lam - t)) < 1e-8


def test_nleigs_nonconvergent_linearization(pep2x2):
    with pytest.warns(UserWarning, match="Linearization not converged"):
        lam, X, _, _ = nleigs(pep2x2, SIGMA, maxit=10, v=np.ones(2) + 0j,
                              maxdgr=5, blksize=5)
    assert len(np.asarray(lam)) == 4


def test_nleigs_static(pep2x2):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        lam, X, _, _ = nleigs(pep2x2, SIGMA, maxit=10, v=np.ones(2) + 0j,
                              maxdgr=5, blksize=5, static=True)
    assert len(np.asarray(lam)) == 4


@pytest.mark.slow
def test_nleigs_dep0():
    """reference docstring (``nleigs_coefficients.jl:40-48``): dep0 on the
    unit square."""
    nep = nep_gallery("dep0")
    unit_square = [1.0 + 1j, 1.0 - 1j, -1.0 - 1j, -1.0 + 1j]
    lam, X, _, _ = nleigs(nep, unit_square, v=np.ones(5) + 0j)
    lam = np.asarray(lam)
    assert len(lam) >= 1
    for i in range(len(lam)):
        assert float(compute_resnorm(nep, lam[i], np.asarray(X)[:, i])) < 1e-10


def test_lejabagby_properties():
    A = np.exp(2j * np.pi * np.arange(50) / 50)
    B = np.array([np.inf])
    a, b, beta = lejabagby(A, B, A, 10, False, 0)
    assert len(a) == 10 and len(b) == 10 and len(beta) == 10
    assert len(np.unique(np.round(a, 12))) == 10  # distinct nodes
    assert np.all(np.isinf(np.real(b)) | np.isinf(b))


def test_inpolygon():
    square_x = [-1.0, 1.0, 1.0, -1.0]
    square_y = [-1.0, -1.0, 1.0, 1.0]
    assert inpolygon(0.0, 0.0, square_x, square_y)
    assert not inpolygon(2.0, 0.0, square_x, square_y)
    assert inpolygon(1.0, 1.0, square_x, square_y)  # vertex


def test_cork_pencil_iar():
    """reference ``lowRankCompress`` docstring flow: DEP via IAR-CORK."""
    A0 = np.array([[1.0, 3.0], [-1.0, 2.0]]) / 10
    v = np.array([[-1.0], [1.0]]) / np.sqrt(2)
    nep = neptpu.DEP([A0, v @ v.T], [0.0, 1.0])
    cp = CORKPencil.from_nep(nep, IarCorkLinearization(d=10))
    A, B = build_pencil(cp)
    import scipy.linalg as sla

    w = sla.eig(np.asarray(A), np.asarray(B), right=False)
    w = w[np.isfinite(w)]
    # Taylor linearization at 0 approximates eigenvalues near 0: at least one
    # small-|lam| pencil eigenvalue must be a NEP eigenvalue
    cand = w[np.abs(w) < 1.5]
    smins = [np.linalg.svd(np.asarray(nep.Mder_dense(l)), compute_uv=False)[-1] for l in cand]
    assert min(smins) < 1e-10
    lam = cand[int(np.argmin(smins))]

    # low-rank compression gives the same eigenvalue
    cplr = low_rank_compress(cp, 1, 1)
    AA, BB = build_pencil(cplr)
    w2 = sla.eig(np.asarray(AA), np.asarray(BB), right=False)
    w2 = w2[np.isfinite(w2)]
    assert np.min(np.abs(w2 - lam)) < 1e-8


def test_cork_pencil_nleigs(pep2x2):
    cp = CORKPencil.from_nep(pep2x2, NleigsCorkLinearization(Sigma=SIGMA, maxdgr=20, tollin=1e-10))
    A, B = build_pencil(cp)
    import scipy.linalg as sla

    w = sla.eig(np.asarray(A), np.asarray(B), right=False)
    w = w[np.isfinite(w)]
    true = _true_eigs(pep2x2)
    for t in true:
        assert np.min(np.abs(w - t)) < 1e-7


def test_shift_and_scale():
    """reference docstring: T(lam) = M(scale*lam + shift) for PEP/DEP/SPMF."""
    for name in ["pep0", "dep0", "qdep1"]:
        nep0 = nep_gallery(name) if name != "pep0" else nep_gallery("pep0", 30)
        sh, sc = 3.0, 10.0
        nep1 = shift_and_scale(nep0, shift=sh, scale=sc)
        s = 0.4 + 0.4j
        # the DEP specialization returns M(sc*s + sh)/sc (kept DEP-form;
        # eigenvalues are preserved) — reference NEPTransformations.jl:85-88
        fac = sc if name == "dep0" else 1.0
        M0 = np.asarray(nep0.Mder_dense(sc * s + sh)) / fac
        M1 = np.asarray(nep1.Mder_dense(s))
        assert np.linalg.norm(M0 - M1) / np.linalg.norm(M0) < 1e-10, name
        # first derivative chain rule
        M0d = np.asarray(nep0.Mder_dense(sc * s + sh, 1)) * sc / fac
        M1d = np.asarray(nep1.Mder_dense(s, 1))
        assert np.linalg.norm(M0d - M1d) / np.linalg.norm(M0d) < 1e-9, name


def test_mobius_transform():
    nep0 = nep_gallery("qdep1")
    a, b, c, d = 1.0, 3.0, 4.0, 5.0
    nep1 = mobius_transform(nep0, a=a, b=b, c=c, d=d)
    s = 3.0
    M0 = np.asarray(nep0.Mder_dense((a * s + b) / (c * s + d)))
    M1 = np.asarray(nep1.Mder_dense(s))
    assert np.linalg.norm(M0 - M1) < 1e-10


def test_taylor_expansion_pep():
    nep = nep_gallery("dep0")
    pep = taylor_expansion_pep(nep, 6)
    lam = 0.05
    M0 = np.asarray(nep.Mder_dense(lam))
    M1 = np.asarray(pep.Mder_dense(lam))
    assert np.linalg.norm(M0 - M1) < 1e-8


@pytest.mark.slow
def test_nleigs_nep_types():
    """The same quadratic solved through five NEP representations
    (reference ``test/nleigs/nleigs_nep_types.jl``), including the low-rank
    CORK tail and a pure-callback NEP."""
    import scipy.sparse as sp

    from neptpu import LowRankFactorizedNEP, Mder_NEP, SPMF_NEP, SumNEP, matfun

    B = [np.array([[1.0, 3], [5, 6]]), np.array([[3.0, 4], [6, 6]])]
    C = np.eye(2)
    fsq = lambda S: (np.asarray(S) @ np.asarray(S)) if np.asarray(S).ndim >= 2 else np.asarray(S) ** 2
    pep_full = neptpu.PEP(B + [C])

    def mder_cb(lam, der):
        return np.asarray(pep_full.Mder_dense(lam, der))

    problems = [
        ("SPMF_NEP", SPMF_NEP(B + [C], [matfun.eye_like, lambda S: np.asarray(S) + 0j * np.asarray(S), fsq])),
        ("PEP", pep_full),
        ("PEP+SPMF", SumNEP(neptpu.PEP(B), SPMF_NEP([C], [fsq]))),
        ("PEP+LowRank", SumNEP(neptpu.PEP(B),
                               LowRankFactorizedNEP([sp.csr_matrix(np.eye(2))],
                                                    [sp.csr_matrix(np.eye(2))], [fsq],
                                                    A=[np.eye(2)]))),
        ("callback", Mder_NEP(2, mder_cb)),
    ]
    true = _true_eigs(pep_full)
    for name, nepx in problems:
        lam, X, res, _ = nleigs(nepx, SIGMA, maxit=10, v=np.ones(2) + 0j, blksize=5)
        lam = np.asarray(lam)
        assert len(lam) == 4, name
        for t in true:
            assert np.min(np.abs(lam - t)) < 1e-6, name


def test_nleigs_lowrank_matrix_free():
    """Matrix-free low-rank branch (computeD=False): tail divided differences
    applied through the compacted LL + scalar weights (reference
    ``rk_nep.jl:102-153``, ``method_nleigs.jl:507-511``) must reproduce the
    explicit-D spectrum."""
    import scipy.sparse as sp

    from neptpu import LowRankFactorizedNEP, SumNEP

    B = [np.array([[1.0, 3], [5, 6]]), np.array([[3.0, 4], [6, 6]])]
    fsq = lambda S: (np.asarray(S) @ np.asarray(S)) if np.asarray(S).ndim >= 2 else np.asarray(S) ** 2
    nep = SumNEP(neptpu.PEP(B),
                 LowRankFactorizedNEP([sp.csr_matrix(np.eye(2))],
                                      [sp.csr_matrix(np.eye(2))], [fsq],
                                      A=[np.eye(2)]))
    lam_d, _, _, _ = nleigs(nep, SIGMA, maxit=10, v=np.ones(2) + 0j,
                            blksize=5, computeD=True)
    lam_f, X, res, _ = nleigs(nep, SIGMA, maxit=10, v=np.ones(2) + 0j,
                              blksize=5, computeD=False)
    lam_d, lam_f = np.asarray(lam_d), np.asarray(lam_f)
    assert len(lam_f) == len(lam_d) == 4
    for t in lam_d:
        assert np.min(np.abs(lam_f - t)) < 1e-8
    assert np.max(np.asarray(res)) < 1e-6
