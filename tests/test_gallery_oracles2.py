"""Oracle tests for the last uncovered gallery entries (reference
``test/gallery.jl:49-154``): pep0_sym, qep_fixed_eig, dep_double, beam."""
import numpy as np

import neptpu
from neptpu import DEP, PEP, compute_resnorm, nep_gallery


def test_pep0_sym_symmetric_coefficients():
    """pep0_sym is a PEP whose coefficient matrices are symmetric
    (``gallery.jl:49-55``)."""
    nep = nep_gallery("pep0_sym", 15)
    assert isinstance(nep, PEP)
    for A in nep.get_Av():
        A = np.asarray(A)
        assert np.array_equal(A, A.T)
    # deterministic MSWS seeding: two builds agree bit-exactly
    nep2 = nep_gallery("pep0_sym", 15)
    assert np.array_equal(np.asarray(nep.get_Av()[0]),
                          np.asarray(nep2.get_Av()[0]))


def test_qep_fixed_eig_prescribed_eigenvalues():
    """Every entry of E is an eigenvalue by construction; the reference pins
    lam*=5 with E=1:6 (``gallery.jl:126-132``)."""
    nep = nep_gallery("qep_fixed_eig", 3, np.arange(1, 7))
    for lam_star in (5.0, 2.0):
        s = np.linalg.svd(np.asarray(nep.Mder_dense(lam_star)),
                          compute_uv=False)
        assert s[-1] < 1e-12 * s[0]
    # default build: n=5, E from the MSWS stream — still a PEP of degree 2
    nep_d = nep_gallery("qep_fixed_eig")
    assert isinstance(nep_d, PEP) and len(nep_d.get_Av()) == 3


def test_dep_double_defective_eigenvalue():
    """dep_double has a DOUBLE non-semisimple eigenvalue at 3*pi*i
    (Jarlebring 2012; ``gallery_examples.jl:34-49``): M(lam*) is singular
    and sigma_min scales QUADRATICALLY in the distance from lam*."""
    nep = nep_gallery("dep_double")
    assert isinstance(nep, DEP)
    lam_star = 3j * np.pi

    def smin(lam):
        return np.linalg.svd(np.asarray(nep.Mder_dense(lam)),
                             compute_uv=False)[-1]

    assert smin(lam_star) < 1e-10
    # double root: smin(lam* + eps) ~ C eps^2  =>  ratio at eps vs 2 eps ~ 4
    e = 1e-4
    ratio = smin(lam_star + 2 * e) / smin(lam_star + e)
    assert 3.0 < ratio < 5.0


def test_beam_dep_solves():
    """beam is a sparse DEP (``gallery.jl:150-154``); one Newton eigenpair
    converges with a residual gate."""
    nep = nep_gallery("beam", 50)
    assert isinstance(nep, DEP) and nep.issparse
    lam, v = neptpu.augnewton(nep, lam=-1.0, v=np.ones(nep.n), maxit=50,
                              tol=1e-10)
    nrm = float(compute_resnorm(nep, lam, v))
    assert nrm < 1e-8 * np.linalg.norm(np.asarray(nep.Mder_dense(lam)))
