"""Extra gallery tests: periodicdde, bem_fichera, dtn loader
(reference ``test/gallery.jl``, ``test/newton.jl`` resinv-mathieu)."""
import numpy as np
import pytest

import neptpu
from neptpu import compute_Mlincomb, compute_resnorm, nep_gallery


def test_periodicdde_mathieu_oracle():
    """resinv on the mathieu problem converges to -0.24470143590830754
    (reference ``test/newton.jl:57-64`` and periodic_dde docstring)."""
    nep = nep_gallery("periodicdde", name="mathieu")
    lam, v = neptpu.resinv(nep, lam=-0.2447, v=np.array([0.970208 + 0j, -0.242272 + 0j]),
                           tol=np.finfo(float).eps * 10, maxit=100)
    assert abs(complex(lam) - (-0.24470143590830754)) < 1e-10
    assert float(compute_resnorm(nep, lam, v)) < 1e-12


def test_periodicdde_dae_form():
    nep = nep_gallery("periodicdde", name="milling1_be")
    # MM on a 1x1 S equals Mlincomb consistency
    v = np.ones(2)
    z = np.asarray(compute_Mlincomb(nep, 0.3, v[:, None], np.ones(1)))
    M = np.asarray(nep.Mder_dense(0.3))
    np.testing.assert_allclose(z, M @ v, rtol=1e-8)


def test_bem_fichera_oracle():
    """lam_ref = 8.790558462139456 - 0.010815457827738698i makes M singular
    (reference ``test/gallery.jl:178-183``)."""
    nep = nep_gallery("bem_fichera", 1)
    lam_ref = 8.790558462139456 - 0.010815457827738698j
    M = np.asarray(nep.Mder_dense(lam_ref))
    s = np.linalg.svd(M, compute_uv=False)
    assert s[-1] / s[0] < 1e-10
    # FD-consistency of the first derivative
    eps = 1e-6
    Md = np.asarray(nep.Mder_dense(9.0, 1))
    fd = (np.asarray(nep.Mder_dense(9.0 + eps)) - np.asarray(nep.Mder_dense(9.0 - eps))) / (2 * eps)
    assert np.linalg.norm(Md - fd) / np.linalg.norm(fd) < 1e-4


def test_dtn_dimer_missing_data_error():
    with pytest.raises(FileNotFoundError, match="dtn_dimer data not found"):
        nep_gallery("dtn_dimer", "/nonexistent/dir")
