"""Hydrodynamic-stability (Orr–Sommerfeld/Squire) problem: the spectral
differentiation utilities and the spatial-stability PEP oracle (reference
``docs/src/hydrotutorial.md`` + ``docs/src/hydro_cheb/``; Schmid &
Henningson Table 7.1 / Fig. 7.2)."""
import numpy as np

import neptpu
from neptpu import PEP, nep_gallery, shift_and_scale
from neptpu.models.gallery.chebdiff import cheb4c, chebdif


def test_chebdif_spectral_accuracy():
    x, DM = chebdif(24, 4)
    f = np.exp(x)
    for ell, tol in enumerate((1e-12, 1e-10, 1e-8, 1e-6)):
        assert np.max(np.abs(DM[ell] @ f - f)) / np.e < tol


def test_cheb4c_clamped():
    """D4 with clamped BCs is exact on polynomials vanishing to first
    order at ±1: p = x^2 (1-x^2)^2 has p'''' = -48 + 360 x^2."""
    xi, D4 = cheb4c(24)
    p = xi ** 2 * (1 - xi ** 2) ** 2
    assert np.max(np.abs(D4 @ p - (-48 + 360 * xi ** 2))) < 1e-7


def test_orr_sommerfeld_table71_oracle():
    """The scaled PEP + TIAR pipeline reproduces the reference tutorial's
    eigenvalues (Poiseuille flow, Re=2000, omega=0.3): the A-branch value
    0.30865495875 + 0.00896029718i and three more of the printed set."""
    nep = nep_gallery("orr_sommerfeld", 128)
    sc = 100.0
    nep1 = shift_and_scale(nep, scale=sc)
    ms = np.linalg.norm(np.asarray(nep1.get_Av()[-1]))
    nep2 = PEP([np.asarray(A) / ms for A in nep1.get_Av()])
    lam, V, _ = neptpu.tiar(nep2, sigma=0.006, v=np.ones(nep.n),
                            neigs=10, maxit=200, tol=1e-14)
    lam = sc * np.asarray(lam)
    for ref in (0.30865495875240445 + 0.008960297181538185j,
                0.3765784040323032 + 0.09959915134763689j,
                0.4087137042139992 + 0.15906877547743775j,
                -0.2863097014631293 - 0.9011417554715162j):
        assert np.min(np.abs(lam - ref)) < 1e-8 * abs(ref)
