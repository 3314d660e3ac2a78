"""Complex-as-real compiled IAR must agree with the complex IAR path.

The reference's testing template (SURVEY.md §4): same math two ways must
agree — here the TPU complex-as-real kernel (f64 pairs on CPU) against the
complex ``iar``/``iar_scan_kernel`` on the same gallery DEPs.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import neptpu
from neptpu import compute_resnorm, nep_gallery
from neptpu.solvers.iar_real import dep_coeff_table, iar_real


def _match(lams_a, lams_b, tol):
    """Each of lams_a has a partner in lams_b (or its conjugate-closure —
    real-operand DEP spectra are conjugate-symmetric and which partner of a
    pair converges first is numerically arbitrary) within tol."""
    closed = list(lams_b) + [np.conj(lb) for lb in lams_b]
    for la in lams_a:
        assert min(abs(la - lb) for lb in closed) < tol, (la, lams_b)


@pytest.mark.slow
def test_iar_real_matches_complex_iar_dia_bank():
    nep = nep_gallery("dep0_tridiag", 64)
    lams_r, Q_r, info = iar_real(nep, sigma=-0.3, maxit=40, neigs=4,
                                 dtype=jnp.float64, return_info=True)
    assert len(lams_r) >= 3
    for s in range(len(lams_r)):
        assert float(compute_resnorm(nep, lams_r[s], jnp.asarray(Q_r[:, s]))) < 1e-10

    lams_c, Q_c, _ = neptpu.iar(nep, sigma=-0.3, maxit=40, neigs=6)
    _match(lams_r, np.asarray(lams_c), 1e-8)


@pytest.mark.slow
def test_iar_real_matches_complex_iar_dense_bank():
    nep = nep_gallery("dep0")  # 5x5 dense bank
    lams_r, Q_r = iar_real(nep, sigma=-0.5, maxit=30, neigs=3, dtype=jnp.float64)
    assert len(lams_r) >= 2
    lams_c, Q_c, _ = neptpu.iar(nep, sigma=-0.5, maxit=30, neigs=4)
    _match(lams_r[:2], np.asarray(lams_c), 1e-8)


def test_iar_real_f32_converges_to_f32_tolerance():
    nep = nep_gallery("dep0_tridiag", 96)
    lams, Q, info = iar_real(nep, sigma=-0.3, maxit=35, neigs=3,
                             dtype=jnp.float32, return_info=True)
    assert info["nconv"] >= 1
    for s in range(len(lams)):
        assert float(compute_resnorm(nep, lams[s], jnp.asarray(Q[:, s]))) < 1e-3


def test_dep_coeff_table_matches_derivative_definition():
    nep = nep_gallery("dep0")
    sigma, gamma, m = -0.2 + 0.1j, 1.3, 5
    Cre, Cim = dep_coeff_table(nep, sigma, gamma, m)
    C = Cre + 1j * Cim
    tau = np.asarray(nep.tauv)
    for i, t in enumerate(tau):
        for j in range(1, m + 1):
            want = gamma**j * (-t) ** j * np.exp(-t * sigma)
            assert abs(C[i, j] - want) < 1e-12 * max(1.0, abs(want))
    assert np.all(C[:, 0] == 0)


def test_host_resnorm_matches_protocol_resnorm():
    from neptpu.solvers.iar_real import _dep_host_resnorm

    nep = nep_gallery("dep0_tridiag", 48)
    rn = _dep_host_resnorm(nep)
    rng = np.random.default_rng(1)
    q = rng.standard_normal(48) + 1j * rng.standard_normal(48)
    lam = -0.4 + 0.2j
    a = rn(lam, q)
    b = float(compute_resnorm(nep, lam, jnp.asarray(q)))
    assert abs(a - b) < 1e-10 * max(1.0, b)
