"""Complex-as-real IAR for general real-operand SPMFs (gun-class problems).

Template: same math two ways must agree (SURVEY.md §4) — the TPU-resident
split re/im path (``solvers/spmf_real.py``) vs the complex ``iar`` on the
same small gun-structured SPMF (PEP + i*sqrt terms, reference
``NLEVP_native.jl:4-18``).
"""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

import neptpu
from neptpu import PEP, SPMF_NEP, SumNEP, compute_resnorm
from neptpu.models.gallery.nlevp import _i_sqrt_shifted
from neptpu.solvers.iar import iar
from neptpu.solvers.spmf_real import (
    collect_spmf_terms,
    iar_real_spmf,
    spmf_coeff_table,
)


def _small_gun(n=60, seed=0):
    """PEP(K, -M) + [W1, W2]*[i sqrt(lam), i sqrt(lam - c)] — gun structure
    at test scale, all operands real banded/sparse."""
    rng = np.random.default_rng(seed)
    K = sp.diags(
        [np.full(n - 1, -1.0), np.full(n, 2.4), np.full(n - 1, -1.0)],
        [-1, 0, 1],
    ).tocsr() * (n + 1)
    M = sp.diags(np.full(n, 1.0) + 0.1 * np.cos(np.arange(n))).tocsr()
    idx = rng.choice(n, size=6, replace=False)
    vals = rng.standard_normal((6, 6)) * 0.3
    W1 = sp.csr_matrix(
        (vals.ravel(), (np.repeat(idx, 6), np.tile(idx, 6))), shape=(n, n)
    )
    W2 = W1.T.tocsr()
    pep = PEP([K, (-M).tocsr()])
    sqrtnep = SPMF_NEP([W1, W2], [_i_sqrt_shifted(0.0), _i_sqrt_shifted(9.0)])
    return SumNEP(pep, sqrtnep)


def test_collect_terms_and_coeff_table():
    nep = _small_gun()
    mats, fv = collect_spmf_terms(nep)
    assert len(mats) == len(fv) == 4
    # closed-form derivative tables match FD at a generic shift
    sigma, gamma = 40.0 + 3.0j, 2.0
    Cre, Cim = spmf_coeff_table(fv, sigma, gamma, 4)
    C = Cre + 1j * Cim
    eps = 1e-6
    for i, f in enumerate(fv):
        fp = f.derivs(sigma + eps, 1)[0]
        fm = f.derivs(sigma - eps, 1)[0]
        fd1 = (fp - fm) / (2 * eps) * gamma
        assert abs(C[i, 1] - fd1) < 1e-4 * max(1.0, abs(fd1))
        assert C[i, 0] == 0.0  # column 0 zeroed (IAR feeds derivs 1..m)


@pytest.mark.slow
def test_iar_real_spmf_matches_complex_iar():
    """Split re/im SPMF IAR spectrum == complex iar spectrum (f64, CPU)."""
    nep = _small_gun()
    sigma = 30.0 + 1.0j
    m = 35
    lam_c, _, _ = iar(nep, sigma=sigma, neigs=8, maxit=m,
                      v=np.ones(nep.n), tol=1e-8)
    lam_r, Q_r = iar_real_spmf(nep, sigma=sigma, maxit=m, neigs=8,
                               tol=1e-8, dtype=jnp.float64)
    lam_c = np.asarray(lam_c)
    assert len(lam_r) >= 3
    # the two formulations build different (similarity-scaled) Krylov
    # spaces, so the converged SETS can differ in the tails — but the pairs
    # closest to sigma must agree between the formulations
    near = sorted(lam_r, key=lambda la: abs(la - sigma))[:3]
    for la in near:
        assert min(abs(la - lam_c)) < 1e-5, (la, lam_c)
    # residuals of the returned pairs
    for s in range(min(3, len(lam_r))):
        r = float(compute_resnorm(nep, lam_r[s], jnp.asarray(Q_r[:, s])))
        assert r < 1e-5


@pytest.mark.slow
def test_iar_real_spmf_pep_closed_form():
    """Pure PEP goes through the closed-form monomial derivative rules."""
    nep = neptpu.nep_gallery("pep0", 40)
    lam_c, _, _ = iar(nep, sigma=0.0, neigs=3, maxit=40,
                      v=np.ones(nep.n), tol=1e-9)
    lam_r, Q_r = iar_real_spmf(nep, sigma=0.0, maxit=40, neigs=3,
                               tol=1e-9, dtype=jnp.float64)
    lam_c = np.asarray(lam_c)
    assert len(lam_r) >= 2
    for la in lam_r[:2]:
        assert min(abs(la - lam_c)) < 1e-8


def test_iar_real_spmf_rejects_bulk_complex_operands():
    """Low-rank imaginary parts are supported (WEP boundary terms); a
    BULK-complex operand (dense-support imaginary part) must raise."""
    n = 80
    A = np.eye(n) + 1j * np.diag(np.linspace(1, 2, n))
    nep = SPMF_NEP([A, np.eye(n)], [lambda S: jnp.asarray(S) ** 0,
                                    lambda S: jnp.asarray(S)],
                   check_consistency=False)
    with pytest.raises(ValueError, match="imaginary"):
        iar_real_spmf(nep, sigma=0.5, maxit=5)


@pytest.mark.slow
def test_iar_real_spmf_deflated_never_reconverges():
    """Compiled-kernel Effenberger deflation (DeflationOps inside the scan):
    restarted sweeps accumulate DISTINCT eigenpairs — converged pairs never
    reconverge (reference nep_deflation.jl contract) — and every returned
    pair carries a small original-problem residual."""
    from neptpu.solvers.spmf_real import iar_real_spmf_deflated

    nep = _small_gun()
    D, Q, info = iar_real_spmf_deflated(
        nep, sigma=30 + 1j, maxit=16, neigs=5, tol=1e-7,
        dtype=jnp.float64, return_info=True, check_error_every=8)
    assert info["nconv"] >= 4, info
    assert len(info["sweeps"]) >= 2  # the run actually restarted
    for i in range(len(D)):
        for j in range(i + 1, len(D)):
            assert abs(D[i] - D[j]) > 1e-6  # all distinct
    for s in range(len(D)):
        r = float(compute_resnorm(nep, D[s], jnp.asarray(Q[:, s])))
        assert r < 1e-3, (D[s], r)
    # agreement with the plain (non-deflated) run on the nearest pairs
    lam_ref, _ = iar_real_spmf(nep, sigma=30 + 1j, maxit=35, neigs=8,
                               tol=1e-8, dtype=jnp.float64)
    lam_ref = np.asarray(lam_ref)
    near = sorted(D, key=lambda la: abs(la - (30 + 1j)))[:3]
    for la in near:
        assert min(abs(la - lam_ref)) < 1e-5, (la, lam_ref)


def test_deflation_ops_matches_reference_deflated_mlincomb():
    """DeflationOps' folded contraction == models/deflation.py's
    DeflatedGenericNEP.Mlincomb for random blocks (the in-scan extension is
    exactly the Effenberger operator)."""
    import math

    from neptpu.models.deflation import deflate_eigpair
    from neptpu.solvers.iar_real import DeflationOps
    from neptpu.solvers.spmf_real import spmf_coeff_table, spmf_fun_scalars

    nep = _small_gun()
    sigma = 30 + 1j
    mats, fv = collect_spmf_terms(nep)
    n = nep.n
    rng = np.random.default_rng(5)
    lam0 = 30.1 + 0.2j
    x0 = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    x0 /= np.linalg.norm(x0)
    dnep = deflate_eigpair(nep, lam0, x0, mode=":Generic")
    X, S = dnep.V0, dnep.S0
    p, m, gt = 1, 6, 0.7
    defl = DeflationOps.build(X, S, sigma, gt, m, jnp.float64)
    U = np.zeros((m + 1, n + p), dtype=complex)
    U[1:] = rng.standard_normal((m, n + p)) \
        + 1j * rng.standard_normal((m, n + p))
    # mine: t -> v' -> table contraction (j=0 column restored to f(sigma))
    T = np.asarray(defl.Tre) + 1j * np.asarray(defl.Tim)
    t = (T @ U[:, n:].reshape(-1)).reshape(m + 1, p)
    vp = U[:, :n] + t @ X.T
    Cre, Cim = spmf_coeff_table(fv, sigma, 1.0, m, scaled=True)
    C = Cre + 1j * Cim
    for j in range(m + 1):
        C[:, j] *= gt ** j
    C[:, 0] = spmf_fun_scalars(fv, sigma)
    z = np.zeros(n, dtype=complex)
    for i, A in enumerate(mats):
        z += A @ (vp.T @ C[i])
    # reference
    a = np.array([0.0] + [gt ** j / math.factorial(j)
                          for j in range(1, m + 1)])
    z_ref = np.asarray(dnep.Mlincomb(sigma, U.T, a=a))
    assert np.linalg.norm(z - z_ref[:n]) < 1e-12 * np.linalg.norm(z_ref[:n])
