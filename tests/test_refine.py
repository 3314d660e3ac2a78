"""Eigenpair refinement (``solvers/refine.py``) and the batched per-shift
partitioned factorization (``ops/partitioned.BatchedShiftSMW``).

Reference role: the resinv/Newton polishing loop (``method_resinv.jl``,
``method_newton.jl``) that the reference applies per pair with a fresh
UMFPACK factorization per eigenvalue — here one vmapped SPIKE+SMW program
factors every shift at once and mixed-precision f64-IR recovers
reference-class (1e-10+) backward errors from f32 factorizations.
"""
import numpy as np
import pytest

import jax.numpy as jnp

import neptpu
from neptpu.ops.partitioned import (BatchedShiftSMW, ShiftPlan,
                                    assemble_shift_parts)
from neptpu.solvers.refine import (newton_refine, resinv_refine,
                                   spmf_fun_derivs)
from neptpu.solvers.spmf_real import (_spmf_host_resnorm, collect_spmf_terms,
                                      iar_real_spmf, spmf_fun_scalars)


@pytest.fixture(scope="module")
def wep_small():
    nep = neptpu.nep_gallery("waveguide", nx=29, nz=21,
                             benchmark_problem="JARLEBRING", neptype="SPMF")
    mats, fv = collect_spmf_terms(nep)
    fro = np.array([np.sqrt(np.abs(A.multiply(A.conj())).sum())
                    for A in mats])
    rn = _spmf_host_resnorm(mats, fv)

    def backward(lam, q):
        return rn(lam, q) / float(np.abs(spmf_fun_scalars(fv, lam)) @ fro)

    return nep, mats, fv, backward


def test_shift_plan_matches_direct_assembly(wep_small):
    """ShiftPlan.parts(sigma) must reconstruct M(sigma) exactly for any
    sigma (the structure is frozen once, values are weight contractions)."""
    nep, mats, fv, _ = wep_small
    n = mats[0].shape[0]
    plan = ShiftPlan(mats, fv)
    assert plan.ok
    for sigma in (-3 - 3.5j, -1 + 2j):
        strips, offs, Lc, Uc = plan.parts(sigma)
        Md = np.zeros((n, n), complex)
        r = np.arange(n)
        for d, off in enumerate(offs):
            rows = r[: n - off] if off >= 0 else r[-off:]
            Md[rows, rows + off] += strips[d][rows]
        if Lc is not None:
            Md += Lc @ Uc.T
        w = spmf_fun_scalars(fv, sigma)
        Mref = sum(wi * A.toarray().astype(complex)
                   for wi, A in zip(w, mats))
        assert np.abs(Md - Mref).max() < 1e-12 * np.abs(Mref).max()


def test_batched_shift_solver_exact_f64(wep_small):
    """Two shifts, f64 factors: each column solved against its own shift to
    machine precision (vs scipy splu)."""
    import scipy.sparse.linalg as spla

    nep, mats, fv, _ = wep_small
    n = mats[0].shape[0]
    sigmas = np.array([-2 + 1j, -5 - 1j])
    bs = BatchedShiftSMW(mats, fv, sigmas, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    B = rng.standard_normal((n, 2)) + 1j * rng.standard_normal((n, 2))
    yre, yim = bs.solve_pairs(B.real, B.imag)
    Y = np.asarray(yre) + 1j * np.asarray(yim)
    for j, s in enumerate(sigmas):
        w = spmf_fun_scalars(fv, s)
        M = sum(wi * A.astype(complex) for wi, A in zip(w, mats)).tocsc()
        xref = spla.splu(M).solve(B[:, j])
        rel = np.linalg.norm(Y[:, j] - xref) / np.linalg.norm(xref)
        assert rel < 1e-10, (j, rel)


def test_mixed_precision_ir_solve_near_eigenvalue(wep_small):
    """The f32+f64-IR path must stay accurate where the plain f32
    factorization loses the solve entirely (near-singular shift)."""
    import scipy.sparse.linalg as spla

    nep, mats, fv, _ = wep_small
    n = mats[0].shape[0]
    sig = -2.87079276 - 4.38384634j + 1j * 5.4e-6  # ~5e-6 off an eigenvalue
    w = spmf_fun_scalars(fv, sig)
    M = sum(wi * A.astype(complex) for wi, A in zip(w, mats)).tocsc()
    rng = np.random.default_rng(1)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    xref = spla.splu(M).solve(b)
    bs = BatchedShiftSMW(mats, fv, np.array([sig]), dtype=jnp.float32, ir=3)
    yre, yim = bs.solve_pairs(b.real[:, None], b.imag[:, None])
    y = np.asarray(yre)[:, 0] + 1j * np.asarray(yim)[:, 0]
    rel = np.linalg.norm(y - xref) / np.linalg.norm(xref)
    assert rel < 1e-6, rel


def test_newton_refine_reaches_reference_floor(wep_small):
    """f32 IAR to ~1e-2, then newton_refine to < 1e-10 backward — the
    reference-accuracy-at-chip-dtype claim (gun_native.jl tolerance class,
    /root/reference/test/gun_native.jl:9-19)."""
    nep, mats, fv, backward = wep_small
    lams, Q = iar_real_spmf(nep, sigma=-3 - 3.5j, maxit=18, neigs=4,
                            tol=1e-2, dtype=jnp.float32,
                            errmeasure=backward)
    assert len(lams) >= 3
    lams2, Q2, errs = newton_refine(mats, fv, lams, Q, nsweeps=4,
                                    tol=1e-11, errmeasure=backward,
                                    dtype=jnp.float32, ir=3, shift_rel=1e-8)
    assert np.all(errs < 1e-10), errs
    # eigenvalues must not have wandered to a different pair
    assert np.max(np.abs(lams2 - np.asarray(lams))) < 1e-2


def test_newton_refine_chunked_matches_unchunked(wep_small):
    """Memory-aware chunking (max_batch) must not change the result class:
    every pair still reaches the tolerance floor."""
    nep, mats, fv, backward = wep_small
    lams, Q = iar_real_spmf(nep, sigma=-3 - 3.5j, maxit=18, neigs=4,
                            tol=1e-2, dtype=jnp.float32,
                            errmeasure=backward)
    lams2, Q2, errs = newton_refine(mats, fv, lams, Q, nsweeps=4,
                                    tol=1e-11, errmeasure=backward,
                                    dtype=jnp.float32, ir=3,
                                    shift_rel=1e-8, max_batch=2)
    assert np.all(errs < 1e-10), errs


def test_resinv_refine_never_worse(wep_small):
    """The frozen-shift polisher must never degrade a pair (projection +
    joint-rejection contract)."""
    nep, mats, fv, backward = wep_small
    lams, Q, info = iar_real_spmf(nep, sigma=-3 - 3.5j, maxit=18, neigs=4,
                                  tol=1e-2, dtype=jnp.float32,
                                  errmeasure=backward, return_info=True,
                                  return_solver=True)
    errs0 = np.array([backward(complex(lams[j]), np.asarray(Q[:, j]))
                      for j in range(len(lams))])
    lams2, Q2, errs = resinv_refine(mats, fv, info["solver"], lams, Q,
                                    nsweeps=3, errmeasure=backward)
    assert np.all(errs <= errs0 + 1e-16)


def test_spmf_fun_derivs_match_finite_difference(wep_small):
    nep, mats, fv, _ = wep_small
    lam = -2.5 - 3.0j
    D = spmf_fun_derivs(fv, lam, 2)
    h = 1e-6
    for i in [0, 1, len(fv) - 1]:
        f = fv[i]
        fp = (spmf_fun_derivs([f], lam + h, 1)[0, 0]
              - spmf_fun_derivs([f], lam - h, 1)[0, 0]) / (2 * h)
        assert abs(fp - D[i, 1]) < 1e-4 * max(1.0, abs(D[i, 1]))


def test_shift_plan_agrees_with_assemble_shift_parts(wep_small):
    """Both assembly routes must describe the same M(sigma) (they may split
    band/low-rank differently; the reconstruction must agree)."""
    nep, mats, fv, _ = wep_small
    n = mats[0].shape[0]
    sigma = -3 - 3.5j

    def reconstruct(parts):
        strips, offs, Lc, Uc = parts
        Md = np.zeros((n, n), complex)
        r = np.arange(n)
        for d, off in enumerate(offs):
            rows = r[: n - off] if off >= 0 else r[-off:]
            Md[rows, rows + off] += strips[d][rows]
        if Lc is not None:
            Md += Lc @ Uc.T
        return Md

    M1 = reconstruct(ShiftPlan(mats, fv).parts(sigma))
    M2 = reconstruct(assemble_shift_parts(mats, fv, sigma))
    assert np.abs(M1 - M2).max() < 1e-12 * np.abs(M1).max()
