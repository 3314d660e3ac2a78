"""SparseFactorizeLinSolver — the literal UMFPACK role on the host
(reference ``LinSolvers.jl:109-137``), used by the bench's CPU comparator
and host float64 reference runs."""
import numpy as np

import jax.numpy as jnp

import neptpu
from neptpu.core.nep import compute_Mder
from neptpu.ops.linsolve import (SparseFactorizeLinSolver,
                                 SparseFactorizeLinSolverCreator)


def test_sparse_factorize_matches_dense_solve():
    nep = neptpu.nep_gallery("dep0", 24)
    lam = 0.3 + 0.2j
    s = SparseFactorizeLinSolver(nep, lam)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(24) + 1j * rng.standard_normal(24)
    x = np.asarray(s.solve(b))
    M = np.asarray(compute_Mder(nep, lam))
    assert np.linalg.norm(M @ x - b) < 1e-10 * np.linalg.norm(b)


def test_sparse_factorize_block_rhs():
    nep = neptpu.nep_gallery("dep0", 16)
    s = SparseFactorizeLinSolver(nep, -0.1)
    B = np.random.default_rng(1).standard_normal((16, 3))
    X = np.asarray(s.solve(B))
    M = np.asarray(compute_Mder(nep, -0.1))
    assert np.linalg.norm(M @ X - B) < 1e-10 * np.linalg.norm(B)


def test_sparse_factorize_creator_recycles():
    nep = neptpu.nep_gallery("dep0", 16)
    c = SparseFactorizeLinSolverCreator(max_factorizations=-1)
    s1 = c.create(nep, 0.25)
    s2 = c.create(nep, 0.25)
    assert s1 is s2  # cached by shift
    s3 = c.create(nep, 0.50)
    assert s3 is not s1


def test_quasinewton_with_sparse_creator():
    """End-to-end: the host f64 reference configuration (quasinewton +
    cached splu) must hit the dep0 oracle tolerance class."""
    from neptpu import compute_resnorm
    from neptpu.solvers import quasinewton

    nep = neptpu.nep_gallery("dep0", 32)
    lam, v = quasinewton(
        nep, lam=-0.2, v=np.ones(32), tol=1e-11, maxit=200,
        linsolvercreator=SparseFactorizeLinSolverCreator(
            max_factorizations=-1))
    r = float(compute_resnorm(nep, complex(lam), jnp.asarray(
        np.asarray(v) / np.linalg.norm(np.asarray(v)))))
    assert r < 1e-9, r


def test_sparse_factorize_on_mixed_complex_spmf():
    """The WEP SPMF (complex boundary operands) must assemble and solve."""
    wep = neptpu.nep_gallery("waveguide", nx=11, nz=9,
                             benchmark_problem="JARLEBRING", neptype="SPMF")
    lam = -2.0 - 3.0j
    s = SparseFactorizeLinSolver(wep, lam)
    b = np.random.default_rng(2).standard_normal(wep.n)
    x = np.asarray(s.solve(b))
    from neptpu.solvers.spmf_real import (collect_spmf_terms,
                                          spmf_fun_scalars)

    mats, fv = collect_spmf_terms(wep)
    w = spmf_fun_scalars(fv, lam)
    Mx = sum(wi * (A @ x) for wi, A in zip(w, mats))
    assert np.linalg.norm(Mx - b) < 1e-9 * np.linalg.norm(b)
