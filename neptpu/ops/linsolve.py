"""Linear-solver layer (reference ``src/LinSolvers.jl`` + ``LinSolverCreators.jl``).

The reference's workhorse is a cached UMFPACK LU of ``compute_Mder(nep, lam)``.
UMFPACK has no TPU analogue; the TPU-native decision (SURVEY.md §7) is:

* moderate n (the whole gallery: n <= ~1e4): **dense LU in HBM** — an MXU-
  friendly O(n^3/3) factorization that amortizes over solver iterations
  exactly like the reference's cached sparse LU, and *batches over shifts*
  via ``vmap`` (one stacked LU per Leja/quadrature node set).
* matrix-free: our own **GMRES** over ``compute_Mlincomb`` matvecs.

The creator/cache semantics (``FactorizeLinSolverCreator`` recycling dict,
``LinSolverCreators.jl:62-122``) are preserved: creators decide *when*
factorizations happen and cache them keyed by shift.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.nep import compute_Mder, compute_Mlincomb

__all__ = [
    "LinSolver",
    "lin_solve",
    "FactorizeLinSolver",
    "SparseFactorizeLinSolver",
    "SparseFactorizeLinSolverCreator",
    "BackslashLinSolver",
    "GMRESLinSolver",
    "FactorizeLinSolverCreator",
    "BackslashLinSolverCreator",
    "GMRESLinSolverCreator",
    "DeflatedNEPLinSolver",
    "DeflatedNEPLinSolverCreator",
    "DefaultLinSolverCreator",
    "create_linsolver",
    "gmres",
    "batched_lu_factor",
    "batched_lu_solve",
]


def _dense_mder(nep, lam):
    M = compute_Mder(nep, lam)
    if not isinstance(M, jnp.ndarray):
        M = M.to_dense()
    return M


@jax.jit
def _lu_factor(A):
    return jax.scipy.linalg.lu_factor(A)


@partial(jax.jit, static_argnames=())
def _lu_solve(lu_piv, b):
    return jax.scipy.linalg.lu_solve(lu_piv, b)


# vmapped over a leading shift axis: the batched-shifted-solve primitive that
# contour/NLEIGS-style methods build on.
batched_lu_factor = jax.jit(jax.vmap(jax.scipy.linalg.lu_factor))
batched_lu_solve = jax.jit(jax.vmap(jax.scipy.linalg.lu_solve))


class LinSolver:
    """A solver bound to one (nep, lam); ``solve`` accepts vector or matrix
    right-hand sides (contour methods need block RHS,
    ``method_beyncontour.jl:21-24``)."""

    def solve(self, b, tol=None):
        raise NotImplementedError


def lin_solve(solver: LinSolver, b, tol=None):
    return solver.solve(b, tol=tol)


class FactorizeLinSolver(LinSolver):
    """LU once, triangular solves per call (reference ``LinSolvers.jl:109-137``)."""

    def __init__(self, nep, lam, umfpack_refinements: int = 2):
        A = _dense_mder(nep, lam)
        self.dtype = A.dtype
        self._is_complex = np.issubdtype(np.dtype(self.dtype), np.complexfloating)
        self.lu = _lu_factor(A)

    def solve(self, b, tol=None):
        b = jnp.asarray(b)
        if jnp.iscomplexobj(b) and not self._is_complex:
            # real factorization, complex RHS: solve the parts (exact; avoids
            # a lossy complex->real cast). jax.lax.complex avoids a weak
            # complex128 constant, which the TPU backend cannot compile.
            return jax.lax.complex(
                _lu_solve(self.lu, b.real.astype(self.dtype)),
                _lu_solve(self.lu, b.imag.astype(self.dtype)),
            )
        return _lu_solve(self.lu, b.astype(self.dtype))


class SparseFactorizeLinSolver(LinSolver):
    """scipy ``splu`` of the SPARSE M(lam) — the reference's UMFPACK role
    verbatim (``LinSolvers.jl:109-137``), for host/CPU float64 reference
    runs and for the bench's CPU comparator.  TPU paths use the dense-HBM
    or partitioned solvers instead; this one never touches a device."""

    def __init__(self, nep, lam):
        import scipy.sparse.linalg as spla

        from ..solvers.spmf_real import collect_spmf_terms, spmf_fun_scalars

        mats, fv = collect_spmf_terms(nep)
        w = spmf_fun_scalars(fv, complex(np.asarray(lam)))
        M = None
        for wi, A in zip(w, mats):
            T = A.astype(complex) * wi
            M = T if M is None else M + T
        self.lu = spla.splu(M.tocsc())

    def solve(self, b, tol=None):
        return self.lu.solve(np.asarray(b, dtype=complex))


class BackslashLinSolver(LinSolver):
    """Re-solve A\\b each call, no cached factorization
    (reference ``LinSolvers.jl:147-159``)."""

    def __init__(self, nep, lam):
        self.A = _dense_mder(nep, lam)

    def solve(self, b, tol=None):
        b = jnp.asarray(b)
        dt = jnp.promote_types(self.A.dtype, b.dtype)
        return jnp.linalg.solve(self.A.astype(dt), b.astype(dt))


@partial(jax.jit, static_argnames=("matvec", "restart", "maxiter"))
def _gmres_impl(matvec, b, x0, tol, restart, maxiter):
    x, _ = jax.scipy.sparse.linalg.gmres(
        matvec,
        b,
        x0=x0,
        tol=tol,
        restart=restart,
        maxiter=maxiter,
        solve_method="incremental",
    )
    return x


def gmres(matvec, b, x0=None, tol=1e-12, restart=50, maxiter=200):
    """Matrix-free GMRES (jax-native; used by GMRESLinSolver and by the
    structured waveguide solvers)."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    return _gmres_impl(matvec, b, x0, tol, restart, maxiter)


class GMRESLinSolver(LinSolver):
    """Matrix-free: wraps v -> compute_Mlincomb(nep, lam, v)
    (reference ``LinSolvers.jl:171-188``)."""

    def __init__(self, nep, lam, tol=1e-12, restart=50, maxiter=200,
                 preconditioner: Optional[Callable] = None):
        self.nep = nep
        self.lam = lam
        self.tol = tol
        self.restart = restart
        self.maxiter = maxiter
        self.preconditioner = preconditioner
        cdt = jnp.result_type(jnp.asarray(lam), jnp.float32)
        self.dtype = cdt

    def _matvec(self, v):
        return compute_Mlincomb(self.nep, self.lam, v[:, None], jnp.ones((1,)))

    def solve(self, b, tol=None):
        b = jnp.asarray(b)
        if b.ndim == 2:
            cols = [self.solve(b[:, j], tol=tol) for j in range(b.shape[1])]
            return jnp.stack(cols, axis=1)
        t = self.tol if tol is None else tol
        M = self.preconditioner
        # Promote rather than truncate: a complex RHS on a real-dtype solver
        # must not be cast to real (same bug class as FactorizeLinSolver).
        dt = jnp.promote_types(self.dtype, b.dtype)
        x, _ = jax.scipy.sparse.linalg.gmres(
            self._matvec,
            b.astype(dt),
            tol=t,
            restart=self.restart,
            maxiter=self.maxiter,
            M=M,
            solve_method="incremental",
        )
        return x


# ---------------------------------------------------------------------------
# Creators: strategy objects deciding when factorizations happen.
# ---------------------------------------------------------------------------


class DeflatedNEPLinSolver(LinSolver):
    """Schur-complement solve of the bordered deflated system [M U; X^H 0],
    recycling the inner M-solver (reference ``LinSolvers.jl:194-252``;
    assumes minimality index 1)."""

    def __init__(self, deflated_nep, lam, orglinsolver):
        self.deflated_nep = deflated_nep
        self.lam = lam
        self.orglinsolver = orglinsolver

    def solve(self, b, tol=None):
        from ..models.deflation import deflated_nep_compute_Q

        dnep = self.deflated_nep
        n = dnep.orgnep.n
        m = dnep.p
        b = jnp.asarray(b)
        b1 = b[:n]
        b2 = b[n:]
        X = jnp.asarray(dnep.V0)
        U = jnp.asarray(deflated_nep_compute_Q(dnep, self.lam, 0))
        b1t = lin_solve(self.orglinsolver, b1, tol=tol)
        Z = jnp.stack(
            [lin_solve(self.orglinsolver, U[:, i], tol=tol) for i in range(m)], axis=1
        )
        S = -(X.conj().T @ Z)
        v2 = jnp.linalg.solve(S, b2 - X.conj().T @ b1t)
        v1 = b1t - Z @ v2
        return jnp.concatenate([v1, v2])


class LinSolverCreator:
    def create(self, nep, lam):
        raise NotImplementedError


class DeflatedNEPLinSolverCreator(LinSolverCreator):
    """Creator wrapping the original creator for the deflated bordered solve
    (reference ``LinSolverCreators.jl:174-181``)."""

    def __init__(self, orglinsolvercreator=None):
        self.orglinsolvercreator = orglinsolvercreator

    def create(self, nep, lam):
        org = create_linsolver(self.orglinsolvercreator, nep.orgnep, lam)
        return DeflatedNEPLinSolver(nep, lam, org)


class FactorizeLinSolverCreator(LinSolverCreator):
    """Optionally precompute factorizations at given shifts and recycle up to
    ``max_factorizations`` (reference ``LinSolverCreators.jl:62-122``)."""

    def __init__(self, umfpack_refinements: int = 2, recycled_factorizations=None,
                 max_factorizations: int = 0, nep=None, precomp_values=()):
        self.umfpack_refinements = umfpack_refinements
        self.max_factorizations = max_factorizations
        self.cache = dict(recycled_factorizations or {})
        for lam in precomp_values:
            if nep is None:
                raise ValueError("precomp_values requires nep")
            self.cache[complex(lam)] = FactorizeLinSolver(nep, lam, umfpack_refinements)

    def create(self, nep, lam):
        key = complex(np.asarray(lam))
        if key in self.cache:
            return self.cache[key]
        solver = FactorizeLinSolver(nep, lam, self.umfpack_refinements)
        if self.max_factorizations != 0 and (
            self.max_factorizations < 0 or len(self.cache) < self.max_factorizations
        ):
            self.cache[key] = solver
        return solver


class SparseFactorizeLinSolverCreator(LinSolverCreator):
    """Creator for :class:`SparseFactorizeLinSolver` with the same recycling
    dict semantics as :class:`FactorizeLinSolverCreator`."""

    def __init__(self, max_factorizations: int = 0):
        self.max_factorizations = max_factorizations
        self.cache = {}

    def create(self, nep, lam):
        key = complex(np.asarray(lam))
        if key in self.cache:
            return self.cache[key]
        solver = SparseFactorizeLinSolver(nep, lam)
        if self.max_factorizations != 0 and (
            self.max_factorizations < 0
            or len(self.cache) < self.max_factorizations
        ):
            self.cache[key] = solver
        return solver


class BackslashLinSolverCreator(LinSolverCreator):
    def create(self, nep, lam):
        return BackslashLinSolver(nep, lam)


class GMRESLinSolverCreator(LinSolverCreator):
    def __init__(self, **kwargs):
        self.kwargs = kwargs

    def create(self, nep, lam):
        return GMRESLinSolver(nep, lam, **self.kwargs)


DefaultLinSolverCreator = FactorizeLinSolverCreator


def create_linsolver(creator, nep, lam):
    """(reference ``create_linsolver(creator, nep, lam)``)."""
    if creator is None:
        creator = FactorizeLinSolverCreator()
    if isinstance(creator, type):
        creator = creator()
    return creator.create(nep, lam)
