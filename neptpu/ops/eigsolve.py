"""Inner *linear* eigensolver layer (reference ``LinSolvers.jl:258-469``):
used by mslp, sgiter, polyeig, broyden.

* ``EigenEigSolver`` — dense (generalized) eig via the host-callback LAPACK
  wrappers (k x k, off the hot path).
* ``ArnoldiEigSolver`` — shift-invert Arnoldi built on our own Krylov kernels
  (LU of (target*B - A) + Arnoldi with DGKS reorthogonalization), the
  TPU-side replacement for ArnoldiMethod.jl's partialschur.
* ``DefaultEigSolver`` — dispatches on sparsity like the reference.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import lapack
from .sparse import CSR

__all__ = [
    "EigSolver",
    "EigenEigSolver",
    "ArnoldiEigSolver",
    "DefaultEigSolver",
    "eig_solve",
]


def _is_sparse(A):
    return isinstance(A, CSR)


def _dense(A):
    return A.to_dense() if _is_sparse(A) else jnp.asarray(A)


class EigSolver:
    def solve(self, nev=1, target=0.0):
        raise NotImplementedError


def eig_solve(solver: EigSolver, nev=1, target=0.0):
    """Returns (D, V): eigenvalues sorted by distance to target."""
    return solver.solve(nev=nev, target=target)


class EigenEigSolver(EigSolver):
    def __init__(self, A, B=None):
        self.A = _dense(A)
        self.B = None if B is None else _dense(B)

    def solve(self, nev=1, target=0.0):
        if self.B is None:
            D, V = lapack.eig(self.A)
        else:
            D, V = lapack.geig(self.A, self.B)
        D = np.asarray(D)
        V = np.asarray(V)
        order = np.argsort(np.abs(D - complex(target)))
        D = D[order][:nev]
        V = V[:, order][:, :nev]
        return jnp.asarray(D), jnp.asarray(V)


class ArnoldiEigSolver(EigSolver):
    """Shift-invert Arnoldi: eig of (target*B - A)^{-1} B, largest magnitude,
    then the reverse transform D = target - 1/D0
    (reference ``LinSolvers.jl:395-416``)."""

    def __init__(self, A, B=None, maxdim: int = 80, tol: float = 1e-10):
        self.A = A
        self.B = B
        self.maxdim = maxdim
        self.tol = tol

    def solve(self, nev=1, target=0.0):
        import jax.scipy.linalg as jsl

        A = _dense(self.A)
        n = A.shape[0]
        B = jnp.eye(n, dtype=A.dtype) if self.B is None else _dense(self.B)
        cdt = jnp.result_type(A.dtype, jnp.complex64)
        C = (complex(target) * B - A).astype(cdt)
        lu_piv = jsl.lu_factor(C)
        Bc = B.astype(cdt)

        def op(x):
            return jsl.lu_solve(lu_piv, Bc @ x)

        m = min(self.maxdim, n)
        rng = np.random.default_rng(1)
        v0 = jnp.asarray(rng.standard_normal(n), dtype=cdt)
        V = np.zeros((n, m + 1), dtype=complex)
        H = np.zeros((m + 1, m), dtype=complex)
        V[:, 0] = np.asarray(v0 / jnp.linalg.norm(v0))
        k_eff = m
        for k in range(m):
            w = np.asarray(op(jnp.asarray(V[:, k])))
            # DGKS two-pass reorthogonalization
            for _ in range(2):
                h = V[:, : k + 1].conj().T @ w
                w = w - V[:, : k + 1] @ h
                H[: k + 1, k] += h
            beta = np.linalg.norm(w)
            H[k + 1, k] = beta
            if beta < 1e-14:
                k_eff = k + 1
                break
            V[:, k + 1] = w / beta
        Hk = H[:k_eff, :k_eff]
        D0, Z = np.linalg.eig(Hk)
        order = np.argsort(-np.abs(D0))
        D0 = D0[order][:nev]
        Z = Z[:, order][:, :nev]
        D = complex(target) - 1.0 / D0
        Vout = V[:, :k_eff] @ Z
        return jnp.asarray(D), jnp.asarray(Vout)


class DefaultEigSolver(EigSolver):
    def __init__(self, A, B=None):
        if _is_sparse(A) and _dense(A).shape[0] > 400:
            self.sub = ArnoldiEigSolver(A, B)
        else:
            self.sub = EigenEigSolver(A, B)

    def solve(self, nev=1, target=0.0):
        return self.sub.solve(nev=nev, target=target)
