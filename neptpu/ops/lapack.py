"""Small dense (generalized) eigen/Schur solves via host callbacks.

TPUs have no nonsymmetric eigensolver; the reference leans on LAPACK for
exactly these ops (Ritz extraction `eigen(H)` in ``method_iar.jl:112``,
generalized `eigen(K, H)` in ``method_nleigs.jl``, `schur` for matrix sqrt in
``Waveguide.jl:116-140``).  All of these are k x k with k <~ a few hundred and
sit OFF the hot path, so the TPU-native design is: run them on the host via
``jax.pure_callback`` with pinned complex128 output shapes.  Everything stays
traceable/jittable; on CPU backends the callback is near-free.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["eig", "eigvals", "geig", "schur", "ordschur_inside", "qz"]

_C = np.complex128


def _cb(fn, shapes, *args):
    out_avals = tuple(jax.ShapeDtypeStruct(s, _C) for s in shapes)
    return jax.pure_callback(fn, out_avals, *args, vmap_method="sequential")


def eig(A):
    """Eigen-decomposition of a general square matrix: returns (w, V)."""
    A = jnp.asarray(A)
    k = A.shape[-1]

    def _impl(A):
        w, V = np.linalg.eig(np.asarray(A, dtype=_C))
        return w.astype(_C), V.astype(_C)

    return _cb(_impl, [(k,), (k, k)], A)


def eigvals(A):
    A = jnp.asarray(A)
    k = A.shape[-1]

    def _impl(A):
        return (np.linalg.eigvals(np.asarray(A, dtype=_C)).astype(_C),)

    return _cb(_impl, [(k,)], A)[0]


def geig(A, B):
    """Generalized eigenproblem A x = lam B x: returns (w, V)."""
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    k = A.shape[-1]

    def _impl(A, B):
        import scipy.linalg as sla

        w, V = sla.eig(np.asarray(A, dtype=_C), np.asarray(B, dtype=_C))
        return w.astype(_C), V.astype(_C)

    return _cb(_impl, [(k,), (k, k)], A, B)


def schur(A):
    """Complex Schur decomposition A = Z T Z^H: returns (T, Z)."""
    A = jnp.asarray(A)
    k = A.shape[-1]

    def _impl(A):
        import scipy.linalg as sla

        T, Z = sla.schur(np.asarray(A, dtype=_C), output="complex")
        return T.astype(_C), Z.astype(_C)

    return _cb(_impl, [(k, k), (k, k)], A)


def ordschur_inside(A, center, radius):
    """Schur form with eigenvalues inside |lam - center| < radius ordered first.

    Returns (T, Z, count) where count is the number of selected eigenvalues
    (as a float packed into a complex scalar; callers cast to int on host).
    """
    A = jnp.asarray(A)
    k = A.shape[-1]

    def _impl(A, c, r):
        import scipy.linalg as sla

        TT, ZZ = sla.schur(
            np.asarray(A, dtype=_C),
            output="complex",
            sort=lambda x: abs(x - complex(c)) < float(np.real(r)),
        )[:2]
        cnt = np.sum(np.abs(np.diag(TT) - complex(c)) < float(np.real(r)))
        return TT.astype(_C), ZZ.astype(_C), np.asarray(cnt, dtype=_C)

    return _cb(_impl, [(k, k), (k, k), ()], A, jnp.asarray(center, dtype=_C), jnp.asarray(radius, dtype=_C))


def qz(A, B):
    """Generalized (QZ) Schur decomposition: returns (AA, BB, Q, Z)."""
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    k = A.shape[-1]

    def _impl(A, B):
        import scipy.linalg as sla

        AA, BB, Q, Z = sla.qz(np.asarray(A, dtype=_C), np.asarray(B, dtype=_C), output="complex")
        return AA.astype(_C), BB.astype(_C), Q.astype(_C), Z.astype(_C)

    return _cb(_impl, [(k, k)] * 4, A, B)
