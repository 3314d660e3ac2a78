"""Companion linearization + linear solve for polynomial NEPs
(reference ``src/method_companion.jl``): ``companion`` (Mehrmann-Voss form),
``polyeig`` for PEP, and the Chebyshev colleague-matrix ``polyeig`` for
ChebPEP (Amiraslani/Corless/Lancaster; Effenberger-Kressner).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models.pep import PEP
from ..ops.eigsolve import DefaultEigSolver, eig_solve

__all__ = ["companion", "polyeig"]


def companion(pep: PEP):
    """Companion pencil (E, A) with A x = lam E x of size dn x dn
    (reference ``method_companion.jl:30-95``)."""
    n = pep.n
    d = pep.degree
    Av = [np.asarray(A if isinstance(A, jnp.ndarray) else A.to_dense()) for A in pep.get_Av()]
    dt = Av[0].dtype
    E = np.zeros((d * n, d * n), dtype=dt)
    A = np.zeros((d * n, d * n), dtype=dt)
    E[:n, :n] = Av[d]
    E[n:, n:] = np.eye((d - 1) * n, dtype=dt)
    for i in range(1, d + 1):
        A[:n, (i - 1) * n : i * n] = Av[d - i]
    A[n:, : (d - 1) * n] = -np.eye((d - 1) * n, dtype=dt)
    return jnp.asarray(E), jnp.asarray(-A)


def _polyeig_pep(pep: PEP, dtype, eigsolvertype):
    E, A = companion(pep)
    solver = eigsolvertype(A, E)
    D, V = eig_solve(solver, target=1.0, nev=A.shape[0])
    return D, V[: pep.n, :]


def _polyeig_cheb(chebpep, dtype, eigsolvertype):
    """Colleague-matrix linearization in the Chebyshev basis
    (reference ``method_companion.jl:133-170``)."""
    from ..ops import lapack

    k = chebpep.k
    n = chebpep.n
    Fk = [np.asarray(F if isinstance(F, jnp.ndarray) else F.to_dense())
          for F in chebpep.get_Av()]
    L0 = np.zeros((n * (k - 1), n * (k - 1)), dtype=complex)
    L1 = np.zeros((n * (k - 1), n * (k - 1)), dtype=complex)
    I = np.eye(n)
    for j in range(1, k - 1):
        L0[(j - 1) * n : j * n, j * n : (j + 1) * n] = I
        L0[j * n : (j + 1) * n, (j - 1) * n : j * n] = I
    for j in range(1, k):
        L0[(k - 2) * n :, (j - 1) * n : j * n] = -Fk[j - 1]
    L0[(k - 2) * n :, (k - 3) * n : (k - 2) * n] += Fk[k - 1]
    for j in range(1, k - 1):
        factor = 1.0 if j == 1 else 2.0
        L1[(j - 1) * n : j * n, (j - 1) * n : j * n] = factor * I
    L1[(k - 2) * n :, (k - 2) * n :] = 2 * Fk[k - 1]
    D, V = lapack.geig(jnp.asarray(L0), jnp.asarray(L1))
    D = np.asarray(D)
    V = np.asarray(V)
    a, b = chebpep.a, chebpep.b
    lams = (b - a) * (D + 1) / 2 + a
    Vout = V[:n, :]
    Vout = Vout / np.linalg.norm(Vout, axis=0, keepdims=True)
    return jnp.asarray(lams), jnp.asarray(Vout)


def polyeig(pep, dtype=None, eigsolvertype=DefaultEigSolver):
    """Solve a polynomial NEP by companion linearization; dispatches on
    monomial PEP vs ChebPEP like the reference."""
    from ..models.cheb import ChebPEP

    if isinstance(pep, ChebPEP):
        return _polyeig_cheb(pep, dtype, eigsolvertype)
    return _polyeig_pep(pep, dtype, eigsolvertype)
