"""Krylov orthogonalization kernels (replacing IterativeSolvers.jl's
``orthogonalize_and_normalize!``; call sites e.g. reference
``method_iar.jl:107``).

On TPU these are tall-skinny GEMMs (V^H w) + AXPYs — pure MXU work; in the
sharded path the Gram products become psum-reduced partial dots
(see ``neptpu/parallel``).  Strategies: DGKS (iterated classical GS with the
eta-criterion), classical GS, modified GS.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.exceptions import LostOrthogonalityException

__all__ = ["DGKS", "ClassicalGS", "ModifiedGS", "orthogonalize_and_normalize"]


class DGKS:
    def __init__(self, eta: float = 1 / jnp.sqrt(2), max_reorth: int = 3):
        self.eta = float(eta)
        self.max_reorth = max_reorth


class ClassicalGS:
    pass


class ModifiedGS:
    pass


@jax.jit
def _cgs_step(V, w):
    h = V.conj().T @ w
    return w - V @ h, h


def orthogonalize_and_normalize(V, w, method=None):
    """Orthogonalize w against the (orthonormal) columns of V.

    Returns ``(w_out, h, beta)`` with ``w_out`` unit-norm, ``h`` the projection
    coefficients (accumulated over reorthogonalizations) and ``beta`` the
    normalization factor — the (k+1, k) Hessenberg entry.
    """
    if method is None:
        method = DGKS()
    if not isinstance(method, (DGKS, ClassicalGS, ModifiedGS)):
        # user-supplied orthogonalization (reference: custom
        # OrthogonalizationMethod dispatch, test/tiar.jl:6-17): any
        # callable with the same (V, w) -> (w_unit, h, beta) contract
        if callable(method):
            return method(V, w)
        raise TypeError(
            f"orthmethod must be DGKS/ClassicalGS/ModifiedGS or a "
            f"callable (V, w) -> (w, h, beta); got {type(method).__name__}")
    w = jnp.asarray(w)
    k = V.shape[1]
    dt = jnp.result_type(V.dtype, w.dtype)
    V = V.astype(dt)
    w = w.astype(dt)
    if k == 0:
        beta = jnp.linalg.norm(w)
        return w / beta, jnp.zeros((0,), dtype=dt), beta

    if isinstance(method, ModifiedGS):
        h = []
        for j in range(k):
            hj = jnp.vdot(V[:, j], w)
            w = w - hj * V[:, j]
            h.append(hj)
        h = jnp.stack(h)
    elif isinstance(method, ClassicalGS):
        w, h = _cgs_step(V, w)
    else:  # DGKS
        norm0 = jnp.linalg.norm(w)
        w, h = _cgs_step(V, w)
        for _ in range(method.max_reorth):
            norm1 = jnp.linalg.norm(w)
            if float(norm1) > method.eta * float(norm0):
                break
            norm0 = norm1
            w, dh = _cgs_step(V, w)
            h = h + dh
    beta = jnp.linalg.norm(w)
    if float(beta) == 0.0:
        raise LostOrthogonalityException("breakdown: candidate vector in span of basis")
    return w / beta, h, beta
