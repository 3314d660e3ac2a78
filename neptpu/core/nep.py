"""The three-function compute protocol — the core contract of the framework.

Every solver is written against exactly three operations plus ``size``
(reference ``src/NEPCore.jl:56-70``):

1. ``compute_Mder(nep, lam, der)``            -> the matrix M^(der)(lam)
2. ``compute_Mlincomb(nep, lam, V, a, sd)``   -> sum_j a_j M^(j+sd)(lam) V[:, j]
   (THE hot operation — structured types lower it to fused SpMV/SpMM kernels)
3. ``compute_MM(nep, S, V)``                  -> sum_i A_i V f_i(S)

Any one of them suffices: the conversions below re-derive the others through
matrix-function identities (reference ``NEPCore.jl:218-263``).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import matfun

__all__ = [
    "NEP",
    "compute_Mder",
    "compute_Mlincomb",
    "compute_MM",
    "compute_resnorm",
    "mlincomb_from_mder",
    "mlincomb_from_mm",
    "mder_from_mm",
]


def _as_colmat(V):
    V = jnp.asarray(V)
    if V.ndim == 1:
        V = V[:, None]
    return V


class NEP:
    """Abstract nonlinear eigenproblem M(lam) v = 0.

    Subclasses must set ``self.n`` and implement at least one of the compute
    functions; unimplemented ones fall back to conversions when possible.
    """

    n: int = 0

    # -- protocol ----------------------------------------------------------
    @property
    def size(self):
        return self.n

    @property
    def issparse(self):
        return False

    def Mder(self, lam, der: int = 0):
        return self._mder_fallback(lam, der)

    def Mlincomb(self, lam, V, a=None, startder: int = 0):
        return self._mlincomb_fallback(lam, V, a, startder)

    def MM(self, S, V):
        raise NotImplementedError(
            f"No procedure to compute MM for {type(self).__name__}"
        )

    # -- fallbacks ---------------------------------------------------------
    def _mder_fallback(self, lam, der):
        # try MM route; if MM itself is missing this raises NotImplementedError
        return mder_from_mm(self, lam, der)

    def _mlincomb_fallback(self, lam, V, a, startder):
        try:
            return mlincomb_from_mm(self, lam, V, a, startder)
        except NotImplementedError:
            return mlincomb_from_mder(self, lam, V, a, startder)


# ---------------------------------------------------------------------------
# Free-function API mirroring the reference naming.
# ---------------------------------------------------------------------------


def compute_Mder(nep: NEP, lam, der: int = 0):
    return nep.Mder(lam, der)


def compute_Mlincomb(nep: NEP, lam, V, a=None, startder: int = 0):
    return nep.Mlincomb(lam, V, a=a, startder=startder)


def compute_MM(nep: NEP, S, V):
    return nep.MM(S, V)


def compute_resnorm(nep: NEP, lam, v):
    """||M(lam) v|| (reference ``NEPCore.jl:275-279``)."""
    return jnp.linalg.norm(compute_Mlincomb(nep, lam, v))


# ---------------------------------------------------------------------------
# Conversions between the three compute functions.
# ---------------------------------------------------------------------------


def mlincomb_from_mder(nep: NEP, lam, V, a=None, startder: int = 0):
    """Slow fallback: sum_j a_j M^(j+startder)(lam) V[:, j] by assembling each
    derivative matrix (reference ``compute_Mlincomb_from_Mder``)."""
    V = _as_colmat(V)
    k = V.shape[1]
    if a is None:
        a = jnp.ones((k,))
    a = jnp.asarray(a)
    z = None
    for j in range(k):
        term = compute_Mder(nep, lam, j + startder) @ (V[:, j] * a[j])
        z = term if z is None else z + term
    return z


def mlincomb_from_mm(nep: NEP, lam, V, a=None, startder: int = 0):
    """Mlincomb via ONE compute_MM call on a scaled bidiagonal matrix
    (reference ``compute_Mlincomb_from_MM!``, ``NEPCore.jl:218-228``).

    ``S`` is lower-bidiagonal with ``lam`` on the diagonal and
    ``j * a_j/a_{j-1}`` on the subdiagonal, so that for each term function
    ``f(S)[:, 0] = [a_j f^{(j)}(lam)/a_0]`` — zeros in ``a`` are handled by
    zeroing the matching columns of V (same trick as the reference).
    """
    V = _as_colmat(V)
    k = V.shape[1]
    lam = jnp.asarray(lam)
    if a is None:
        a = jnp.ones((k,))
    a = jnp.asarray(a)
    dt = jnp.result_type(V.dtype, lam.dtype, a.dtype)
    nonzero = a != 0
    a_eff = jnp.where(nonzero, a, jnp.ones_like(a)).astype(dt)
    Vz = jnp.where(nonzero[None, :], V.astype(dt), 0)
    m = k + startder
    a_ext = jnp.concatenate([jnp.ones((startder,), dtype=dt), a_eff])
    S = lam.astype(dt) * jnp.eye(m, dtype=dt)
    if m > 1:
        j_idx = jnp.arange(1, m, dtype=dt)
        S = S + jnp.diag(j_idx * a_ext[1:] / a_ext[:-1], k=-1)
    if startder > 0:
        Vz = jnp.concatenate([jnp.zeros((V.shape[0], startder), dtype=dt), Vz], axis=1)
    Z = compute_MM(nep, S, Vz)
    return a_ext[0] * Z[:, 0]


def mder_from_mm(nep: NEP, lam, der: int = 0):
    """M^(der)(lam) via compute_MM with a Jordan-block Kronecker structure
    (reference ``compute_Mder_from_MM``, ``NEPCore.jl:256-263``)."""
    n = nep.n
    lam = jnp.asarray(lam)
    # Our jordan_matrix carries (1..k-1) on the subdiagonal, which absorbs the
    # factorials: f(J)[j, 0] = f^{(j)}(lam).  With S = kron(J, I_n) and
    # V = kron(e_der^T, I_n) (shape n x n(der+1)), the first block column of
    # compute_MM(S, V) is sum_t A_t f_t^{(der)}(lam) = M^(der)(lam).
    J = matfun.jordan_matrix(lam, der + 1)
    S = jnp.kron(J, jnp.eye(n, dtype=J.dtype))
    row = jnp.zeros((1, der + 1), dtype=J.dtype).at[0, der].set(1.0)
    V = jnp.kron(row, jnp.eye(n, dtype=J.dtype))
    W = compute_MM(nep, S, V)
    return W[:, :n]
