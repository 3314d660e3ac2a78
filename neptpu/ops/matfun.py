"""Matrix functions on small dense matrices + derivative tables.

The SPMF contract (reference ``src/NEPTypes.jl:86-113``) is that each term
function ``f_i`` is defined both for scalars and for small square matrices
("matrix function" sense, e.g. ``exp`` = matrix exponential).  In neptpu the
contract is: **f takes a square jnp array (k, k) and returns f(S) as a (k, k)
array**, built from the primitives in this module (all traceable; all valid for
*defective* matrices, which matters because the derivative-table trick feeds f
with Jordan-chain matrices).

Key trick (reference ``NEPTypes.jl:984-994`` and ``NEPCore.jl:218-228``): for
the lower-bidiagonal matrix ``S`` with ``lambda`` on the diagonal and
``s_j = j * a_j / a_{j-1}`` on the subdiagonal, the first column of ``f(S)`` is
``[a_j * f^{(j)}(lambda) / a_0]_j`` — i.e. exactly the scaled derivative
weights ``compute_Mlincomb`` needs, with no factorial overflow.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.linalg import expm as _expm

__all__ = [
    "eye_like",
    "expm",
    "inv",
    "sqrtm",
    "sinm",
    "cosm",
    "sinhm",
    "coshm",
    "jordan_matrix",
    "deriv_weights",
    "deriv_table",
    "fun_derivatives",
    "with_derivs",
    "DerivFun",
]


class DerivFun:
    """A matrix function carrying a closed-form host-side derivative table.

    ``__call__(S)`` is the traceable matrix function (the SPMF contract);
    ``derivs(lam, k)`` returns ``[f(lam), f'(lam), ..., f^{(k-1)}(lam)]`` as
    a numpy complex128 array, independent of the jax x64/backend config —
    this is what lets the complex-as-real TPU solver path precompute exact
    f64 coefficient tables on the host even when the accelerator exposes
    only real f32 (``solvers/spmf_real.py``).
    """

    def __init__(self, fn, derivs):
        self._fn = fn
        self._derivs = derivs

    def __call__(self, S):
        return self._fn(S)

    def derivs(self, lam, k):
        import numpy as np

        return np.asarray(self._derivs(complex(lam), int(k)),
                          dtype=np.complex128)


def with_derivs(fn, derivs):
    """Attach a closed-form derivative rule to a matrix function."""
    return DerivFun(fn, derivs)


def eye_like(S):
    """Identity matrix matching S (the reference's ``one(S)``)."""
    S = jnp.asarray(S)
    if S.ndim == 0:
        return jnp.ones((), dtype=S.dtype)
    return jnp.eye(S.shape[-1], dtype=S.dtype)


def _is_scalar(S):
    return jnp.asarray(S).ndim == 0


def expm(S):
    """Matrix exponential (scalar-safe)."""
    S = jnp.asarray(S)
    if _is_scalar(S):
        return jnp.exp(S)
    return _expm(S)


def inv(S):
    S = jnp.asarray(S)
    if _is_scalar(S):
        return 1.0 / S
    return jnp.linalg.inv(S)


def sqrtm(S, iters: int = 40):
    """Principal matrix square root via the Denman–Beavers iteration.

    Traceable and valid for defective matrices with no eigenvalue on the closed
    negative real axis — the case that matters for the gun/waveguide-style
    ``sqrt`` terms (reference GalleryWaveguide ``sqrt_schur_pos_imag`` uses a
    Schur route; here the DB iteration keeps the whole path jittable).
    """
    S = jnp.asarray(S)
    if _is_scalar(S):
        return jnp.sqrt(S)
    n = S.shape[-1]
    I = jnp.eye(n, dtype=jnp.result_type(S, jnp.float32))

    def body(i, YZ):
        Y, Z = YZ
        Yi = jnp.linalg.inv(Y)
        Zi = jnp.linalg.inv(Z)
        return (0.5 * (Y + Zi), 0.5 * (Z + Yi))

    Y, Z = jax.lax.fori_loop(0, iters, body, (S.astype(I.dtype), I))
    return Y


def sinm(S):
    S = jnp.asarray(S)
    if _is_scalar(S):
        return jnp.sin(S)
    cdt = jnp.result_type(S, jnp.complex64)
    E = _expm(1j * S.astype(cdt))
    Em = _expm(-1j * S.astype(cdt))
    R = (E - Em) / 2j
    return R.real.astype(S.dtype) if jnp.issubdtype(S.dtype, jnp.floating) else R


def cosm(S):
    S = jnp.asarray(S)
    if _is_scalar(S):
        return jnp.cos(S)
    cdt = jnp.result_type(S, jnp.complex64)
    E = _expm(1j * S.astype(cdt))
    Em = _expm(-1j * S.astype(cdt))
    R = (E + Em) / 2
    return R.real.astype(S.dtype) if jnp.issubdtype(S.dtype, jnp.floating) else R


def sinhm(S):
    S = jnp.asarray(S)
    if _is_scalar(S):
        return jnp.sinh(S)
    return (_expm(S) - _expm(-S)) / 2


def coshm(S):
    S = jnp.asarray(S)
    if _is_scalar(S):
        return jnp.cosh(S)
    return (_expm(S) + _expm(-S)) / 2


def jordan_matrix(lam, k, dtype=None):
    """k x k Jordan-chain matrix: lam on the diagonal, (1..k-1) on the
    subdiagonal; ``f(J) e_1 = [f, f', ..., f^{(k-1)}](lam)``.

    (Reference ``NEPCore.jl`` ``jordan_matrix`` plays the same role.)
    """
    lam = jnp.asarray(lam)
    if dtype is None:
        dtype = lam.dtype
    J = lam * jnp.eye(k, dtype=dtype)
    if k > 1:
        sub = jnp.arange(1, k, dtype=dtype)
        J = J + jnp.diag(sub, k=-1)
    return J


def deriv_weights(f, lam, a, startder: int = 0):
    """Weights ``w_j = a_j * f^{(j+startder)}(lam)`` for j = 0..len(a)-1.

    Implements the scaled bidiagonal trick (``NEPTypes.jl:984-994``): zeros in
    ``a`` are handled by substituting ratio 1 and masking the output, so
    one-hot ``a`` recovers a single derivative (used by compute_Mder).
    """
    a = jnp.asarray(a)
    k = a.shape[0]
    lam = jnp.asarray(lam)
    dt = jnp.result_type(lam, a, jnp.float32)
    a = a.astype(dt)
    nonzero = a != 0
    a_eff = jnp.where(nonzero, a, jnp.ones_like(a))
    m = k + startder
    # subdiagonal s_j = j * a_eff[j]/a_eff[j-1]   (a_eff index shifted by startder)
    a_ext = jnp.concatenate([jnp.ones((startder,), dtype=dt), a_eff])
    j_idx = jnp.arange(1, m, dtype=dt)
    sub = j_idx * a_ext[1:] / a_ext[:-1]
    S = lam.astype(dt) * jnp.eye(m, dtype=dt)
    if m > 1:
        S = S + jnp.diag(sub, k=-1)
    F = f(S)
    # F[j, 0] = f^{(j)}(lam) * a_ext[j] / a_ext[0]  (telescoping product)
    col = F[:, 0] * a_ext[0]
    w = col[startder:]
    # entries where a_j was exactly zero must contribute zero weight
    return jnp.where(nonzero, w, jnp.zeros_like(w))


def fun_derivatives(f, lam, k, startder: int = 0):
    """[f^{(startder)}, ..., f^{(startder+k-1)}](lam) (unscaled derivatives)."""
    return deriv_weights(f, lam, jnp.ones((k,)), startder=startder)


def deriv_table(fv, lam, a, startder: int = 0):
    """Stacked weights D[i, j] = a_j * f_i^{(j+startder)}(lam) for a list of
    term functions.  This is the per-call table behind the generic SPMF
    compute_Mlincomb (``NEPTypes.jl:972-1011``)."""
    rows = [deriv_weights(f, lam, a, startder=startder) for f in fv]
    return jnp.stack(rows)
