"""Shared solver conventions (reference kwargs protocol,
``method_newton.jl:241-256``): every solver takes
``(nep; dtype, errmeasure, tol, maxit, lam, v, logger, linsolvercreator, ...)``,
throws NoConvergenceException carrying partial results, and returns
``(lam, v)`` or ``(lams, V)``.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.errmeasure import estimate_error, make_errmeasure
from ..core.exceptions import NoConvergenceException
from ..core.logger import parse_logger

__all__ = [
    "default_tol",
    "armijo_rule",
    "closest_to",
    "init_vec",
    "setup_solver",
    "NoConvergenceException",
]


def default_tol(dtype):
    """100*eps(real(T)) — the Newton-family default (``method_newton.jl:49``)."""
    return 100 * float(jnp.finfo(jnp.result_type(dtype, jnp.float32)).eps)


def init_vec(v, n, dtype, seed: int = 0):
    """Starting vector: user-provided or reproducible standard-normal
    (the reference uses randn; we pin a seed for determinism)."""
    if v is None:
        v = np.random.default_rng(seed).standard_normal(n)
    return jnp.asarray(v, dtype=dtype)


def setup_solver(nep, dtype, errmeasure, logger):
    """Normalize the common kwargs: (dtype, errmeasure object, Logger)."""
    if dtype is None:
        dtype = jnp.complex128
    dtype = jnp.dtype(dtype)
    em = make_errmeasure(errmeasure, nep)
    lg = parse_logger(logger)
    return dtype, em, lg


def scalar_as(lam, dtype):
    """Cast a (possibly python-complex) scalar to dtype, dropping a negligible
    imaginary part when dtype is real (the reference's real-mode truncation)."""
    lam = complex(lam)
    if np.dtype(dtype).kind == "f":
        return jnp.asarray(lam.real, dtype=dtype)
    return jnp.asarray(lam, dtype=dtype)


def vec_as(x, dtype):
    """Cast a vector to dtype; for real dtype, drop the (negligible)
    imaginary part explicitly to avoid complex->real cast warnings."""
    x = jnp.asarray(x)
    if np.dtype(dtype).kind == "f" and jnp.iscomplexobj(x):
        x = x.real
    return x.astype(dtype)


def closest_to(lam_vec, lam):
    """Entry of lam_vec closest to lam (reference helper in resinv/rfi)."""
    lam_vec = np.atleast_1d(np.asarray(lam_vec))
    return lam_vec[np.argmin(np.abs(lam_vec - complex(lam)))]


def armijo_rule(nep, errmeasure, err0, lam, v, dlam, dv, factor, armijo_max):
    """Step-length damping: shrink (dlam, dv) by ``factor`` until the error
    measure decreases (reference ``method_newton.jl:597-609``)."""
    j = 0
    if factor < 1:
        while (
            float(estimate_error(errmeasure, lam + dlam, v + dv)) > float(err0)
            and j < armijo_max
        ):
            j += 1
            dv = dv * factor
            dlam = dlam * factor
    return dlam, dv, j, factor**j
