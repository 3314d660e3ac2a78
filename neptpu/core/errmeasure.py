"""Error-measure strategy objects (reference ``src/errmeasure.jl``).

``estimate_error(errm, lam, v)`` returns the convergence measure a solver
iterates on.  ``DefaultErrmeasure`` picks backward error for SPMF problems and
plain relative residual otherwise (reference ``errmeasure.jl:91-101``); a bare
Python callable ``(lam, v) -> err`` is accepted anywhere an Errmeasure is
(reference ``:140-142``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .nep import compute_Mlincomb

__all__ = [
    "Errmeasure",
    "ResidualErrmeasure",
    "StandardSPMFErrmeasure",
    "EigvalReferenceErrmeasure",
    "DefaultErrmeasure",
    "estimate_error",
]


class Errmeasure:
    def __call__(self, lam, v):
        raise NotImplementedError


class _JitOrEagerErrmeasure(Errmeasure):
    """Shared machinery: compile the measure once (lam/v as traced args, so
    new Ritz values do NOT retrace) and fall back to eager evaluation for
    NEPs whose term functions are host-only (e.g. mpmath-backed fiber)."""

    def _measure(self, lam, v):  # overridden
        raise NotImplementedError

    def __call__(self, lam, v):
        lam = jnp.asarray(lam)
        v = jnp.asarray(v)
        fn = getattr(self, "_fn", None)
        if fn is None:
            fn = jax.jit(self._measure)
            try:
                out = fn(lam, v)
            except Exception:
                fn = self._measure
                out = fn(lam, v)
            self._fn = fn
            return out
        return fn(lam, v)


class ResidualErrmeasure(_JitOrEagerErrmeasure):
    """||M(lam) v|| / ||v|| (reference ``errmeasure.jl:114-130``)."""

    def __init__(self, nep):
        self.nep = nep

    def _measure(self, lam, v):
        return jnp.linalg.norm(compute_Mlincomb(self.nep, lam, v)) / jnp.linalg.norm(v)


class StandardSPMFErrmeasure(_JitOrEagerErrmeasure):
    """Backward error with precomputed Frobenius coefficients
    (reference ``errmeasure.jl:174-191``):
    ||M(lam)v|| / (sum_i |f_i(lam)| ||A_i||_F ||v||)."""

    def __init__(self, nep):
        self.nep = nep
        bank = getattr(nep, "bank", None)
        self.coeffs = bank.fro_norms if bank is not None else None

    def _measure(self, lam, v):
        nep = self.nep
        num = jnp.linalg.norm(compute_Mlincomb(nep, lam, v))
        fvals = jnp.abs(nep.fv_scalar(lam))
        if self.coeffs is not None and self.coeffs.shape[0] == fvals.shape[0]:
            denom = jnp.sum(fvals * self.coeffs)
        else:
            Av = nep.get_Av()
            norms = jnp.stack(
                [
                    jnp.linalg.norm(A) if isinstance(A, jnp.ndarray)
                    else jnp.linalg.norm(A.data)
                    for A in Av
                ]
            )
            denom = jnp.sum(fvals * norms)
        return num / (denom * jnp.linalg.norm(v))


class EigvalReferenceErrmeasure(Errmeasure):
    """|lam - lam_ref| (reference ``errmeasure.jl:228-239``)."""

    def __init__(self, nep, lam_ref):
        self.lam_ref = lam_ref

    def __call__(self, lam, v):
        return jnp.abs(jnp.asarray(lam) - self.lam_ref)


def DefaultErrmeasure(nep):
    from ..models.spmf import AbstractSPMF

    if isinstance(nep, AbstractSPMF):
        return StandardSPMFErrmeasure(nep)
    return ResidualErrmeasure(nep)


def estimate_error(errmeasure, lam, v):
    return errmeasure(lam, v)


def make_errmeasure(errmeasure, nep):
    """Normalize a user-supplied errmeasure argument (None / class / callable)."""
    if errmeasure is None:
        return DefaultErrmeasure(nep)
    if isinstance(errmeasure, type):
        return errmeasure(nep)
    return errmeasure
