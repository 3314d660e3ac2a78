"""Global configuration: dtype policy and x64 control.

The reference library (NEP-PACK) treats the arithmetic type as a first-class
parameter of every solver (e.g. ``newton(Float64, nep)``; see reference
``src/method_newton.jl:45-46`` and the promotion contract in
``src/NEPTypes.jl:142,162-170``).  On the JAX side that translates into a
dtype policy: solvers take a ``dtype`` argument, problem types carry the dtype
of their operand data, and results follow ``jnp.result_type`` promotion.

Double precision is required to reach the reference test tolerances (down to
``100*eps(Float64)``), so x64 mode is enabled at import unless the user opts
out by setting ``NEPTPU_DISABLE_X64=1`` (the TPU benchmark kernels run in
float32/bfloat16 explicitly regardless of this flag).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

if os.environ.get("NEPTPU_DISABLE_X64", "0") != "1":
    jax.config.update("jax_enable_x64", True)

__all__ = [
    "default_real",
    "default_complex",
    "complex_of",
    "real_of",
    "result_type",
]


def default_real():
    """Default real dtype (float64 when x64 is on, else float32)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def default_complex():
    """Default complex dtype (complex128 when x64 is on, else complex64)."""
    return jnp.complex128 if jax.config.jax_enable_x64 else jnp.complex64


def complex_of(dtype):
    """The complex dtype with the same precision as ``dtype``."""
    return jnp.result_type(dtype, jnp.complex64)


def real_of(dtype):
    """The real dtype with the same precision as ``dtype``."""
    return jnp.finfo(dtype).dtype if jnp.issubdtype(dtype, jnp.floating) else jnp.real(
        jnp.zeros((), dtype)
    ).dtype


def result_type(*args):
    """Promotion rule used throughout: mirrors the reference's
    ``promote_type(eltype(lambda), Ftype)`` contract (``NEPTypes.jl:162-170``)."""
    return jnp.result_type(*args)
