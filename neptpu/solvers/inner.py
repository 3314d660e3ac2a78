"""Inner-outer solver protocol (reference ``src/inner_solver.jl``):
``inner_solve(is, dtype, projnep; sigma, lamv, V, neigs, tol, inner_logger)``
solves the small projected NEP inside nlar/jd/iar-projected extraction.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..core.exceptions import NoConvergenceException
from ..core.errmeasure import ResidualErrmeasure
from ..models.dep import DEP
from ..models.pep import PEP
from ..models.spmf import SPMF_NEP

__all__ = [
    "InnerSolver",
    "DefaultInnerSolver",
    "NewtonInnerSolver",
    "PolyeigInnerSolver",
    "IARInnerSolver",
    "IARChebInnerSolver",
    "SGIterInnerSolver",
    "ContourBeynInnerSolver",
    "NleigsInnerSolver",
    "inner_solve",
    "inner_solve_rf",
]


class InnerSolver:
    pass


class DefaultInnerSolver(InnerSolver):
    pass


class NewtonInnerSolver(InnerSolver):
    def __init__(self, tol=1e-13, maxit=80, starting_vector=":Vk", newton_function=None):
        self.tol = tol
        self.maxit = maxit
        self.starting_vector = starting_vector
        if newton_function is None:
            from .newton import augnewton

            newton_function = augnewton
        self.newton_function = newton_function


class PolyeigInnerSolver(InnerSolver):
    pass


class IARInnerSolver(InnerSolver):
    def __init__(self, tol=1e-13, maxit=80, starting_vector=":ones",
                 normalize_DEPs=":auto", iar_function=None):
        self.tol = tol
        self.maxit = maxit
        self.starting_vector = starting_vector
        self.normalize_DEPs = normalize_DEPs
        if iar_function is None:
            from .iar import iar

            iar_function = iar
        self.iar_function = iar_function


class IARChebInnerSolver(IARInnerSolver):
    """Chebyshev-basis IAR for the inner problem; falls back to Taylor IAR
    until iar_chebyshev lands (the projected problems are analytic near the
    shift so Taylor IAR is mathematically equivalent there)."""


class SGIterInnerSolver(InnerSolver):
    pass


class ContourBeynInnerSolver(InnerSolver):
    def __init__(self, tol=np.sqrt(np.finfo(float).eps), radius=":auto", N=1000):
        self.tol = tol
        self.radius = radius
        self.N = N


class NleigsInnerSolver(InnerSolver):
    def __init__(self, Sigma=":auto", nodes=":auto", tol=1e-6):
        self.Sigma = Sigma
        self.nodes = nodes
        self.tol = tol


def _resolve(is_, nep):
    """DefaultInnerSolver dispatch by orgnep class
    (reference ``inner_solver.jl:243-254``)."""
    if is_ is None:
        is_ = DefaultInnerSolver()
    if isinstance(is_, DefaultInnerSolver):
        org = getattr(nep, "orgnep", nep)
        if isinstance(org, PEP):
            return PolyeigInnerSolver()
        if isinstance(org, DEP):
            return IARChebInnerSolver()
        if isinstance(org, SPMF_NEP) or hasattr(org, "get_fv"):
            return IARInnerSolver()
        return NewtonInnerSolver()
    return is_


def inner_solve(is_, dtype, nep, lamv=None, V=None, sigma=0.0, neigs=10,
                tol=None, j=0, inner_logger=0):
    """Returns (lamv, V) for the projected problem."""
    is_ = _resolve(is_, nep)
    n = nep.n

    if isinstance(is_, PolyeigInnerSolver):
        from .companion import polyeig

        org = getattr(nep, "orgnep", nep)
        Av = [np.asarray(B) for B in nep.get_Av()]
        pep = PEP(Av)
        return polyeig(pep, dtype)

    if isinstance(is_, IARInnerSolver):
        from ..models.spmf import fun_scalar

        work_nep = nep
        if isinstance(getattr(nep, "orgnep", None), DEP) and not isinstance(is_, IARChebInnerSolver):
            pass  # could renormalize the lambda-term; handled generically below
        v0 = np.ones(n) if is_.starting_vector == ":ones" else np.random.default_rng(0).standard_normal(n)
        try:
            # NOTE: the Krylov degree of an infinite-Arnoldi run may
            # exceed the problem dimension (the linearization is
            # infinite-dimensional), so small PROJECTED problems must not
            # be capped at 2n steps — that cap silently limited inner
            # accuracy to ~1e-5 on 5-dim projections (r5 inner-solve sweep)
            out = is_.iar_function(
                work_nep, dtype=dtype, sigma=sigma, neigs=neigs,
                tol=tol if tol is not None else is_.tol,
                maxit=min(is_.maxit, max(2 * n, 40)),
                logger=inner_logger, v=v0,
            )
            lams, VV = out[0], out[1]
            return np.asarray(lams), np.asarray(VV)
        except NoConvergenceException as e:
            return np.asarray(e.lam), np.asarray(e.v)

    if isinstance(is_, NewtonInnerSolver):
        if lamv is None:
            lamv = np.zeros(1, dtype=complex)
        lamv = np.array(np.atleast_1d(lamv), dtype=complex)
        if V is None:
            V = np.random.default_rng(0).standard_normal((n, len(lamv))).astype(complex)
        V = np.array(V, dtype=complex)
        errm = ResidualErrmeasure(nep)
        for k in range(len(lamv)):
            if is_.starting_vector == ":ones":
                v0 = np.ones(n)
            elif is_.starting_vector == ":randn":
                v0 = np.random.default_rng(k).standard_normal(n)
            else:
                v0 = V[:, k]
            try:
                lam1, vproj = is_.newton_function(
                    nep, dtype=dtype, logger=inner_logger, lam=lamv[k], v=v0,
                    maxit=is_.maxit, tol=is_.tol, errmeasure=errm,
                )
                V[:, k] = np.asarray(vproj)
                lamv[k] = complex(lam1)
            except NoConvergenceException as e:
                if e.v is not None:
                    V[:, k] = np.asarray(e.v).reshape(-1)[:n]
                if e.lam is not None:
                    lamv[k] = complex(np.atleast_1d(np.asarray(e.lam))[0])
        return lamv, V

    if isinstance(is_, SGIterInnerSolver):
        from .sgiter import sgiter

        lam, v = sgiter(nep, j if j > 0 else 1, dtype=dtype, logger=inner_logger)
        return np.array([complex(lam)]), np.asarray(v)[:, None]

    if isinstance(is_, ContourBeynInnerSolver):
        from .contour import contour_beyn

        lamv = np.atleast_1d(np.asarray(lamv if lamv is not None else [0, 1]))
        if is_.radius == ":auto":
            radius = float(np.max(np.abs(sigma - lamv))) * 1.5 + 1e-8
        else:
            radius = is_.radius
        k = int(min(neigs, n - 1)) if n > 1 else 1
        lams, V_ = contour_beyn(nep, dtype=dtype, neigs=k, sigma=sigma, radius=radius,
                                N=is_.N, tol=is_.tol, sanity_check=False,
                                logger=inner_logger)
        return np.asarray(lams), np.asarray(V_)

    if isinstance(is_, NleigsInnerSolver):
        from .nleigs import nleigs

        lamv = np.atleast_1d(np.asarray(lamv if lamv is not None else [0, 1], dtype=complex))
        if is_.Sigma == ":auto":
            sg = np.mean(lamv)
            r = float(np.max(np.abs(sg - lamv))) * 1.5 + 1e-8
            th = np.linspace(0, 2 * np.pi, 1000)
            Sigma = sg + r * np.exp(1j * th)
        else:
            Sigma = is_.Sigma
        nodes = [0.0 + 0.0j] if is_.nodes == ":auto" else is_.nodes
        lams, V_, _, _ = nleigs(nep, Sigma, nodes=nodes,
                                tol=tol if tol is not None else is_.tol,
                                static=True)
        return np.asarray(lams), np.asarray(V_)

    raise ValueError(f"unknown inner solver {is_}")


def inner_solve_rf(dtype, nep, x, inner_solver, y=None, target=0.0, lam=None):
    """compute_rf through a 1x1 projected NEP + any InnerSolver
    (reference ``compute_rf_wrapper.jl:82-107``)."""
    from ..models.projection import create_proj_NEP

    x = np.asarray(x)
    y = x if y is None else np.asarray(y)
    pnep = create_proj_NEP(nep, 1)
    pnep.set_projectmatrices(y[:, None] / np.linalg.norm(y), x[:, None] / np.linalg.norm(x))
    lams, _ = inner_solve(inner_solver, dtype, pnep, lamv=np.array([lam if lam is not None else target]),
                          sigma=target, neigs=1)
    lams = np.atleast_1d(np.asarray(lams))
    return lams[np.argsort(np.abs(lams - complex(target)))]
