"""Method of successive linear problems (reference ``src/method_mslp.jl``):
one generalized eigensolve of the pencil (M(lam), M'(lam)) per iteration."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.errmeasure import estimate_error
from ..core.nep import compute_Mder
from ..ops.eigsolve import DefaultEigSolver, eig_solve
from .common import NoConvergenceException, default_tol, setup_solver

__all__ = ["mslp"]


def mslp(nep, dtype=None, errmeasure=None, tol=None, maxit=100, lam=0.0, logger=0,
         eigsolvertype=DefaultEigSolver):
    dtype, em, lg = setup_solver(nep, dtype, errmeasure, logger)
    tol = default_tol(dtype) if tol is None else tol
    lam = jnp.asarray(lam, dtype=dtype)
    v = None
    err = np.inf
    for k in range(maxit):
        solver = eigsolvertype(compute_Mder(nep, lam, 0), compute_Mder(nep, lam, 1))
        d, V = eig_solve(solver, target=0.0, nev=1)
        lam = (lam - d[0]).astype(dtype)
        v = V[:, 0]
        v = (v / jnp.linalg.norm(v)).astype(dtype)
        err = estimate_error(em, lam, v)
        lg.iteration(k, errs=err, lams=lam)
        if float(err) < tol:
            return lam, v
    raise NoConvergenceException(lam, v, err, f"Number of iterations exceeded. maxit={maxit}.")
