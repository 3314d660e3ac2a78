"""Two-sided Rayleigh functional iteration (reference ``src/method_rfi.jl``):
``rfi`` and the bordered variant ``rfi_b``; both need the transposed NEP."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.errmeasure import estimate_error
from ..core.nep import compute_Mder, compute_Mlincomb
from ..ops.linsolve import BackslashLinSolverCreator, create_linsolver, lin_solve
from .common import NoConvergenceException, closest_to, init_vec, setup_solver
from .rf import compute_rf

__all__ = ["rfi", "rfi_b"]


def _dense(M):
    return M if isinstance(M, jnp.ndarray) else M.to_dense()


def rfi(nep, nept, dtype=None, errmeasure=None, tol=None, maxit=100, lam=0.0,
        v=None, u=None, linsolvercreator=None, inner_solver=None, logger=0):
    dtype, em, lg = setup_solver(nep, dtype, errmeasure, logger)
    tol = 1000 * float(jnp.finfo(jnp.result_type(dtype, jnp.float32)).eps) if tol is None else tol
    n = nep.n
    v = init_vec(v, n, dtype, seed=3)
    u = init_vec(u, n, dtype, seed=4)
    v = v / jnp.linalg.norm(v)
    u = u / jnp.linalg.norm(u)
    lam = jnp.asarray(lam, dtype=dtype)
    if linsolvercreator is None:
        linsolvercreator = BackslashLinSolverCreator()
    one = jnp.ones((1,))
    err = np.inf
    for k in range(maxit):
        err = estimate_error(em, lam, u)
        if float(err) < tol:
            return lam, u, v
        lg.iteration(k, errs=err, lams=lam)
        ls = create_linsolver(linsolvercreator, nep, lam)
        ls_t = create_linsolver(linsolvercreator, nept, lam)
        x = lin_solve(ls, compute_Mlincomb(nep, lam, u[:, None], one, startder=1), tol=tol)
        u = (x / jnp.linalg.norm(x)).astype(dtype)
        y = lin_solve(ls_t, compute_Mlincomb(nept, lam, v[:, None], one, startder=1), tol=tol)
        v = (y / jnp.linalg.norm(y)).astype(dtype)
        lam_vec = compute_rf(dtype, nep, u, inner_solver, y=v)
        lam = jnp.asarray(closest_to(lam_vec, lam), dtype=dtype)
    raise NoConvergenceException(lam, u, err, f"Number of iterations exceeded. maxit={maxit}.")


def rfi_b(nep, nept, dtype=None, errmeasure=None, tol=None, maxit=100, lam=0.0,
          v=None, u=None, inner_solver=None, logger=0):
    """Bordered variant (Schreiber 2008, Alg. 5)."""
    dtype, em, lg = setup_solver(nep, dtype, errmeasure, logger)
    tol = 1000 * float(jnp.finfo(jnp.result_type(dtype, jnp.float32)).eps) if tol is None else tol
    n = nep.n
    v = init_vec(v, n, dtype, seed=3)
    u = init_vec(u, n, dtype, seed=4)
    v = v / jnp.linalg.norm(v)
    u = u / jnp.linalg.norm(u)
    lam = jnp.asarray(lam, dtype=dtype)
    one = jnp.ones((1,))
    err = np.inf
    for k in range(maxit):
        err = estimate_error(em, lam, u)
        if float(err) < tol:
            return lam, u, v
        lg.iteration(k, errs=err, lams=lam)
        M = _dense(compute_Mder(nep, lam, 0)).astype(dtype)
        Mdu = compute_Mlincomb(nep, lam, u[:, None], one, startder=1)
        vMd = jnp.conj(v) @ _dense(compute_Mder(nep, lam, 1)).astype(dtype)
        C = jnp.block([
            [M, Mdu[:, None].astype(dtype)],
            [vMd[None, :], jnp.zeros((1, 1), dtype=dtype)],
        ])
        r1 = jnp.concatenate([compute_Mlincomb(nep, lam, u[:, None], one), jnp.zeros((1,), dtype=dtype)])
        s = jnp.linalg.solve(C, -r1)[:-1]
        u = u + s
        u = (u / jnp.linalg.norm(u)).astype(dtype)
        r2 = jnp.concatenate([compute_Mlincomb(nept, lam, v[:, None], one), jnp.zeros((1,), dtype=dtype)])
        t = jnp.linalg.solve(C, -r2)[:-1]
        v = v + t
        v = (v / jnp.linalg.norm(v)).astype(dtype)
        lam_vec = compute_rf(dtype, nep, u, inner_solver, y=v)
        lam = jnp.asarray(closest_to(lam_vec, lam), dtype=dtype)
    raise NoConvergenceException(lam, u, err, f"Number of iterations exceeded. maxit={maxit}.")
