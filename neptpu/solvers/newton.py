"""Newton-type solvers (reference ``src/method_newton.jl``):
``newton``, ``augnewton``, ``resinv``, ``quasinewton``, ``newtonqr``,
``implicitdet`` — all written against the three-function protocol; linear
solves go through the creator/cache layer so factorizations amortize exactly
like the reference's cached LU.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.errmeasure import estimate_error
from ..core.nep import compute_Mder, compute_Mlincomb
from ..ops.linsolve import create_linsolver, lin_solve
from .common import (
    NoConvergenceException,
    armijo_rule,
    closest_to,
    default_tol,
    init_vec,
    scalar_as,
    setup_solver,
    vec_as,
)
from .rf import compute_rf

__all__ = ["newton", "augnewton", "resinv", "quasinewton", "newtonqr", "implicitdet"]


def _dense(M):
    return M if isinstance(M, jnp.ndarray) else M.to_dense()


def newton(nep, dtype=None, errmeasure=None, tol=None, maxit=10, lam=0.0, v=None,
           c=None, logger=0, armijo_factor=1.0, armijo_max=5):
    """Newton-Raphson on [M(lam)v; c^H v - 1] = 0 with the bordered dense
    Jacobian (reference ``method_newton.jl:45-107``)."""
    dtype, em, lg = setup_solver(nep, dtype, errmeasure, logger)
    tol = default_tol(dtype) if tol is None else tol
    n = nep.n
    v = init_vec(v, n, dtype)
    c = v if c is None else jnp.asarray(c, dtype=dtype)
    lam = jnp.asarray(lam, dtype=dtype)
    v = v / jnp.vdot(c, v)
    err = np.inf
    for k in range(maxit):
        err = estimate_error(em, lam, v)
        lg.iteration(k, errs=err, lams=lam)
        if float(err) < tol:
            return lam, v
        M = _dense(compute_Mder(nep, lam))
        Md = _dense(compute_Mder(nep, lam, 1))
        J = jnp.block([[M, (Md @ v)[:, None]], [jnp.conj(c)[None, :], jnp.zeros((1, 1), dtype=M.dtype)]])
        F = jnp.concatenate([M @ v, jnp.vdot(c, v)[None] - 1])
        delta = -jnp.linalg.solve(J, F)
        dv = delta[:n].astype(dtype)
        dlam = delta[n].astype(dtype)
        dlam, dv, j, scaling = armijo_rule(nep, em, err, lam, v, dlam, dv,
                                           armijo_factor, armijo_max)
        v = v + dv
        lam = lam + dlam
    raise NoConvergenceException(lam, v, err, f"Number of iterations exceeded. maxit={maxit}.")


def augnewton(nep, dtype=None, errmeasure=None, tol=None, maxit=30, lam=0.0, v=None,
              c=None, logger=0, linsolvercreator=None, armijo_factor=1.0, armijo_max=5):
    """Newton iteration using only length-n operations: one lin_solve per
    iteration (reference ``method_newton.jl:273-348``)."""
    dtype, em, lg = setup_solver(nep, dtype, errmeasure, logger)
    tol = default_tol(dtype) if tol is None else tol
    n = nep.n
    v = init_vec(v, n, dtype)
    use_v_norm = c is not None and float(jnp.linalg.norm(jnp.asarray(c))) == 0.0
    c = v if c is None else jnp.asarray(c, dtype=dtype)
    if use_v_norm:
        c = v / jnp.linalg.norm(v) ** 2
    lam = jnp.asarray(lam, dtype=dtype)
    v = v / jnp.vdot(c, v)
    err = np.inf
    for k in range(maxit):
        err = estimate_error(em, lam, v)
        lg.iteration(k, errs=err, lams=lam)
        if float(err) < tol:
            return lam, v
        z = compute_Mlincomb(nep, lam, v[:, None], jnp.ones((1,)), startder=1)
        linsolver = create_linsolver(linsolvercreator, nep, lam)
        tempvec = lin_solve(linsolver, z, tol=tol).astype(dtype)
        if use_v_norm:
            c = v / jnp.linalg.norm(v) ** 2
        alpha = 1.0 / jnp.vdot(c, tempvec)
        dlam = -alpha.astype(dtype)
        dv = alpha * tempvec - v
        dlam, dv, j, _ = armijo_rule(nep, em, err, lam, v, dlam, dv,
                                     armijo_factor, armijo_max)
        lam = lam + dlam
        v = v + dv
    raise NoConvergenceException(lam, v, err, f"Number of iterations exceeded. maxit={maxit}.")


def resinv(nep, dtype=None, errmeasure=None, tol=None, maxit=100, lam=0.0, v=None,
           c=None, logger=0, inner_solver=None, linsolvercreator=None,
           armijo_factor=1.0, armijo_max=5):
    """Residual inverse iteration (Neumaier 1985): ONE factorization at the
    fixed shift reused every iteration + Rayleigh-functional eigenvalue
    updates (reference ``method_newton.jl:141-226``)."""
    dtype, em, lg = setup_solver(nep, dtype, errmeasure, logger)
    tol = default_tol(dtype) if tol is None else tol
    n = nep.n
    v = init_vec(v, n, dtype)
    use_v_as_rf = c is not None and float(jnp.linalg.norm(jnp.asarray(c))) == 0.0
    c = v if c is None else jnp.asarray(c, dtype=dtype)
    lam = complex(np.asarray(lam).item())
    lg.info("Precomputing linsolver")
    linsolver = create_linsolver(linsolvercreator, nep, scalar_as(lam, dtype))
    err = np.inf
    for k in range(maxit):
        v = v / jnp.linalg.norm(v)
        err = estimate_error(em, lam, v)
        if use_v_as_rf:
            c = v
        lg.iteration(k, errs=err, lams=lam)
        if float(err) < tol:
            return scalar_as(lam, dtype), v
        lam_vec = compute_rf(dtype, nep, v, inner_solver, y=c, lam=lam, target=lam)
        lam1 = np.asarray(scalar_as(closest_to(lam_vec, lam), dtype))[()]
        dlam = lam1 - lam
        dv = vec_as(-lin_solve(linsolver, compute_Mlincomb(nep, lam1, v[:, None], jnp.ones((1,)))), dtype)
        dlam, dv, j, _ = armijo_rule(nep, em, err, lam, v, dlam, dv,
                                     armijo_factor, armijo_max)
        lam = lam + dlam
        v = v + dv
    raise NoConvergenceException(lam, v, err, f"Number of iterations exceeded. maxit={maxit}.")


def quasinewton(nep, dtype=None, errmeasure=None, tol=None, maxit=100, lam=0.0,
                v=None, ws=None, logger=0, linsolvercreator=None,
                armijo_factor=1.0, armijo_max=5):
    """Quasi-Newton-2 (Jarlebring/Koskela/Mele 2018): fixed M(lam0)
    factorization (reference ``method_newton.jl:373-445``)."""
    dtype, em, lg = setup_solver(nep, dtype, errmeasure, logger)
    tol = default_tol(dtype) if tol is None else tol
    n = nep.n
    v = init_vec(v, n, dtype)
    ws = v if ws is None else jnp.asarray(ws, dtype=dtype)
    lam = jnp.asarray(lam, dtype=dtype)
    lg.info("Precomputing linsolver")
    linsolver = create_linsolver(linsolvercreator, nep, lam)
    one = jnp.ones((1,))
    err = np.inf
    for k in range(maxit):
        err = estimate_error(em, lam, v)
        lg.iteration(k, errs=err, lams=lam)
        if float(err) < tol:
            return lam, v
        u = compute_Mlincomb(nep, lam, v[:, None], one)
        w = compute_Mlincomb(nep, lam, v[:, None], one, startder=1)
        dlam = (-jnp.vdot(ws, u) / jnp.vdot(ws, w)).astype(dtype)
        z = dlam * w + u
        dv = -lin_solve(linsolver, z, tol=tol).astype(dtype)
        dlam, dv, j, _ = armijo_rule(nep, em, err, lam, v, dlam, dv,
                                     armijo_factor, armijo_max)
        lam = lam + dlam
        v = v + dv
    raise NoConvergenceException(lam, v, err, f"Number of iterations exceeded. maxit={maxit}.")


def newtonqr(nep, dtype=None, errmeasure=None, tol=None, maxit=100, lam=0.0,
             v=None, c=None, logger=0):
    """Kublanovskaya Newton-QR on a column-pivoted QR of M(lam)
    (reference ``method_newton.jl:469-524``).  Returns (lam, v, w) with w the
    left eigenvector approximation."""
    dtype, em, lg = setup_solver(nep, dtype, errmeasure, logger)
    tol = default_tol(dtype) if tol is None else tol
    n = nep.n
    v = init_vec(v, n, dtype)
    lam = jnp.asarray(lam, dtype=dtype)
    err = np.inf
    w = None
    for k in range(maxit):
        A = np.asarray(_dense(compute_Mder(nep, lam)), dtype=complex)
        import scipy.linalg as sla

        Q, R, piv = sla.qr(A, pivoting=True)
        p = np.linalg.solve(R[: n - 1, : n - 1], R[: n - 1, n - 1])
        vfull = np.zeros(n, dtype=complex)
        vfull[piv] = np.concatenate([-p, [1.0]])
        v = jnp.asarray(vfull, dtype=dtype)
        w = jnp.asarray(Q[:, n - 1], dtype=dtype)
        err = estimate_error(em, lam, v)
        lg.iteration(k, errs=err, lams=lam)
        if float(err) < tol:
            return lam, v, w
        d = jnp.vdot(
            jnp.asarray(Q[:, n - 1]),
            compute_Mlincomb(nep, lam, v[:, None], jnp.ones((1,)), startder=1),
        )
        lam = lam - jnp.asarray(R[n - 1, n - 1] / complex(d), dtype=dtype)
    raise NoConvergenceException(lam, v, err, f"Number of iterations exceeded. maxit={maxit}.")


def implicitdet(nep, dtype=None, errmeasure=None, tol=None, maxit=100, lam=0.0,
                v=None, c=None, logger=0):
    """Implicit determinant method (Spence & Poulton 2005): Newton on
    det(M(lam))/det(G(lam)) via a bordered LU each iteration
    (reference ``method_newton.jl:549-594``)."""
    dtype, em, lg = setup_solver(nep, dtype, errmeasure, logger)
    tol = default_tol(dtype) if tol is None else tol
    n = nep.n
    v0 = init_vec(v, n, dtype)
    c = v0 if c is None else jnp.asarray(c, dtype=dtype)
    b = c
    lam = jnp.asarray(lam, dtype=dtype)
    v = jnp.concatenate([v0, jnp.ones((1,), dtype=dtype)])
    err = np.inf
    rhs1 = jnp.concatenate([jnp.zeros((n,), dtype=dtype), jnp.ones((1,), dtype=dtype)])
    for k in range(maxit):
        A = _dense(compute_Mder(nep, lam)).astype(dtype)
        G = jnp.block([
            [A, b[:, None]],
            [jnp.conj(c)[None, :], jnp.zeros((1, 1), dtype=dtype)],
        ])
        import jax.scipy.linalg as jsl

        lu_piv = jsl.lu_factor(G)
        v = jsl.lu_solve(lu_piv, rhs1)
        Mdv = compute_Mder(nep, lam, 1)
        Mdv = (_dense(Mdv) @ v[:n]).astype(dtype)
        vp = jsl.lu_solve(lu_piv, jnp.concatenate([-Mdv, jnp.zeros((1,), dtype=dtype)]))
        err = jnp.abs(v[n]) / jnp.linalg.norm(A)
        lg.iteration(k, errs=err, lams=lam)
        if float(err) < tol:
            return lam, v[:n]
        lam = lam - v[n] / vp[n]
    raise NoConvergenceException(lam, v[:n], err, f"Number of iterations exceeded. maxit={maxit}.")
