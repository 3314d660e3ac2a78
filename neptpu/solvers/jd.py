"""Jacobi-Davidson solvers (reference ``src/method_jd.jl``):
``jd_betcke`` (Petrov-Galerkin / Galerkin projection + rank-1 projected-NEP
expansion per iteration) and ``jd_effenberger`` (JD + Effenberger deflation:
converge -> deflate_eigpair -> restart the inner JD on the deflated NEP with
the Schur-complement DeflatedNEPLinSolver)."""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..core.errmeasure import estimate_error
from ..core.nep import compute_Mlincomb
from ..models.deflation import deflate_eigpair, get_deflated_eigpairs, _DeflatedBase
from ..models.projection import create_proj_NEP
from ..ops.linsolve import DeflatedNEPLinSolverCreator, create_linsolver, lin_solve
from ..ops.orth import DGKS, orthogonalize_and_normalize
from .common import NoConvergenceException, default_tol, init_vec, setup_solver
from .inner import SGIterInnerSolver, inner_solve

__all__ = ["jd_betcke", "jd_effenberger"]


def jd_eig_sorter(lamv, V, N, target):
    lamv = np.atleast_1d(np.asarray(lamv))
    V = np.asarray(V)
    NN = min(N, len(lamv))
    c = np.argsort(np.abs(lamv - complex(target)))
    return complex(lamv[c[NN - 1]]), V[:, c[NN - 1]]


def jd_betcke(nep, dtype=None, maxit=100, neigs=1, projtype=":PetrovGalerkin",
              inner_solver_method=None, orthmethod=None, errmeasure=None,
              linsolvercreator=None, tol=None, lam=0.0, v=None, target=0.0,
              logger=0, inner_logger=0):
    dtype, em, lg = setup_solver(nep, dtype, errmeasure, logger)
    tol = default_tol(dtype) if tol is None else tol
    if orthmethod is None:
        orthmethod = DGKS()
    n = nep.n
    if maxit > n:
        raise ValueError(f"maxit = {maxit} is larger than size of NEP = {n}.")
    if projtype not in (":Galerkin", ":PetrovGalerkin"):
        raise ValueError("Only accepted values of 'projtype' are :Galerkin and :PetrovGalerkin.")
    if projtype != ":Galerkin" and isinstance(inner_solver_method, SGIterInnerSolver):
        raise ValueError("Need to use 'projtype' :Galerkin in order to use SGITER as inner solver.")
    lam = complex(lam)
    target = complex(target)
    lam_vec = np.zeros(neigs, dtype=complex)
    u_vec = np.zeros((n, neigs), dtype=complex)
    u = np.asarray(init_vec(v, n, dtype))
    u = u / np.linalg.norm(u)
    conveig = 0
    err = float(estimate_error(em, lam, jnp.asarray(u)))
    if err < tol:
        conveig += 1
        lam_vec[conveig - 1] = lam
        u_vec[:, conveig - 1] = u
    if conveig == neigs:
        return jnp.asarray(lam_vec), jnp.asarray(u_vec)

    proj_nep = create_proj_NEP(nep, maxit)
    V_mem = np.zeros((n, maxit + 1), dtype=complex)
    V_mem[:, 0] = u
    petrov = projtype == ":PetrovGalerkin"
    if petrov:
        W_mem = np.zeros((n, maxit + 1), dtype=complex)
        w0 = np.asarray(compute_Mlincomb(nep, lam, jnp.asarray(u)))
        W_mem[:, 0] = w0 / np.linalg.norm(w0)
    else:
        W_mem = V_mem

    for k in range(1, maxit + 1):
        V = V_mem[:, :k]
        W = W_mem[:, :k]
        proj_nep.set_projectmatrices(W, V) if k == 1 else proj_nep.expand_projectmatrices(W, V)
        lamv, sv = inner_solve(inner_solver_method, dtype, proj_nep,
                               j=conveig + 1, lamv=lam * np.ones(conveig + 1),
                               sigma=target, neigs=conveig + 1,
                               inner_logger=inner_logger)
        lam, s = jd_eig_sorter(lamv, sv, conveig + 1, target)
        s = np.asarray(s) / np.linalg.norm(s)
        u = V @ s
        err = float(estimate_error(em, lam, jnp.asarray(u)))
        lg.iteration(k, errs=err, lams=lam)
        if err < tol and (
            conveig == 0
            or np.all(np.abs(lam - lam_vec[:conveig]) / np.abs(lam_vec[:conveig])
                      > np.finfo(float).eps ** 0.25)
        ):
            conveig += 1
            lam_vec[conveig - 1] = lam
            u_vec[:, conveig - 1] = u
        if conveig == neigs:
            return jnp.asarray(lam_vec), jnp.asarray(u_vec)

        pk = compute_Mlincomb(nep, lam, jnp.asarray(u)[:, None], jnp.ones((1,)), startder=1)
        linsolver = create_linsolver(linsolvercreator, nep, lam)
        vnew = np.asarray(lin_solve(linsolver, pk, tol=tol))
        vout, _, _ = orthogonalize_and_normalize(jnp.asarray(V), jnp.asarray(vnew), orthmethod)
        V_mem[:, k] = np.asarray(vout)
        if petrov:
            wnew = np.asarray(compute_Mlincomb(nep, lam, jnp.asarray(u)))
            wout, _, _ = orthogonalize_and_normalize(jnp.asarray(W), jnp.asarray(wnew), orthmethod)
            W_mem[:, k] = np.asarray(wout)

    msg = f"Number of iterations exceeded. maxit={maxit} and only {conveig} eigenvalues converged out of {neigs}."
    raise NoConvergenceException(
        np.concatenate([lam_vec[:conveig], [lam]]),
        np.column_stack([u_vec[:, :conveig], u]), err, msg)


def jd_effenberger(nep, dtype=None, maxit=100, neigs=1, inner_solver_method=None,
                   orthmethod=None, linsolvercreator=None, tol=None, lam=None,
                   v=None, target=0.0, deflation_mode=":Auto", logger=0,
                   inner_logger=0):
    dtype, em, lg = setup_solver(nep, dtype, None, logger)
    tol = default_tol(dtype) if tol is None else tol
    if orthmethod is None:
        orthmethod = DGKS()
    n = nep.n
    if maxit > n:
        raise ValueError(f"maxit = {maxit} is larger than size of NEP = {n}.")
    if isinstance(inner_solver_method, SGIterInnerSolver):
        raise ValueError("Inner solver 'SGIterInnerSolver' not accepted since deflated problem not min-max.")
    rng = np.random.default_rng(1)
    lam = complex(rng.random()) if lam is None else complex(lam)
    u = np.asarray(init_vec(v, n, dtype, seed=2))
    u = u / np.linalg.norm(u)
    target = complex(target)
    conveig = 0
    tot_its = 0
    lam_init, u_init = lam, u

    err = float(jnp.linalg.norm(compute_Mlincomb(nep, lam, jnp.asarray(u))))
    if err >= tol:
        lam, u, tot_its, u_init, lam_init = _jd_eff_inner(
            nep, None, maxit, tot_its, conveig, inner_solver_method, orthmethod,
            linsolvercreator, tol, target, lg, neigs, u, lam, inner_logger, dtype)
    conveig += 1
    dnep = deflate_eigpair(nep, lam, u, mode=deflation_mode)

    while True:
        if conveig == neigs:
            lam_vec, u_vec = get_deflated_eigpairs(dnep)
            return lam_vec, u_vec
        dls = DeflatedNEPLinSolverCreator(linsolvercreator)
        lam, u, tot_its, u_init, lam_init = _jd_eff_inner(
            dnep, dnep, maxit, tot_its, conveig, inner_solver_method, orthmethod,
            dls, tol, target, lg, neigs, u_init, lam_init, inner_logger, dtype)
        conveig += 1
        dnep = deflate_eigpair(dnep, lam, u)


def _jd_eff_inner(target_nep, dnep, maxit, nrof_its, conveig, inner_solver_method,
                  orthmethod, linsolvercreator, tol, target, lg, neigs, u, lam,
                  inner_logger, dtype):
    """One deflation level of JD (reference ``jd_effenberger_inner!``)."""
    if dnep is None:
        orgnep = target_nep
        m = 0
    else:
        orgnep = dnep.orgnep
        m = dnep.p
    n = orgnep.n
    nm = n + m
    u = np.asarray(u, dtype=complex)[:nm]
    if len(u) < nm:
        u = np.concatenate([u, np.zeros(nm - len(u), dtype=complex)])
    u = u / np.linalg.norm(u)
    lam = complex(np.asarray(lam).ravel()[0]) if np.ndim(lam) else complex(lam)
    rng = np.random.default_rng(7)
    newton_step = rng.random(nm).astype(complex)
    cap = maxit + 1 - nrof_its
    proj_nep = create_proj_NEP(target_nep, cap)
    V_mem = np.zeros((nm, cap), dtype=complex)
    W_mem = np.zeros((nm, cap), dtype=complex)
    V_mem[:, 0] = u
    w0 = np.asarray(compute_Mlincomb(target_nep, lam, jnp.asarray(u)))
    W_mem[:, 0] = w0 / np.linalg.norm(w0)
    err = np.inf
    for loop_counter in range(nrof_its + 1, maxit + 1):
        k = loop_counter - nrof_its
        V = V_mem[:, :k]
        W = W_mem[:, :k]
        proj_nep.set_projectmatrices(W, V)
        lamv, sv = inner_solve(inner_solver_method, dtype, proj_nep,
                               tol=tol / 10, lamv=lam * np.ones(2),
                               sigma=target, neigs=2, inner_logger=inner_logger)
        lam_temp, s = jd_eig_sorter(lamv, sv, 1, target)
        s = np.asarray(s) / np.linalg.norm(s)
        projres = float(jnp.linalg.norm(compute_Mlincomb(proj_nep, lam_temp, jnp.asarray(s[:k]))))
        if not np.isnan(lam_temp) and not np.any(np.isnan(s[:k])) and projres < tol * 50:
            u = V @ s
            lam = lam_temp
        else:
            u = u + newton_step
            u = u / np.linalg.norm(u)
        rk = np.asarray(compute_Mlincomb(target_nep, lam, jnp.asarray(u)))
        err = float(np.linalg.norm(rk))
        lg.iteration(loop_counter, errs=err, lams=lam)
        if err < tol:
            lg.info("One eigenvalue converged." + (" Deflating and restarting." if conveig + 1 < neigs else ""))
            lam2, s2 = jd_eig_sorter(lamv, sv, 2, target)
            if np.asarray(sv).shape[1] > 1 and abs(lam - lam2) / abs(lam) > np.sqrt(np.finfo(float).eps):
                s2 = np.asarray(s2) / np.linalg.norm(s2)
                u2 = np.concatenate([V @ s2, [0.0]])
            else:
                lam2 = complex(rng.random())
                u2 = rng.random(nm + 1).astype(complex)
            return lam, u, loop_counter, u2, lam2
        pk = compute_Mlincomb(target_nep, lam, jnp.asarray(u)[:, None], jnp.ones((1,)), startder=1)
        linsolver = create_linsolver(linsolvercreator, target_nep, lam)
        vnew = np.asarray(lin_solve(linsolver, pk, tol=tol))
        newton_step = vnew.copy()
        vout, _, _ = orthogonalize_and_normalize(jnp.asarray(V), jnp.asarray(vnew), orthmethod)
        V_mem[:, k] = np.asarray(vout)
        wout, _, _ = orthogonalize_and_normalize(jnp.asarray(W), jnp.asarray(rk), orthmethod)
        W_mem[:, k] = np.asarray(wout)

    msg = f"Number of iterations exceeded. maxit={maxit} and only {conveig} eigenvalues converged out of {neigs}."
    if dnep is not None:
        D, X = np.linalg.eig(dnep.S0)
        u_vec = dnep.V0 @ X
        raise NoConvergenceException(np.concatenate([D, [lam]]),
                                     np.column_stack([u_vec, u[:n]]), err, msg)
    raise NoConvergenceException(lam, u, err, msg)
