"""Infinite Arnoldi (Taylor basis) — reference ``src/method_iar.jl:46-184``.

Per-iteration kernel (the shape that matters on TPU):
  1. derivative shift-scale of the basis block (pure vector ops)
  2. ONE structured Mlincomb (the fused multi-term SpMV fast path)
  3. ONE lin_solve against the cached M(sigma) factorization
  4. tall-skinny Gram-Schmidt on the growing n(k+1) basis

Ritz extraction: eig of the small Hessenberg (host callback),
lam = sigma + gamma ./ theta.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.errmeasure import estimate_error
from ..core.nep import compute_Mlincomb
from ..ops import lapack
from ..ops.linsolve import create_linsolver, lin_solve
from ..ops.orth import DGKS, orthogonalize_and_normalize
from .common import NoConvergenceException, init_vec, setup_solver

__all__ = ["iar"]


def iar(nep, dtype=None, orthmethod=None, maxit=30, linsolvercreator=None,
        tol=None, neigs=6, errmeasure=None, sigma=0.0, gamma=1.0, v=None,
        logger=0, check_error_every=1, proj_solve=False,
        inner_solver_method=None, inner_logger=0):
    dtype, em, lg = setup_solver(nep, dtype, errmeasure, logger)
    if tol is None:
        tol = 10000 * float(jnp.finfo(jnp.result_type(dtype, jnp.float32)).eps)
    if orthmethod is None:
        orthmethod = DGKS()
    n = nep.n
    m = maxit
    sigma = complex(sigma)
    gamma = complex(gamma)

    V = np.zeros((n * (m + 1), m + 1), dtype=complex)
    H = np.zeros((m + 1, m), dtype=complex)
    alpha = np.array([gamma**i for i in range(m + 1)], dtype=complex)
    alpha[0] = 0.0

    M0inv = create_linsolver(linsolvercreator, nep, jnp.asarray(sigma, dtype=dtype))

    err_hist = np.full((m, m + 1), np.nan)
    lams = np.zeros(0, dtype=complex)
    Q = np.zeros((n, 0), dtype=complex)

    v0 = np.asarray(init_vec(v, n, dtype))
    V[:n, 0] = v0 / np.linalg.norm(v0)

    pnep = None
    if proj_solve:
        from ..models.projection import create_proj_NEP

        pnep = create_proj_NEP(nep)

    k = 1
    conv_eig = 0
    idx = None
    while k <= m and conv_eig < neigs:
        # FIXED-SHAPE iteration: y, the coefficient vector and the basis are
        # kept at their final padded sizes with zero tails (zero columns and
        # zero coefficients contribute nothing), so every jax call in the
        # loop compiles exactly once instead of once per Krylov step.
        y = np.zeros((n, m + 1), dtype=complex)
        # y[:, 1:k+1] = previous basis vector's blocks, scaled by 1/(1:k)
        y[:, 1 : k + 1] = V[: n * k, k - 1].reshape(k, n).T / np.arange(1, k + 1)
        a_k = np.zeros(m + 1, dtype=complex)
        a_k[: k + 1] = alpha[: k + 1]
        # y[:, 0] = -M(sigma)^{-1} * Mlincomb(y, alpha)
        z = compute_Mlincomb(nep, sigma, jnp.asarray(y), jnp.asarray(a_k))
        y0 = -np.asarray(lin_solve(M0inv, z))
        y[:, 0] = y0
        vv = np.zeros(n * (m + 1), dtype=complex)
        vv[: n * (k + 1)] = y[:, : k + 1].T.reshape(-1)  # stacked blocks
        w, h, beta = orthogonalize_and_normalize(
            jnp.asarray(V), jnp.asarray(vv), orthmethod)
        H[:k, k - 1] = np.asarray(h)[:k]
        H[k, k - 1] = complex(beta)
        V[:, k] = np.asarray(w)

        if (k % check_error_every == 0) or k == m:
            # H is host data in a host loop: numpy LAPACK directly (the
            # traceable ops.lapack.eig callback would recompile per k)
            D, Z = np.linalg.eig(H[:k, :k].astype(np.complex128))
            Q = V[:n, :k] @ Z
            lams = sigma + gamma / D
            if proj_solve:
                from .inner import inner_solve

                QQ, RR = np.linalg.qr(V[:n, :k])
                pnep.set_projectmatrices(QQ, QQ)
                lproj, Qproj = inner_solve(
                    inner_solver_method, dtype, pnep,
                    V=RR @ Z, lamv=lams.copy(), neigs=k,
                    sigma=np.mean(lams), inner_logger=inner_logger, tol=tol,
                )
                Q = QQ @ Qproj
                lams = np.asarray(lproj)
            conv_eig = 0
            errs = np.array(
                [float(estimate_error(em, lams[s], jnp.asarray(Q[:, s]))) for s in range(len(lams))]
            )
            err_hist[k - 1, : len(lams)] = errs
            lg.iteration(k, errs=errs, lams=lams, level=2)
            conv_eig = int(np.sum(errs < tol))
            glyphs = "".join(
                "+" if e < tol else "=" if e < tol * 10 else "-" for e in errs
            )
            lg.info(glyphs)
            idx = np.argsort(errs)
            if k == m or conv_eig >= neigs:
                nrof = int(min(len(lams), neigs))
                lams = lams[idx[:nrof]]
                Q = Q[:, idx[: len(lams)]]
        k += 1
    k -= 1

    if conv_eig < neigs and neigs != np.inf:
        msg = f"Number of iterations exceeded. maxit={maxit}."
        if conv_eig < 3:
            msg += " Try to change the inner_solver_method for better performance."
        raise NoConvergenceException(lams, Q, err_hist, msg)

    nc = int(min(len(lams), conv_eig))
    return jnp.asarray(lams[:nc]), jnp.asarray(Q[:, :nc]), jnp.asarray(V[:, :k])
