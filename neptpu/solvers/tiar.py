"""Tensor infinite Arnoldi — reference ``src/method_tiar.jl:52-257``.

Same math as IAR but the growing basis is factorized as Z (n x k) times a
coefficient tensor a (m+1)^3: memory O(nm + m^3) instead of O(nm^2) — the
layout that matters at gun scale (SURVEY.md §5 "long-context analogue").
The per-iteration hot ops are GEMMs ``Z[:, :k] @ a-slice`` plus the same
Mlincomb/lin_solve kernel as IAR; all tensor bookkeeping is O(m^3) scalar
work kept on host.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.errmeasure import estimate_error
from ..core.exceptions import LostOrthogonalityException
from ..core.nep import compute_Mlincomb
from ..ops import lapack
from ..ops.linsolve import create_linsolver, lin_solve
from ..ops.orth import DGKS, orthogonalize_and_normalize
from .common import NoConvergenceException, init_vec, setup_solver

__all__ = ["tiar"]


def tiar(nep, dtype=None, orthmethod=None, maxit=30, linsolvercreator=None,
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
    if n < m:
        raise LostOrthogonalityException(
            "Loss of orthogonality in the matrix Z. The problem size is too small, use iar instead."
        )
    sigma = complex(sigma)
    gamma = complex(gamma)

    a = np.zeros((m + 1, m + 1, m + 1), dtype=complex)
    Z = np.zeros((n, m + 1), dtype=complex)
    t = np.zeros(m + 1, dtype=complex)
    H = np.zeros((m + 1, m), dtype=complex)
    alpha = np.array([gamma**i for i in range(m + 1)], dtype=complex)
    alpha[0] = 0.0
    M0inv = create_linsolver(linsolvercreator, nep, jnp.asarray(sigma, dtype=dtype))
    err_hist = np.full((m + 1, m + 1), np.nan)
    lams = np.zeros(0, dtype=complex)
    Q = np.zeros((n, 0), dtype=complex)

    v0 = np.asarray(init_vec(v, n, dtype))
    Z[:, 0] = v0 / np.linalg.norm(v0)
    a[0, 0, 0] = 1.0

    k = 1
    conv_eig = 0
    while k <= m and conv_eig < neigs:
        # FIXED-SHAPE iteration (one compile for the whole loop): y and the
        # coefficient vector are padded to their final sizes with zeros, and
        # the candidate is orthogonalized against the full preallocated basis
        # (its not-yet-filled columns are zero and contribute nothing).
        y = np.zeros((n, m + 1), dtype=complex)
        # y[:, 1:k+1] = Z[:, :k] @ a[:k, k-1, :k]^T, columns scaled by 1/(1:k)
        y[:, 1 : k + 1] = (Z[:, :k] @ a[:k, k - 1, :k].T) / np.arange(1, k + 1)
        a_k = np.zeros(m + 1, dtype=complex)
        a_k[: k + 1] = alpha[: k + 1]
        z = compute_Mlincomb(nep, sigma, jnp.asarray(y), jnp.asarray(a_k))
        y[:, 0] = -np.asarray(lin_solve(M0inv, z))

        # Gram-Schmidt of y[:, 0] against Z
        w, tk, beta = orthogonalize_and_normalize(
            jnp.asarray(Z), jnp.asarray(y[:, 0]), orthmethod
        )
        t[:k] = np.asarray(tk)[:k]
        t[k] = complex(beta)
        Z[:, k] = np.asarray(w)

        # tensor-level orthogonalization (reference :126-183)
        g = np.zeros((m + 1, m + 1), dtype=complex)
        for l in range(k + 1):
            g[1 : k + 1, l] = a[:k, k - 1, l] / np.arange(1, k + 1)
            g[0, l] = t[l]
        h = np.zeros(m + 1, dtype=complex)
        for l in range(k):
            h[:k] += a[:k, :k, l].conj().T @ g[:k, l]
        f = g.copy()
        for l in range(k):
            f[: k + 1, l] -= a[: k + 1, :k, l] @ h[:k]
        hh = np.zeros(m + 1, dtype=complex)
        for l in range(k):
            hh[:k] += a[:k, :k, l].conj().T @ f[:k, l]
        ff = f.copy()
        for l in range(k):
            ff[: k + 1, l] -= a[: k + 1, :k, l] @ hh[:k]
        h = h + hh
        f = ff
        beta2 = np.linalg.norm(f[: k + 1, : k + 1])

        H[:k, k - 1] = h[:k]
        H[k, k - 1] = beta2
        a[: k + 1, k, : k + 1] = f[: k + 1, : k + 1] / beta2

        if (k % check_error_every == 0) or k == m:
            # host data in a host loop: numpy LAPACK (the traceable
            # ops.lapack.eig callback would recompile per k)
            D, W = np.linalg.eig(H[:k, :k].astype(np.complex128))
            VV = Z[:, :k] @ a[0, :k, :k].T
            Q = VV @ W
            lams = sigma + gamma / D
            if proj_solve:
                from .inner import inner_solve

                from ..models.projection import create_proj_NEP

                pnep = create_proj_NEP(nep)
                pnep.set_projectmatrices(Z[:, :k], Z[:, :k])
                lproj, Qproj = inner_solve(
                    inner_solver_method, dtype, pnep, lamv=lams.copy(),
                    neigs=len(lams) + 3, sigma=sigma, tol=tol / 10,
                    inner_logger=inner_logger,
                )
                lproj = np.asarray(lproj)
                II = np.argsort(np.abs(lproj - sigma))
                lams = lproj[II]
                Q = Z[:, :k] @ np.asarray(Qproj)[:, II]
            errs = np.array(
                [float(estimate_error(em, lams[s], jnp.asarray(Q[:, s]))) for s in range(len(lams))]
            )
            err_hist[k - 1, : len(lams)] = errs
            lg.iteration(k, errs=errs, lams=lams, level=2)
            conv_eig = int(np.sum(errs < tol))
            lg.info("".join("+" if e < tol else "=" if e < tol * 10 else "-" for e in errs))
            idx = np.argsort(errs)
            if k == m or conv_eig >= neigs:
                nrof = int(min(len(lams), neigs))
                lams = lams[idx[:nrof]]
                Q = Q[:, idx[:nrof]]
        k += 1
    k -= 1

    if conv_eig < neigs and neigs != np.inf:
        msg = f"Number of iterations exceeded. maxit={maxit}."
        if conv_eig < 3:
            msg += " Check that sigma is not an eigenvalue."
        raise NoConvergenceException(lams, Q, err_hist, msg)
    nc = int(min(len(lams), conv_eig))
    return jnp.asarray(lams[:nc]), jnp.asarray(Q[:, :nc]), jnp.asarray(Z[:, :k])
