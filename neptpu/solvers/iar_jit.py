"""Fully-compiled infinite Arnoldi: the IAR iteration as ONE ``lax.scan``.

This is the TPU-native answer to SURVEY.md §7 hard part 4 (growing Krylov
bases under jit): the basis lives in padded fixed-``maxit`` buffers with
block masks, every step is static-shape (full-width GEMMs with zeros beyond
the live prefix — the classic padded-Krylov tradeoff: ~2x flops for zero host
round-trips and full XLA fusion), and the whole m-step run compiles to a
single XLA program.  Ritz extraction happens once at the end on the host.

``iar_jitted`` matches ``iar``'s results; ``iar_scan_kernel`` is the raw
jitted (basis, Hessenberg) builder that also serves as the driver's
compile-check entry.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.errmeasure import estimate_error
from ..core.nep import compute_Mlincomb
from ..ops import lapack
from .common import init_vec, setup_solver

__all__ = ["iar_scan_kernel", "iar_jitted"]


@partial(jax.jit, static_argnames=("nep", "m"))
def iar_scan_kernel(nep, m, sigma, gamma, v0, lu_piv):
    """Run m IAR steps; returns (Vblocks, H).

    Vblocks: (m+1 cols, m+1 blocks, n) padded basis — column k holds k+1
    live n-blocks; H: (m+1, m) Hessenberg.
    """
    n = v0.shape[0]
    cdt = jnp.result_type(v0.dtype, jnp.asarray(sigma).dtype, jnp.complex64)
    alpha_full = gamma ** jnp.arange(m + 1, dtype=cdt)
    jblk = jnp.arange(m + 1)

    V0 = jnp.zeros((m + 1, m + 1, n), dtype=cdt)
    V0 = V0.at[0, 0].set(v0.astype(cdt) / jnp.linalg.norm(v0))

    def step(carry, k):
        V, H = carry
        # y blocks: y[j+1] = V[k-1 col][j] / (j+1) for j < k (mask via jblk)
        prev = V[k - 1]  # (m+1 blocks, n)
        scale = jnp.where(jblk < k, 1.0 / (jblk + 1.0), 0.0).astype(cdt)
        y_tail = jnp.roll(prev * scale[:, None], 1, axis=0)  # blocks 1..k live
        # masked Mlincomb coefficients: alpha[j] for 1 <= j <= k, else 0
        a = jnp.where((jblk >= 1) & (jblk <= k), alpha_full, 0.0)
        z = compute_Mlincomb(nep, sigma, y_tail.T, a)  # (n,)
        y0 = -jax.scipy.linalg.lu_solve(lu_piv, z.astype(cdt))
        y = y_tail.at[0].set(y0)

        # DGKS (two-pass CGS) against the stacked basis; dead columns are 0
        w = y.reshape(-1)  # (n(m+1),)
        Vmat = V.reshape(m + 1, -1)  # columns as rows: (m+1, n(m+1))
        h1 = jnp.conj(Vmat) @ w
        w = w - Vmat.T @ h1
        h2 = jnp.conj(Vmat) @ w
        w = w - Vmat.T @ h2
        h = h1 + h2
        beta = jnp.linalg.norm(w)
        w = w / beta
        V = V.at[k].set(w.reshape(m + 1, n))
        H = H.at[:, k - 1].set(jnp.where(jblk == k, beta, h))
        return (V, H), beta

    H0 = jnp.zeros((m + 1, m), dtype=cdt)
    (V, H), betas = jax.lax.scan(step, (V0, H0), jnp.arange(1, m + 1))
    return V, H


def iar_jitted(nep, dtype=None, maxit=30, linsolvercreator=None, tol=None,
               neigs=6, errmeasure=None, sigma=0.0, gamma=1.0, v=None, logger=0):
    """IAR with the compiled scan kernel + host-side Ritz extraction.
    Same contract as ``iar`` (without projected extraction)."""
    from ..ops.linsolve import create_linsolver

    dtype, em, lg = setup_solver(nep, dtype, errmeasure, logger)
    if tol is None:
        tol = 10000 * float(jnp.finfo(jnp.result_type(dtype, jnp.float32)).eps)
    n = nep.n
    m = maxit
    sigma_c = complex(sigma)
    # one cached factorization of M(sigma) drives all steps
    solver = create_linsolver(linsolvercreator, nep, jnp.asarray(sigma_c))
    lu_piv = solver.lu  # FactorizeLinSolver exposes the (lu, piv) pair
    v0 = jnp.asarray(np.asarray(init_vec(v, n, dtype)), dtype=jnp.complex128)

    V, H = iar_scan_kernel(nep, m, jnp.asarray(sigma_c), jnp.asarray(complex(gamma)),
                           v0, lu_piv)
    H = np.asarray(H)
    D, Z = (np.asarray(x) for x in lapack.eig(jnp.asarray(H[:m, :m])))
    lams = sigma_c + complex(gamma) / D
    Q = np.asarray(V[:, 0, :]).T[:, :m] @ Z  # first blocks of each column
    errs = np.array([float(estimate_error(em, lams[s], jnp.asarray(Q[:, s])))
                     for s in range(len(lams))])
    idx = np.argsort(errs)
    nconv = int(np.sum(errs < tol))
    take = idx[: min(neigs, max(nconv, 0))]
    return jnp.asarray(lams[take]), jnp.asarray(Q[:, take]), jnp.asarray(V)
