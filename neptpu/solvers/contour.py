"""Contour-integral solvers (reference ``src/method_beyncontour.jl``,
``src/method_block_SS.jl``, ``src/method_contour_common.jl``).

TPU-first design: the quadrature loop of the reference (one factorization per
node, ``tutorial_contour.md`` parallelizes it with @distributed) becomes a
**batched shifted solve**: assemble the stacked tensor M(sigma + g(t_i)) for a
chunk of nodes with one traced Mder, LU-factor the whole chunk with a vmapped
LU (MXU-friendly), solve the block RHS, and reduce the quadrature moments as
einsums.  ``neptpu/parallel/quadrature.py`` shards the node axis over the
device mesh with shard_map + psum of the moments.

The pluggable ``MatrixIntegrator`` protocol is preserved for API parity
(``integrate_interval(integrator, dtype, f, gv, a, b, N, logger)``).
"""
from __future__ import annotations

import warnings
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.errmeasure import estimate_error
from ..core.nep import compute_Mder
from ..models.spmf import AbstractSPMF
from ..ops import lapack
from ..ops.linsolve import BackslashLinSolverCreator, create_linsolver, lin_solve
from .common import setup_solver

__all__ = [
    "MatrixIntegrator",
    "MatrixTrapezoidal",
    "MatrixGaussLegendre",
    "integrate_interval",
    "batched_shifted_solves",
    "contour_beyn",
    "contour_block_SS",
]


class MatrixIntegrator:
    pass


class MatrixTrapezoidal(MatrixIntegrator):
    """Trapezoidal rule, generic-callback form (reference
    ``method_contour_common.jl:61-94``)."""


class MatrixGaussLegendre(MatrixIntegrator):
    """Gauss-Legendre quadrature on [a, b] (extension point demonstrated in
    the reference's contour tutorial)."""


def integrate_interval(integrator, dtype, f, gv, a, b, N, logger=None):
    """tensor I[..., j] ~ int_a^b f(x) g_j(x) dx with N nodes."""
    if integrator is None or integrator is MatrixTrapezoidal or isinstance(integrator, MatrixTrapezoidal):
        h = (b - a) / N
        t = a + h * np.arange(N)
        w = np.full(N, h)
    elif integrator is MatrixGaussLegendre or isinstance(integrator, MatrixGaussLegendre):
        x, wq = np.polynomial.legendre.leggauss(N)
        t = (b - a) / 2 * x + (a + b) / 2
        w = (b - a) / 2 * wq
    else:
        raise ValueError(f"unknown integrator {integrator}")
    m = len(gv)
    G = np.zeros((N, m), dtype=complex)
    for j, g in enumerate(gv):
        G[:, j] = np.array([complex(g(ti)) for ti in t])
    S = None
    for i in range(N):
        temp = np.asarray(f(t[i]))
        if S is None:
            S = np.zeros(temp.shape + (m,), dtype=complex)
        for j in range(m):
            S[..., j] += temp * (G[i, j] * w[i])
    return S


# ---------------------------------------------------------------------------
# Batched shifted solves: the TPU kernel behind all contour methods.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("nep", "chunk"))
def _batched_solves_jit(nep, shifts, Vh, chunk):
    def solve_one(lam):
        M = nep.Mder_dense(lam)
        lu_piv = jax.scipy.linalg.lu_factor(M.astype(Vh.dtype))
        return jax.scipy.linalg.lu_solve(lu_piv, Vh)

    return jax.lax.map(solve_one, shifts, batch_size=chunk)


def batched_shifted_solves(nep, shifts, Vh, chunk: int = 32):
    """Y[i] = M(shifts[i])^{-1} Vh for a whole batch of shifts.

    Assembly is one traced Mder per chunk (vmapped by lax.map's batching);
    factorizations batch over the shift axis — the "batched LU per node"
    primitive from BASELINE.json.  Requires a NEP with traceable Mder
    (all SPMF-form types).
    """
    shifts = jnp.asarray(shifts)
    Vh = jnp.asarray(Vh)
    cdt = jnp.result_type(shifts.dtype, Vh.dtype, jnp.complex64)
    return _batched_solves_jit(nep, shifts.astype(cdt), Vh.astype(cdt), chunk)


def _contour_moments(nep, sigma, radius, Vh, N, n_moments, linsolvercreator,
                     integrator, logger, chunk=32):
    """Moments A_j = 1/(2 pi i) int T(g(t)) g'(t) g(t)^j dt, j=0..n_moments-1."""
    r1, r2 = radius
    h = 2 * np.pi / N
    t = h * np.arange(N)
    gs = r1 * np.cos(t) + 1j * r2 * np.sin(t)
    gps = -r1 * np.sin(t) + 1j * r2 * np.cos(t)

    use_batched = integrator is None and isinstance(nep, AbstractSPMF)
    if use_batched:
        try:
            Y = batched_shifted_solves(nep, jnp.asarray(sigma + gs), Vh, chunk)
        except Exception:
            use_batched = False
    if not use_batched:
        def Tv(lam):
            solver = create_linsolver(linsolvercreator, nep, lam + sigma)
            return lin_solve(solver, Vh)

        f = lambda tt: np.asarray(Tv(complex(r1 * np.cos(tt) + 1j * r2 * np.sin(tt)))) * complex(
            -r1 * np.sin(tt) + 1j * r2 * np.cos(tt)
        )
        gv = [(lambda s, j=j: (complex(r1 * np.cos(s) + 1j * r2 * np.sin(s))) ** j)
              for j in range(n_moments)]
        S = integrate_interval(integrator, complex, f, gv, 0, 2 * np.pi, N, logger)
        return [jnp.asarray(S[..., j] / (2j * np.pi)) for j in range(n_moments)]

    # quadrature reduction: A_j = h/(2 pi i) sum_i Y_i gp_i g_i^j
    gj = jnp.stack([jnp.asarray(gs) ** j for j in range(n_moments)])  # (m, N)
    wts = gj * jnp.asarray(gps)[None, :] * (h / (2j * np.pi))
    A = jnp.einsum("mN,Nnk->mnk", wts, Y)
    return [A[j] for j in range(n_moments)]


def contour_beyn(nep, dtype=None, integrator=None, tol=None, sigma=0.0, logger=0,
                 linsolvercreator=None, neigs=2, k=None, radius=1.0, N=1000,
                 errmeasure=None, sanity_check=True, rank_drop_tol=None,
                 chunk=32, mesh=None, mesh_axis="nodes"):
    """Beyn's contour integral method (reference
    ``method_beyncontour.jl:47-185``).

    ``mesh``: optional ``jax.sharding.Mesh`` — quadrature nodes are then
    sharded over its ``mesh_axis`` (each device runs the batched
    assemble+LU+solve pipeline on its local nodes; moments reduced with one
    psum), the first-class version of the reference's user-pluggable
    ``@distributed`` trapezoid (``tutorial_contour.md:199-231``).
    """
    dtype, em, lg = setup_solver(nep, dtype, errmeasure, logger)
    if tol is None:
        tol = float(np.sqrt(np.finfo(np.float64).eps))
    if rank_drop_tol is None:
        rank_drop_tol = tol
    if k is None:
        if neigs == np.inf:
            raise ValueError("k must be set when neigs=inf")
        k = int(neigs) + 1
    n = nep.n
    if k > n:
        raise ValueError(f"cannot compute more eigenvalues than size of NEP: k={k} n={n}")
    if k <= 0:
        raise ValueError(f"k must be positive, k={k}")
    radius = (radius, radius) if np.isscalar(radius) else tuple(radius)
    sigma = complex(sigma)
    if linsolvercreator is None:
        linsolvercreator = BackslashLinSolverCreator()

    rng = np.random.default_rng(10)  # reproducibility (reference seeds 10)
    Vh = jnp.asarray(rng.standard_normal((n, k)), dtype=jnp.complex128)

    lg.info("Computing integrals")
    if mesh is not None:
        from ..parallel.quadrature import sharded_contour_moments

        A = np.asarray(sharded_contour_moments(nep, sigma, radius, Vh, N, 2,
                                               mesh, axis=mesh_axis))
        A0, A1 = jnp.asarray(A[0]), jnp.asarray(A[1])
    else:
        A0, A1 = _contour_moments(nep, sigma, radius, Vh, N, 2,
                                  linsolvercreator, integrator, lg, chunk)

    lg.info("Computing SVD prepare for eigenvalue extraction")
    V, S, Wh = jnp.linalg.svd(A0, full_matrices=False)
    S = np.asarray(S)
    p = int(np.sum(S / S[0] > rank_drop_tol))
    lg.info(f" p={p}")
    V0 = V[:, :p]
    W0 = Wh.conj().T[:, :p]
    B = (V0.conj().T @ A1 @ W0) * (1.0 / jnp.asarray(S[:p]))[None, :]

    lg.info("Computing eigenvalues")
    lam, VB = lapack.eig(B)
    lam = np.asarray(lam) + sigma
    V = np.asarray(V0 @ VB)
    V = V / np.linalg.norm(V, axis=0, keepdims=True)

    def inside(l):
        return (np.real(l - sigma) / radius[0]) ** 2 + (np.imag(l - sigma) / radius[1]) ** 2 <= 1

    if not sanity_check:
        order = np.argsort(np.abs(sigma - lam))
        lam = lam[order]
        V = V[:, order]
        ins = inside(lam)
        order2 = np.argsort(~ins, kind="stable")
        return jnp.asarray(lam[order2]), jnp.asarray(V[:, order2])

    errs = np.array([float(estimate_error(em, lam[i], jnp.asarray(V[:, i]))) for i in range(p)])
    good = np.flatnonzero(errs < tol)
    good = good[np.argsort(np.abs(sigma - lam[good]))]
    ins = inside(lam[good])
    if np.any(~ins):
        warnings.warn(
            f"found {int(np.sum(~ins))} evals outside contour, {p} inside. "
            "try increasing N, decreasing tol, or changing radius"
        )
    good = good[np.argsort(~ins, kind="stable")]
    if len(good) > neigs:
        lg.info(f"Removing unwanted eigvals: neigs={neigs}<{len(good)}=found_eigvals")
        good = good[: int(neigs)]
    lam_good = lam[good]
    V_good = V[:, good]
    if p == k:
        warnings.warn(
            "Rank-drop not detected, your eigvals may be correct, but the "
            "algorithm cannot verify. Try to increase k."
        )
    if len(lam_good) < neigs and neigs != np.inf:
        warnings.warn("We found fewer eigvals than requested. Try increasing domain, or decreasing tol.")
    return jnp.asarray(lam_good), jnp.asarray(V_good)


def contour_block_SS(nep, dtype=None, integrator=None, tol=None, sigma=0.0,
                     logger=0, linsolvercreator=None, neigs=np.inf, k=3,
                     radius=1.0, N=1000, K=3, errmeasure=None,
                     sanity_check=True, Shat_mode=":native", rank_drop_tol=None,
                     chunk=32):
    """Asakura-Sakurai block-SS with 2K moments and block-Hankel pencil
    (reference ``method_block_SS.jl:45-215``)."""
    dtype, em, lg = setup_solver(nep, dtype, errmeasure, logger)
    if tol is None:
        tol = float(np.sqrt(np.finfo(np.float64).eps))
    if rank_drop_tol is None:
        rank_drop_tol = tol
    n = nep.n
    L = k
    sigma = complex(sigma)
    radius = (radius, radius) if np.isscalar(radius) else tuple(radius)
    if linsolvercreator is None:
        linsolvercreator = BackslashLinSolverCreator()
    rng = np.random.default_rng(10)
    U = rng.random((n, L)) + 0j
    Vblk = jnp.asarray(rng.random((n, L)), dtype=jnp.complex128)

    lg.info("Computing integrals; forming Mhat and Shat")
    if Shat_mode == ":JSIAM":
        if radius[0] != radius[1]:
            raise ValueError("JSIAM Shat_mode does not support ellipses")
        r = radius[0]
        w = np.exp(2j * np.pi * (0.5 + np.arange(N)) / N)
        omega = r * w
        Y = batched_shifted_solves(nep, jnp.asarray(sigma + omega), Vblk, chunk)
        Shat = []
        for kk in range(2 * K):
            d = jnp.asarray((omega / r) ** (kk + 1)) / N
            Shat.append(jnp.einsum("N,Nnk->nk", d, Y))
        factor = r
    else:
        Shat = _contour_moments(nep, sigma, radius, Vblk, N, 2 * K,
                                linsolvercreator, integrator, lg, chunk)
        factor = 1.0
    Mhat = [np.asarray(U.conj().T @ np.asarray(S)) for S in Shat]

    lg.info("Computing Hhat and Hhat^<")
    m = K * L
    Hhat = np.zeros((m, m), dtype=complex)
    Hhat2 = np.zeros((m, m), dtype=complex)
    for i in range(K):
        for j in range(K):
            Hhat[i * L : (i + 1) * L, j * L : (j + 1) * L] = Mhat[i + j]
            Hhat2[i * L : (i + 1) * L, j * L : (j + 1) * L] = Mhat[i + j + 1]

    UU, SS, VVh = np.linalg.svd(Hhat)
    VV = VVh.conj().T
    mprime = int(np.sum(SS / SS[0] > rank_drop_tol))
    lg.info(f" mprime={mprime}")
    UU1 = UU[:, :mprime]
    VV1 = VV[:, :mprime]
    H1 = UU1.conj().T @ Hhat @ VV1
    H2 = UU1.conj().T @ Hhat2 @ VV1
    xi, X = lapack.geig(jnp.asarray(H2), jnp.asarray(H1))
    xi = np.asarray(xi)
    X = np.asarray(X)
    Smat = np.concatenate([np.asarray(S) for S in Shat[:K]], axis=1)
    V = Smat @ VV1 @ X
    lam = sigma + factor * xi
    return jnp.asarray(lam), jnp.asarray(V)
