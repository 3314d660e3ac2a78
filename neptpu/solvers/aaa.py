"""AAAeigs (Lietaert/Perez/Vandereycken/Meerbergen; reference
``src/method_AAAeigs.jl``): set-valued / weighted AAA rational approximation
of the NEP's scalar functions (``svAAA``), a compact CORK pencil from the
barycentric representation, and a CORK rational Krylov iteration with
two-level Q/U basis compression and per-shift factorization caching.

The svAAA maintains an incremental QR of the growing Loewner matrix
(reference ``method_AAAeigs.jl:537-600``): per step one Gram-Schmidt append
plus a Cholesky correction for the zeroed support row, with the weight
vector read off the small triangular factor's SVD — O(sM m) per step; a
full tall-matrix SVD remains as the fallback when orthogonality is lost.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..core.errmeasure import ResidualErrmeasure, estimate_error, make_errmeasure
from ..core.logger import parse_logger
from ..models.pep import PEP
from ..models.spmf import AbstractSPMF, fun_scalar
from ..models.sumnep import SPMFSumNEP
from ..ops.linsolve import FactorizeLinSolverCreator, create_linsolver, lin_solve
from .common import NoConvergenceException

__all__ = ["AAAeigs", "svAAA", "get_prz", "reval"]


def _f_scalar_vals(fv, Z):
    """F[i, j] = f_j(Z_i) (scalar evaluations via 1x1 matrices)."""
    F = np.empty((len(Z), len(fv)), dtype=complex)
    for j, f in enumerate(fv):
        F[:, j] = np.array([complex(fun_scalar(f, z)) for z in Z])
    return F


def reval(lam, z, fz, w):
    """Evaluate the barycentric interpolant(s) at points lam
    (reference ``reval``)."""
    lam = np.asarray(lam, dtype=complex)
    with np.errstate(all="ignore"):
        C = 1.0 / (lam[:, None] - z[None, :])
        r = (C @ (w[:, None] * fz)) / (C @ w)[:, None]
    iinf = np.isinf(lam)
    if np.any(iinf):
        r[iinf, :] = (np.sum(w[:, None] * fz, axis=0) / np.sum(w))[None, :]
    bad = np.argwhere(np.isnan(r))
    for i1, i2 in bad:
        if not np.isnan(lam[i1]) and np.any(lam[i1] == z):
            r[i1, i2] = fz[np.argmax(lam[i1] == z), i2]
    return r


def get_prz(z, fz, w):
    """Poles, residues and zeros of the barycentric interpolant
    (reference ``get_prz``)."""
    import scipy.linalg as sla

    m, s = fz.shape
    B = np.eye(m + 1, dtype=complex)
    B[0, 0] = 0
    E = np.zeros((m + 1, m + 1), dtype=complex)
    E[0, 1:] = w
    E[1:, 0] = 1.0
    E[1:, 1:] = np.diag(z)
    pol = sla.eig(E, B, right=False)
    pol = pol[np.isfinite(pol)]
    dz = 1e-5 * np.array([1j, -1.0, -1j, 1.0])
    pp = (pol[:, None] + dz[None, :]).reshape(-1)
    rvals = reval(pp, z, fz, w)
    rsd = np.empty((len(pol), s), dtype=complex)
    for i in range(s):
        rsd[:, i] = rvals[:, i].reshape(len(pol), 4) @ dz / 4
    zer = np.empty((m + 1, s), dtype=complex)
    for i in range(s):
        E[0, 1:] = w * fz[:, i]
        zer[:, i] = sla.eig(E, B, right=False)
    return pol, rsd, zer


def svAAA(nep, Z, mmax=100, tol=None, cleanup=True, tol_cln=None,
          return_details=False, logger=0, weighted=False, u0_weight=None):
    """Set-valued (or weighted) AAA on the NEP's term functions
    (reference ``svAAA``, ``method_AAAeigs.jl:469-723``)."""
    lg = parse_logger(logger)
    if tol is None:
        tol = np.finfo(float).eps * 1e3
    if tol_cln is None:
        tol_cln = min(np.finfo(float).eps, tol)
    fv = nep.get_fv()
    Z = np.asarray(Z, dtype=complex).ravel()
    Z = Z[np.isfinite(Z)]
    M = len(Z)
    s = len(fv)
    F = _f_scalar_vals(fv, Z)

    if weighted:
        Av = nep.get_Av()
        n = nep.n
        u = (np.ones(n) if u0_weight is None else np.asarray(u0_weight))
        u = u / np.linalg.norm(u)
        uj = np.stack([
            np.asarray(A @ jnp.asarray(u)) if isinstance(A, jnp.ndarray)
            else np.asarray(A.matvec(jnp.asarray(u))) for A in Av
        ], axis=1)
        beta = max(np.linalg.norm(uj @ F[i, :]) for i in range(M))
        scaleF = np.array([
            float(jnp.linalg.norm(A) if isinstance(A, jnp.ndarray) else jnp.linalg.norm(A.data))
            for A in Av
        ])
        F = F * scaleF[None, :]
        scaleF = 1.0 / scaleF
        maxF = np.max(np.abs(F), axis=0, keepdims=True)
    else:
        beta = None
        scaleF = np.max(np.abs(F), axis=0, keepdims=True)
        F = F / scaleF
    err = []
    z = []
    ind = []
    fzl = []
    w = np.zeros(0, dtype=complex)
    R = np.tile(np.mean(F, axis=0, keepdims=True), (M, 1))

    def loewner_cols(zl, fzl_):
        with np.errstate(all="ignore"):
            C = 1.0 / (Z[:, None] - np.asarray(zl)[None, :])
        C[ind, :] = 0.0
        C[np.isinf(C)] = 0.0
        C = np.nan_to_num(C)
        return C

    pol = rsd = zer = np.zeros(0, dtype=complex)
    m_final = 0
    # Incremental QR of the growing Loewner matrix (reference
    # ``method_AAAeigs.jl:537-600``): L = (Q Su) Hu with Q the stored basis,
    # Su an upper-triangular correction absorbing the orthogonality loss from
    # zeroing the new support row each step, Hu the small upper-triangular
    # factor whose m x m SVD yields the weights — O(sM m) per step instead of
    # a fresh O(sM m^2) SVD of the tall matrix.
    Qm = np.zeros((M * s, mmax), dtype=complex)
    Hu = np.zeros((mmax, mmax), dtype=complex)
    Su = np.zeros((mmax, mmax), dtype=complex)
    qr_ok = True
    for m in range(1, mmax + 1):
        res = np.abs(F - R)
        loc_flat = np.argmax(res)
        locz, locf = np.unravel_index(loc_flat, res.shape)
        err.append(float(np.sum(np.max(res, axis=0)) / beta) if weighted else float(res[locz, locf]))
        lg.info(f"svAAA iteration {m-1}: Error = {err[-1]}", level=2)
        if err[-1] <= tol:
            m_final = m - 1
            break
        z.append(Z[locz])
        ind.append(locz)
        fzl.append(F[locz, :].copy())
        m_final = m

        zarr = np.asarray(z)
        fzarr = np.asarray(fzl)
        C = loewner_cols(zarr, fzarr)

        if qr_ok:
            p = m - 1
            rows = locz + M * np.arange(s)
            try:
                if p > 0:
                    # rows of the new support point get zeroed across the
                    # existing columns: restore orthonormality through the
                    # Cholesky correction ee = I - q^H q
                    q = Qm[rows, :p] @ Su[:p, :p]
                    ee = np.eye(p) - q.conj().T @ q
                    Lc = np.linalg.cholesky(ee)  # ee = Lc Lc^H
                    Si = Lc.conj().T
                    Hu[:p, :p] = Si @ Hu[:p, :p]
                    from scipy.linalg import solve_triangular

                    Su[:p, :p] = solve_triangular(
                        Si.conj().T, Su[:p, :p].conj().T, lower=True
                    ).conj().T
                    Qm[rows, :p] = 0.0
                # new Loewner column for support z_m, Gram-Schmidt appended
                v = np.concatenate([
                    C[:, p] * (F[:, j] - fzarr[p, j]) for j in range(s)
                ])
                v = np.nan_to_num(v)
                nv = np.linalg.norm(v)
                if p > 0:
                    h = Su[:p, :p].conj().T @ (Qm[:, :p].conj().T @ v)
                    Hu[:p, p] = h
                    v = v - Qm[:, :p] @ (Su[:p, :p] @ h)
                Hu[p, p] = np.linalg.norm(v)
                ii = 0
                while ii < 3 and p > 0 and Hu[p, p].real < nv / np.sqrt(2):
                    hh = Su[:p, :p].conj().T @ (Qm[:, :p].conj().T @ v)
                    Hu[:p, p] += hh
                    v = v - Qm[:, :p] @ (Su[:p, :p] @ hh)
                    nv = Hu[p, p].real
                    Hu[p, p] = np.linalg.norm(v)
                    ii += 1
                Qm[:, p] = v / Hu[p, p]
                Su[p, :p] = 0.0
                Su[:p, p] = 0.0
                Su[p, p] = 1.0
                _, _, Vh = np.linalg.svd(Hu[:m, :m])
                w = Vh.conj().T[:, -1]
            except np.linalg.LinAlgError:
                qr_ok = False  # orthogonality lost: fall back to full SVD
        if not qr_ok:
            # full Loewner L[(j*M):(j+1)*M, :] = C * (F[:,j] - fz[:,j]^T)
            Lmat = np.vstack([
                C * (F[:, j][:, None] - fzarr[:, j][None, :]) for j in range(s)
            ])
            _, _, Vh = np.linalg.svd(Lmat[np.all(np.isfinite(Lmat), axis=1)], full_matrices=False)
            w = Vh.conj().T[:, -1]

        with np.errstate(all="ignore"):
            N = C @ (w[:, None] * fzarr)
            D = C @ w
            R = N / D[:, None]
        R[ind, :] = F[ind, :]

        # spurious-pole cleanup
        if cleanup and m > 1:
            pol_c, rsd_c, _ = get_prz(zarr, fzarr, w)
            maxRsd = np.max(np.abs(rsd_c / (maxF if weighted else 1.0)), axis=1)
            sp = np.flatnonzero(maxRsd < tol_cln)
            if len(sp) > 0:
                loc_sp = []
                for j in sp:
                    azp = np.abs(np.asarray(z) - pol_c[j])
                    locj = int(np.argmin(azp))
                    loc_sp.append(locj)
                    z.pop(locj)
                    ind.pop(locj)
                    fzl.pop(locj)
                zarr = np.asarray(z)
                fzarr = np.asarray(fzl) if fzl else np.zeros((0, s), dtype=complex)
                C = loewner_cols(zarr, fzarr)
                Lmat = np.vstack([
                    C * (F[:, j][:, None] - fzarr[:, j][None, :]) for j in range(s)
                ])
                _, _, Vh = np.linalg.svd(Lmat[np.all(np.isfinite(Lmat), axis=1)], full_matrices=False)
                w = Vh.conj().T[:, -1]
                with np.errstate(all="ignore"):
                    N = C @ (w[:, None] * fzarr)
                    D = C @ w
                    R = N / D[:, None]
                R[ind, :] = F[ind, :]
                res = np.abs(F - R)
                err.append(float(np.sum(np.max(res, axis=0)) / beta) if weighted else float(np.max(res)))
                lg.info(f"svAAA: {len(sp)} Froissart doublet(s) detected (and removed). Final error = {err[-1]}")
                m_final = len(z)
                break
        if m == mmax:
            res = np.abs(F - R)
            err.append(float(np.sum(np.max(res, axis=0)) / beta) if weighted else float(np.max(res)))
            if err[-1] > tol:
                lg.info(f"svAAA: Rational approximation not converged after {mmax} iterations. Final error = {err[-1]}")

    zarr = np.asarray(z)
    fzarr = (np.asarray(fzl) if fzl else np.zeros((0, s), dtype=complex)) * scaleF
    # drop zero-weight support points
    nz = np.flatnonzero(w != 0) if len(w) else np.zeros(0, dtype=int)
    if len(nz) < len(w):
        zarr = zarr[nz]
        fzarr = fzarr[nz, :]
        w = w[nz]
    if return_details and len(zarr):
        pol, rsd, zer = get_prz(zarr, fzarr, w)
    return zarr, fzarr, w, np.asarray(err), pol, rsd, zer


def _get_compact_pencil(d, s, m, z, fz, w, NNZ):
    """Compact [P_A^T M^T], [P_B^T N^T] (reference ``get_compact_pencil``)."""
    dt = len(NNZ)

    def spdiag_rect(rows, cols, main, sub):
        A = np.zeros((rows, cols), dtype=complex)
        for i, v in enumerate(main):
            if i < rows and i < cols:
                A[i, i] = v
        for i, v in enumerate(sub):
            if i + 1 < rows and i < cols:
                A[i + 1, i] = v
        return A

    if dt == 0:
        A1 = spdiag_rect(m, m - 1, -w[1:] * z[:-1], w[:-1] * z[1:])
        compactA = np.hstack([fz, A1])
        B1 = spdiag_rect(m, m - 1, -w[1:], w[:-1])
        compactB = np.hstack([np.zeros((m, s), dtype=complex), B1])
    elif d == 0:
        compactA = np.zeros((1 + m, 1 + s + m), dtype=complex)
        compactA[0, 0] = 1
        compactA[0, -1] = -1
        compactA[1:, 1 : 1 + s] = fz
        compactA[1:, 1 + s : s + m] = spdiag_rect(m, m - 1, -w[1:] * z[:-1], w[:-1] * z[1:])
        compactA[1:, -1] = 1.0
        compactB = np.zeros((1 + m, 1 + s + m), dtype=complex)
        compactB[1:, 1 + s : s + m] = spdiag_rect(m, m - 1, -w[1:], w[:-1])
    else:
        k = d + m
        ncols = dt + s + d + m - 1
        compactA = np.zeros((k, ncols), dtype=complex)
        # poly selection block (d x dt-1): rows NNZ[:-1], cols 0..dt-2
        for j in range(dt - 1):
            compactA[NNZ[j], j] = 1.0
        sub = spdiag_rect(d, d - 1, [], np.ones(d - 1))
        compactA[:d, dt + s : dt + s + d - 1] = sub
        compactA[d:, dt : dt + s] = fz
        compactA[d:, dt + s + d - 1 : dt + s + d - 1 + m - 1] = spdiag_rect(
            m, m - 1, -w[1:] * z[:-1], w[:-1] * z[1:]
        )
        compactA[d:, -1] = 1.0
        compactA[0, -1] = -1.0
        compactB = np.zeros((k, ncols), dtype=complex)
        compactB[:d, dt + s : dt + s + d - 1] = spdiag_rect(d, d - 1, np.ones(d - 1), [])
        compactB[d - 1, dt - 1] = -1.0
        compactB[d:, dt + s + d - 1 : dt + s + d - 1 + m - 1] = spdiag_rect(
            m, m - 1, -w[1:], w[:-1]
        )
    return compactA, compactB


def AAAeigs(nep, Z, dtype=None, logger=0, mmax=100, neigs=6, maxit=None,
            shifts=(), linsolvercreator=None, tol=None, tol_appr=None,
            v0=None, errmeasure=None, weighted=False, cleanup_appr=True,
            tol_cln=None, return_details=False, check_error_every=10,
            inner_logger=0):
    lg = parse_logger(logger)
    ilg = parse_logger(inner_logger)
    if tol is None:
        tol = np.finfo(float).eps * 1e6
    if tol_appr is None:
        tol_appr = np.finfo(float).eps * 1e3
    if tol_cln is None:
        tol_cln = min(np.finfo(float).eps, tol_appr)
    if maxit is None:
        maxit = int(min(max(10 * neigs, 30), 100))
    em = ResidualErrmeasure(nep) if errmeasure is None else make_errmeasure(errmeasure, nep)
    n = nep.n
    shifts = list(shifts) if len(list(shifts)) else [0.0 + 0j]
    if linsolvercreator is None:
        linsolvercreator = FactorizeLinSolverCreator(
            max_factorizations=min(len(set(map(complex, shifts))), 10))
    sig = np.array([shifts[i % len(shifts)] for i in range(maxit)], dtype=complex)

    # AAA + pencil
    if isinstance(nep, SPMFSumNEP) and (isinstance(nep.nep1, PEP) or isinstance(nep.nep2, PEP)):
        nep_pep, nep_nep = (nep.nep1, nep.nep2) if isinstance(nep.nep1, PEP) else (nep.nep2, nep.nep1)
        Av_p = nep_pep.get_Av()
        d = len(Av_p) - 1
        def _is_zero(A):
            if isinstance(A, jnp.ndarray):
                return bool(jnp.all(A == 0))
            return bool(jnp.all(A.data == 0))
        NNZ = [i for i, A in enumerate(Av_p) if not _is_zero(A)]
        while NNZ and NNZ[-1] != d:
            NNZ.pop()
            d -= 1
        PPCC = [Av_p[i] for i in NNZ] + list(nep_nep.get_Av())
        s = len(nep_nep.get_Av())
        z, fz, w, err_appr, pol, rsd, zer = svAAA(
            nep_nep, Z, mmax=mmax, tol=tol_appr, cleanup=cleanup_appr,
            tol_cln=tol_cln, return_details=return_details, logger=ilg,
            weighted=weighted)
    else:
        NNZ = []
        PPCC = list(nep.get_Av())
        d = 0
        s = len(PPCC)
        z, fz, w, err_appr, pol, rsd, zer = svAAA(
            nep, Z, mmax=mmax, tol=tol_appr, cleanup=cleanup_appr,
            tol_cln=tol_cln, return_details=return_details, logger=ilg,
            weighted=weighted)
    m = len(z)
    compactA, compactB = _get_compact_pencil(d, s, m, z, fz, w, NNZ)
    dt = len(NNZ)
    k = d + m
    if d == 0 and dt != 0:
        k += 1
    l = dt + s
    lg.info(f"AAAPencil: Pencil is built with d={d}, s={s} and m={m}.")

    rmax = jmax = maxit
    fact_cache = {}
    max_f = min(len(set(map(complex, shifts))), 10)
    rng = np.random.default_rng(3)
    if v0 is None or len(np.atleast_1d(v0)) != n:
        v0 = rng.standard_normal(n)
    Q = np.zeros((n, rmax + 1), dtype=complex)
    Q[:, 0] = np.asarray(v0) / np.linalg.norm(v0)
    U = np.zeros((rmax + 1, k, jmax + 1), dtype=complex)
    u0v = np.zeros(k)
    u0v[0] = 1.0
    U[0, :, 0] = u0v
    H = np.zeros((jmax + 1, jmax), dtype=complex)
    K = np.zeros((jmax + 1, jmax), dtype=complex)

    def apply_P(i, x):
        A = PPCC[i]
        return (np.asarray(A @ jnp.asarray(x)) if isinstance(A, jnp.ndarray)
                else np.asarray(A.matvec(jnp.asarray(x))))

    r = 1
    j = 1
    it = 1
    nconv = 0
    Lam = np.zeros(0, dtype=complex)
    X = np.zeros((n, 0), dtype=complex)
    res = np.zeros(0)
    import scipy.linalg as sla

    while it <= maxit and nconv < neigs:
        key = complex(sig[it - 1])
        if key in fact_cache:
            lu_piv, MlN = fact_cache[key]
        else:
            MlN = np.hstack([
                np.eye(k, 1, dtype=complex),
                compactA[:, l:] - key * compactB[:, l:],
            ])
            lu_piv = sla.lu_factor(MlN)
            if len(fact_cache) < max_f:
                fact_cache[key] = (lu_piv, MlN)
        Y = sla.lu_solve(lu_piv, key * compactB[:, :l] - compactA[:, :l])
        u_c = U[:r, :k, j - 1] @ (compactB @ np.vstack([np.eye(l, dtype=complex), Y[1:, :]]))
        v1_hat = np.zeros(n, dtype=complex)
        for i in range(l):
            v1_hat += apply_P(i, Q[:, :r] @ u_c[:, i])
        solver = create_linsolver(linsolvercreator, nep, key)
        v1_hat = np.asarray(lin_solve(solver, jnp.asarray(v1_hat)))
        if dt == 0:
            phi0 = w / (key - z)
            alpha0 = phi0[0] / np.sum(phi0)
            v1_hat = alpha0 * v1_hat
        # level-1 GS vs Q
        nv = np.linalg.norm(v1_hat)
        u1_hat = Q[:, :r].conj().T @ v1_hat
        v1_hat = v1_hat - Q[:, :r] @ u1_hat
        ii = 0
        while ii < 3 and np.linalg.norm(v1_hat) < nv / np.sqrt(2):
            nv = np.linalg.norm(v1_hat)
            u1n = Q[:, :r].conj().T @ v1_hat
            v1_hat = v1_hat - Q[:, :r] @ u1n
            u1_hat = u1_hat + u1n
            ii += 1
        nv = np.linalg.norm(v1_hat)
        if nv > np.finfo(float).eps:
            rnew = r + 1
            Q[:, rnew - 1] = v1_hat / nv
            U[rnew - 1, :k, :j] = 0
            u1_hat = np.concatenate([u1_hat, [nv]])
        else:
            rnew = r
        # level-2
        W = np.tile(u1_hat[:, None], (1, k))
        W[:, 1:] = U[:rnew, :k, j - 1] @ compactB[:, l:]
        Uhat = sla.lu_solve(lu_piv, W.T, trans=1).T  # W / MlN
        U_rs = U[:rnew, :, :j].reshape(rnew * k, j, order="F")
        uhat_rs = Uhat.reshape(rnew * k, order="F")
        nu = np.linalg.norm(uhat_rs)
        H[:j, j - 1] = U_rs.conj().T @ uhat_rs
        uhat_rs = uhat_rs - U_rs @ H[:j, j - 1]
        H[j, j - 1] = np.linalg.norm(uhat_rs)
        ii = 0
        while ii < 3 and np.real(H[j, j - 1]) < nu / np.sqrt(2):
            hn = U_rs.conj().T @ uhat_rs
            uhat_rs = uhat_rs - U_rs @ hn
            H[:j, j - 1] += hn
            nu = np.real(H[j, j - 1])
            H[j, j - 1] = np.linalg.norm(uhat_rs)
            ii += 1
        U[:rnew, :, j] = uhat_rs.reshape(rnew, k, order="F") / H[j, j - 1]
        K[:j, j - 1] = key * H[:j, j - 1]
        K[j - 1, j - 1] += 1.0
        K[j, j - 1] = H[j, j - 1] * key

        if return_details or (it % check_error_every == 0) or it == maxit:
            Lam_, S = sla.eig(K[:j, :j], H[:j, :j])
            X = Q[:, :rnew] @ (U[:rnew, 0, : j + 1] @ (H[: j + 1, :j] @ S))
            res = np.array(
                [float(estimate_error(em, Lam_[i], jnp.asarray(X[:, i]))) for i in range(len(Lam_))]
            )
            conv = np.abs(res) < tol
            nconv = int(conv.sum())
            lg.info(f"AAAeigs iteration {it}: {nconv} of {it} < {tol}")
            idx = np.argsort(res)
            Lam = Lam_
            if it == maxit or nconv >= neigs:
                nb = int(min(len(Lam_), neigs))
                Lam = Lam_[idx[:nb]]
                X = X[:, idx[:nb]]
                res = res[idx[:nb]]
        r = rnew
        j += 1
        it += 1

    if nconv < neigs and neigs != np.inf:
        msg = f"AAAeigs: Number of iterations exceeded. maxit={maxit}."
        raise NoConvergenceException(Lam, X, res, msg)
    details = dict(m_appr=m, z=z, fz=fz, w=w, err_appr=err_appr,
                   pol=pol, rsd=rsd, zer=zer) if return_details else None
    return jnp.asarray(Lam), jnp.asarray(X), jnp.asarray(res), details
