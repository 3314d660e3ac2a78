"""NLEIGS: fully rational Krylov with dynamic Leja-Bagby interpolation
(Guettel/Van Beeumen/Meerbergen/Michiels 2014; reference
``src/method_nleigs.jl:59-565``).

Phase 1 expands the rational-Newton linearization degree, monitoring the
divided-difference norms and freezing once they fall below ``tollin``; the
Krylov iteration applies the shifted linearization inverse through structured
block recurrences — ONE sparse/dense solve per iteration at the current shift,
with factorizations recycled per shift through ``LinSolverCache``
("batched shifted solves" on the TPU side: shifts repeat, so the cache is hit
on all but the first visit).

Low-rank tails (``SPMFSumNEP(PEP, LowRankFactorizedNEP)``) shrink the
linearization block length from n to r in both the Krylov vectors and the
structured solves (reference ``method_nleigs.jl:186-212,399-518``).
"""
from __future__ import annotations

import warnings

import jax.numpy as jnp
import numpy as np

from ..core.errmeasure import ResidualErrmeasure, estimate_error, make_errmeasure
from ..core.nep import compute_Mder
from ..ops import lapack
from ..ops.orth import DGKS, orthogonalize_and_normalize
from .common import NoConvergenceException, setup_solver
from .rk.cache import LinSolverCache
from .rk.polygon import discretizepolygon, inpolygon
from .rk.rknep import get_rk_nep
from .rk.utils import lejabagby, ratnewtoncoeffs, scgendivdiffs

__all__ = ["nleigs", "NleigsSolutionDetails"]


class NleigsSolutionDetails:
    def __init__(self, Lam=None, Res=None, sigma=None, xi=None, beta=None,
                 nrmD=None, kconv=0):
        self.Lam = Lam
        self.Res = Res
        self.sigma = sigma
        self.xi = xi
        self.beta = beta
        self.nrmD = nrmD
        self.kconv = kconv


def in_Sigma(z, Sigma, tol):
    Sigma = np.asarray(Sigma, dtype=complex)
    if len(Sigma) == 2 and np.isreal(Sigma).all():
        realS = np.array([Sigma[0].real, Sigma[0].real, Sigma[1].real, Sigma[1].real])
        imagS = np.array([-tol, tol, tol, -tol])
    else:
        realS = Sigma.real
        imagS = Sigma.imag
    return np.array([inpolygon(p.real, p.imag, realS, imagS) for p in np.atleast_1d(z)])


def _resize(A, rows, cols):
    out = np.zeros((rows, cols), dtype=A.dtype)
    out[: A.shape[0], : A.shape[1]] = A
    return out


def nleigs(nep, Sigma=(-1.0 - 1j, -1.0 + 1j, 1.0 + 1j, 1.0 - 1j), dtype=None,
           Xi=(np.inf,), logger=0, maxdgr=100, minit=20, maxit=200,
           linsolvercreator=None, tol=1e-10, tollin=None, v=None,
           errmeasure=None, isfunm=True, static=False, leja=1, nodes=(),
           reusefact=1, blksize=20, return_details=False, check_error_every=5,
           computeD=None, _debug_out=None):
    _, _, lg = setup_solver(nep, dtype, None, logger)
    if errmeasure is None:
        em = ResidualErrmeasure(nep)
    else:
        em = make_errmeasure(errmeasure, nep)
    if tollin is None:
        tollin = max(tol / 10, 100 * np.finfo(float).eps)
    Sigma = list(Sigma)
    Xi = np.asarray(Xi, dtype=float)
    P = get_rk_nep(nep)
    n = nep.n
    if n == 1:
        maxdgr = maxit + 1
    # reference heuristic (``method_nleigs.jl:96``): explicit D matrices for
    # small problems; matrix-free above — for low-rank tails the matrix-free
    # path applies D_nb through the compacted LL + scalar weights
    # (``rk_nep.jl:102-153``), O(n r) memory independent of the Leja degree
    if computeD is None:
        computeD = n <= 400
    lr = P.is_low_rank
    p_lr = P.p if lr else None
    r_lr = P.r if lr else None
    UUc = P.UU.conj().T if lr else None
    b = blksize
    cache = LinSolverCache(nep, linsolvercreator)
    rng0 = np.random.default_rng(0)
    if v is None:
        v = rng0.standard_normal(n)
    v = np.asarray(v, dtype=complex)

    if static:
        V = np.zeros((n, 1), dtype=complex)
    else:
        V = np.zeros(((b + 1) * n, b + 1), dtype=complex)
    H = np.zeros((b + 1, b), dtype=complex)
    K = np.zeros((b + 1, b), dtype=complex)
    Lam = np.zeros((b, b), dtype=complex)
    Res = np.zeros((b, b), dtype=float)

    forceInf = max(P.p, 0)
    nodes = list(nodes)
    if leja == 0:
        if not nodes:
            raise ValueError("Interpolation nodes must be provided via 'nodes' when leja == 0")
        gamma, _ = discretizepolygon(Sigma)
        max_count = maxit + maxdgr + 2 if static else max(maxit, maxdgr) + 2
        reps = int(np.ceil(max_count / len(nodes)))
        sigma = np.tile(np.asarray(nodes, dtype=complex), reps)
        _, xi, beta = lejabagby(sigma[: maxdgr + 2], Xi, gamma, maxdgr + 2, True, forceInf)
    elif leja == 1:
        if not nodes:
            gamma, nodes = discretizepolygon(Sigma, True)
            nodes = list(nodes)
        else:
            gamma, _ = discretizepolygon(Sigma)
        reps = int(np.ceil((maxit + 1) / len(nodes)))
        nodes = np.tile(np.asarray(nodes, dtype=complex), reps)
        sigma, xi, beta = lejabagby(gamma, Xi, gamma, maxdgr + 2, False, forceInf)
    else:
        gamma, _ = discretizepolygon(Sigma)
        max_count = maxit + maxdgr + 2 if static else max(maxit, maxdgr) + 2
        sigma, xi, beta = lejabagby(gamma, Xi, gamma, max_count, False, forceInf)
    sigma = np.asarray(sigma, dtype=complex)
    xi = np.asarray(xi, dtype=complex)
    beta = np.asarray(beta, dtype=float)
    if len(xi) > maxdgr + 1:
        xi[maxdgr + 1] = np.nan

    rng = slice(0, maxdgr + 2)
    D = []
    if not P.spmf:
        D = [np.asarray(Dk) for Dk in ratnewtoncoeffs(
            lambda L: np.asarray(compute_Mder(nep, complex(np.asarray(L).ravel()[0]))),
            sigma[rng], xi[rng], beta[rng])]
        nrmD = [float(np.linalg.norm(D[0]))]
        sgdd = None
    else:
        sgdd = scgendivdiffs(sigma[rng], xi[rng], beta[rng], maxdgr, isfunm, nep.get_fv())
        if computeD:
            D = [np.asarray(P.construct_D(0, sgdd))]
        nrmD = [float(np.max(np.abs(sgdd[:, 0])))]
    if not np.isfinite(nrmD[0]):
        raise ValueError("The generalized divided differences must be finite.")

    # -- structured application of the shifted linearization inverse --------
    def _blk(j):
        """Block j slice: blocks 0..p-1 are n-sized; the low-rank tail blocks
        (j >= p) are r-sized (reference ``backslash`` index arithmetic)."""
        if not lr:
            return slice(j * n, (j + 1) * n)
        if j < p_lr:
            return slice(j * n, (j + 1) * n)
        start = p_lr * n + (j - p_lr) * r_lr
        return slice(start, start + r_lr)

    def apply_D(ii, x):
        """D_ii @ x: explicit when computeD, else matrix-free — weighted
        operand sum for full blocks, compacted-LL tail for r-sized blocks."""
        if (not P.spmf) or computeD:
            return D[ii] @ x
        if lr and ii > p_lr:
            return P.apply_tail(sgdd, ii, x)
        return np.asarray(P.apply_weighted(sgdd[:, ii], jnp.asarray(x)))

    def backslash(wc, k, N):
        shift = sigma[k]
        Bw = np.zeros_like(wc)
        blk = _blk
        if lr and N >= p_lr and len(nrmD) > p_lr:
            # extra first-block term (reference ``backslash`` low-rank head);
            # only once the low-rank tail blocks exist (N >= p)
            Bw[blk(0)] = -apply_D(p_lr, wc[_blk(p_lr - 1)]) / beta[p_lr]
        for ii in range(1, N + 1):
            fac = 0.0 if np.isinf(xi[ii - 1]) else beta[ii] / xi[ii - 1]
            if lr and ii == p_lr:
                Bw[blk(ii)] = UUc @ wc[blk(ii - 1)] + fac * wc[blk(ii)]
            else:
                Bw[blk(ii)] = wc[blk(ii - 1)] + fac * wc[blk(ii)]
        z = Bw.copy()
        nu = beta[1] * (1 - shift / xi[0]) if not np.isinf(xi[0]) else beta[1]
        z[blk(1)] = z[blk(1)] / nu
        for ii in range(1, N + 1):
            if not (lr and ii == p_lr):
                z[blk(0)] -= apply_D(ii, z[blk(ii)])
            if ii < N:
                # julia: mu = shift - sigma[ii+1] (1-based) -> sigma[ii] here
                mu = shift - sigma[ii]
                nu = beta[ii + 1] * (1 - shift / xi[ii]) if not np.isinf(xi[ii]) else beta[ii + 1]
                if lr and ii == p_lr - 1:
                    z[blk(ii + 1)] = z[blk(ii + 1)] / nu + (mu / nu) * (UUc @ z[blk(ii)])
                else:
                    z[blk(ii + 1)] = z[blk(ii + 1)] / nu + (mu / nu) * z[blk(ii)]
        w = np.zeros_like(wc)
        add = ((not expand or k > kconv) and reusefact == 1) or reusefact == 2
        w[blk(0)] = np.asarray(cache.solve(shift, z[blk(0)] / beta[0], add))
        for ii in range(1, N + 1):
            mu = shift - sigma[ii - 1]
            nu = beta[ii] * (1 - shift / xi[ii - 1]) if not np.isinf(xi[ii - 1]) else beta[ii]
            if lr and ii == p_lr:
                w[blk(ii)] = (mu / nu) * (UUc @ w[blk(ii - 1)]) + Bw[blk(ii)] / nu
            else:
                w[blk(ii)] = (mu / nu) * w[blk(ii - 1)] + Bw[blk(ii)] / nu
        return w

    # -- rational Krylov ----------------------------------------------------
    v0 = np.asarray(cache.solve(sigma[0], v / np.linalg.norm(v), reusefact == 2))
    V[:n, 0] = v0 / np.linalg.norm(v0)
    expand = True
    kconv = 10**9
    kn = n
    l = 0
    N = 0
    nbconv = 0
    nblamin = 0
    lam = np.zeros(0, dtype=complex)
    X = np.zeros((n, 0), dtype=complex)
    res = np.zeros(0)
    conv = np.zeros(0, dtype=bool)
    kmax = maxit + maxdgr if static else maxit
    k = 1
    while k <= kmax:
        if l > 0 and (b == 1 or (l + 1) % b == 1):
            nb = round(1 + l / b)
            Vrows = V.shape[0]
            if expand or not P.spmf:
                Vrows = kn + b * n
            V = _resize(V, Vrows, nb * b + 1)
            H = _resize(H, H.shape[0] + b, H.shape[1] + b)
            K = _resize(K, K.shape[0] + b, K.shape[1] + b)
            if return_details:
                Lam = _resize(Lam, Lam.shape[0] + b, Lam.shape[1] + b)
                Res = _resize(Res, Res.shape[0] + b, Res.shape[1] + b).real

        if expand:
            kn += n if (not lr or k < p_lr) else r_lr
            if P.spmf and computeD:
                D.append(np.asarray(P.construct_D(k, sgdd)))
            N += 1
            if not P.spmf:
                nrmD.append(float(np.linalg.norm(D[k])))
            else:
                nrmD.append(float(np.max(np.abs(sgdd[:, k]))))
            if not np.isfinite(nrmD[k]):
                raise ValueError("The generalized divided differences must be finite.")
            if n > 1 and k >= 5 and k < kconv:
                if sum(nrmD[k - 4 : k + 1]) < 5 * tollin:
                    kconv = k - 1
                    if static:
                        kmax = maxit + kconv
                    expand = False
                    if leja == 1:
                        if len(sigma) < kmax + 1:
                            sigma = np.concatenate([sigma, np.zeros(kmax + 1 - len(sigma), dtype=complex)])
                        sigma[k : kmax + 1] = nodes[: kmax - k + 1]
                    if (not P.spmf) or computeD:
                        D = D[:k]
                    xi = xi[:k]
                    beta = beta[:k]
                    nrmD = nrmD[:k]
                    if static:
                        kn -= n
                        V = _resize(V, kn, b + 1)
                    N -= 1
                    lg.info(f"Linearization converged after {kconv} iterations")
                    lg.info("--> freeze linearization")
                elif k == maxdgr + 1:
                    kconv = k
                    expand = False
                    if leja == 1:
                        if len(sigma) < kmax + 1:
                            sigma = np.concatenate([sigma, np.zeros(kmax + 1 - len(sigma), dtype=complex)])
                        sigma[k : kmax + 1] = nodes[: kmax - k + 1]
                    if static:
                        V = _resize(V, kn, b + 1)
                    N -= 1
                    warnings.warn(f"NLEIGS: Linearization not converged after {maxdgr} iterations")
                    lg.info("--> freeze linearization")

        l = k - N if static else k

        if (not static) or (static and not expand):
            t = np.zeros(l, dtype=complex)
            t[l - 1] = 1.0
            wc = V[:kn, l - 1]
            w = backslash(wc, k, N)
            wj, h, bta = orthogonalize_and_normalize(
                jnp.asarray(V[:kn, :l]), jnp.asarray(w), DGKS()
            )
            H[:l, l - 1] = np.asarray(h)
            H[l, l - 1] = complex(bta)
            K[:l, l - 1] = np.asarray(h) * sigma[k] + t
            K[l, l - 1] = complex(bta) * sigma[k]
            V[:kn, l] = np.asarray(wj)

        def check_convergence(allmode):
            nonlocal lam, X, res, conv, nbconv, nblamin
            lambda_, S = lapack.geig(jnp.asarray(K[:l, :l]), jnp.asarray(H[:l, :l]))
            lambda_ = np.asarray(lambda_)
            S = np.array(S)
            if not allmode:
                lamin = in_Sigma(lambda_, Sigma, tol)
                ilam = np.flatnonzero(lamin)
                lam = lambda_[ilam]
                nblamin = int(lamin.sum())
            else:
                ilam = np.flatnonzero(np.isfinite(lambda_))
                lam = lambda_[ilam]
                lamin = in_Sigma(lam, Sigma, tol)
                nblamin = int(lamin.sum())
            for i in ilam:
                S[:, i] /= np.linalg.norm(H[: l + 1, :l] @ S[:, i])
            X = V[:n, : l + 1] @ (H[: l + 1, :l] @ S[:, ilam])
            for i in range(X.shape[1]):
                nx = np.linalg.norm(X[:, i])
                if nx > 0:
                    X[:, i] /= nx
            res = np.array(
                [float(estimate_error(em, lam[i], jnp.asarray(X[:, i]))) for i in range(len(lam))]
            )
            conv = np.abs(res) < tol
            if allmode:
                conv = conv & lamin
            nbconv = int(conv.sum())
            it = k - N if static else k
            lg.info(f"  iteration {it}: {nbconv} of {nblamin} < {tol}")

        if (not return_details) and (
            (not expand and k >= N + minit and (k - (N + minit)) % check_error_every == 0)
            or (k >= kconv + minit and (k - (kconv + minit)) % check_error_every == 0)
            or k == kmax
        ):
            check_convergence(False)
        elif return_details and ((not static) or (static and not expand)):
            check_convergence(True)

        if ((not expand and k >= N + minit) or k >= kconv + minit) and nblamin == nbconv:
            break
        k += 1

    if _debug_out is not None:
        _debug_out.update(dict(V=V, H=H, K=K, N=N, D=D, sigma=sigma, xi=xi,
                               beta=beta, l=l, kn=kn, k=k))
    details = NleigsSolutionDetails()
    if return_details:
        details = NleigsSolutionDetails(Lam[:l, :l], Res[:l, :l], sigma[:k],
                                        xi, beta, np.asarray(nrmD), kconv if kconv < 10**9 else 0)
    sel = np.flatnonzero(conv) if len(conv) else np.zeros(0, dtype=int)
    return (jnp.asarray(lam[sel]), jnp.asarray(X[:, sel]),
            jnp.asarray(res[sel]) if len(res) else jnp.zeros(0), details)
