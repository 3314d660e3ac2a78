"""Complex-as-real compiled IAR — the flagship single-chip TPU solver path.

This TPU generation exposes real f32/bf16 arithmetic only (no complex
dtype), so the infinite-Arnoldi iteration (reference ``src/method_iar.jl:
46-184``) is carried in split re/im channels:

* the DEP fast-path Mlincomb (reference ``NEPTypes.jl:940-968``) becomes a
  small complex coefficient table ``C[i, j] = gamma^j (-tau_i)^j e^{-tau_i
  sigma}`` applied as four real GEMMs + two real fused DIA/term-bank applies
  (which auto-select the Pallas streaming kernel on TPU);
* the shifted solve ``M(sigma)^{-1}`` becomes one real block LU of the
  ``2n x 2n`` matrix ``[[Re M, -Im M], [Im M, Re M]]`` — factored once and
  reused every step, the reference's ``FactorizeLinSolver`` role
  (``LinSolvers.jl:109-137``);
* DGKS orthogonalization against the stacked basis becomes paired real
  GEMMs (re/im parts of the conjugated inner products).

The m-step run compiles to ONE ``lax.scan`` program (static shapes, padded
basis); Ritz extraction happens once on the host.  The same kernel runs in
f64 pairs on CPU, where it must agree with the complex ``iar_scan_kernel``
to machine precision (tests/test_iar_real.py).
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.nep import compute_resnorm

__all__ = ["iar_real", "iar_real_scan", "dep_shift_block_lu", "dep_coeff_table"]


def _dep_host_resnorm(nep):
    """Host-side (numpy/scipy) DEP residual ||M(lam) q|| / ||q||.

    On TPU the default backend has no complex dtype, so the (off-hot-path)
    residual checks run on the host against scipy mirrors of the bank terms.
    """
    import scipy.sparse as sp

    n = nep.n
    bank = nep.bank
    tau = np.asarray(nep.tauv, dtype=float)
    terms = []
    if hasattr(bank, "offsets"):  # DiaTermBank
        data = np.asarray(bank.data, dtype=np.float64)
        offs = np.asarray(bank.offsets)
        r = np.arange(n)
        for i in range(data.shape[0]):
            rows, cols, vals = [], [], []
            for d, off in enumerate(offs):
                rr = r[: n - off] if off >= 0 else r[-off:]
                rows.append(rr)
                cols.append(rr + off)
                vals.append(data[i, d][rr])
            terms.append(sp.csr_matrix(
                (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
                shape=(n, n)))
    else:
        for i in range(bank.nterms):
            A = bank.term(i) if hasattr(bank, "term") else bank.A[i]
            A = A.to_dense() if hasattr(A, "to_dense") else A
            terms.append(sp.csr_matrix(np.asarray(A, dtype=np.float64)))

    def resnorm(lam, q):
        # ||M(lam) q|| exactly like compute_resnorm (NEPCore.jl:275-279)
        y = -lam * q
        for t, A in zip(tau, terms):
            y = y + np.exp(-t * lam) * (A @ q)
        return float(np.linalg.norm(y))

    return resnorm


def dep_coeff_table(nep, sigma, gamma, m):
    """C[i, j] = gamma^j (-tau_i)^j e^{-tau_i sigma} (j = 0..m, column 0
    zeroed: the IAR linear combination starts at the first derivative).
    Returns (Cre, Cim) numpy float64."""
    tau = np.asarray(nep.tauv, dtype=float)
    j = np.arange(m + 1)
    C = (complex(gamma) ** j)[None, :] * ((-tau[:, None]) ** j[None, :]) \
        * np.exp(-tau[:, None] * complex(sigma))
    C[:, 0] = 0.0
    return np.ascontiguousarray(C.real), np.ascontiguousarray(C.imag)


def dep_shift_block_lu(nep, sigma, dtype=jnp.float32):
    """Real 2n x 2n block form of M(sigma), LU-factored on device.

    [[Re M, -Im M], [Im M, Re M]] @ [re; im] == re/im parts of M @ (re+i*im).
    """
    M0 = np.asarray(nep.Mder_dense(complex(sigma)))
    n = M0.shape[0]
    blk = np.zeros((2 * n, 2 * n), dtype=np.float64)
    blk[:n, :n] = M0.real
    blk[:n, n:] = -M0.imag
    blk[n:, :n] = M0.imag
    blk[n:, n:] = M0.real
    return jax.scipy.linalg.lu_factor(jnp.asarray(blk, dtype=dtype))


@partial(jax.jit, static_argnames=("m",))
def iar_real_scan(bank, m, Cre, Cim, gre, gim, v0re, v0im, lu, piv):
    """Run m complex-as-real IAR steps.

    bank: term bank pytree (offsets ride in static aux data, the diagonal
    values are traced operands); its ``lincomb_apply`` drives the fused
    multi-term SpMV.  Returns (Vre, Vim, Hre, Him): padded basis
    (m+1 cols, m+1 blocks, n) pairs and the (m+1, m) Hessenberg pair.
    """
    n = v0re.shape[0]
    dt = jnp.result_type(v0re.dtype, Cre.dtype)
    jblk = jnp.arange(m + 1)

    nrm0 = jnp.sqrt(jnp.sum(v0re**2) + jnp.sum(v0im**2))
    Vre = jnp.zeros((m + 1, m + 1, n), dtype=dt).at[0, 0].set(v0re / nrm0)
    Vim = jnp.zeros((m + 1, m + 1, n), dtype=dt).at[0, 0].set(v0im / nrm0)

    def step(carry, k):
        Vre, Vim, Hre, Him = carry
        scale = jnp.where(jblk < k, 1.0 / (jblk + 1.0), 0.0).astype(dt)
        ytre = jnp.roll(Vre[k - 1] * scale[:, None], 1, axis=0)  # (m+1, n)
        ytim = jnp.roll(Vim[k - 1] * scale[:, None], 1, axis=0)

        # delay terms: W = Y @ C^T, complex split into four small GEMMs
        WreT = Cre @ ytre - Cim @ ytim  # (terms, n)
        WimT = Cre @ ytim + Cim @ ytre
        zre = bank.lincomb_apply(WreT.T).astype(dt)  # bank may be wider (f64)
        zim = bank.lincomb_apply(WimT.T).astype(dt)
        # identity term: -gamma * y_1
        zre = zre - gre * ytre[1] + gim * ytim[1]
        zim = zim - gre * ytim[1] - gim * ytre[1]

        sol = jax.scipy.linalg.lu_solve((lu, piv), jnp.concatenate([zre, zim]))
        yre = ytre.at[0].set(-sol[:n])
        yim = ytim.at[0].set(-sol[n:])

        # DGKS (two-pass CGS) in paired-real arithmetic
        wre, wim = yre.reshape(-1), yim.reshape(-1)
        VreM = Vre.reshape(m + 1, -1)
        VimM = Vim.reshape(m + 1, -1)

        def cgs(wre, wim):
            hre = VreM @ wre + VimM @ wim  # Re(conj(V) @ w)
            him = VreM @ wim - VimM @ wre  # Im(conj(V) @ w)
            wre = wre - (VreM.T @ hre - VimM.T @ him)
            wim = wim - (VreM.T @ him + VimM.T @ hre)
            return wre, wim, hre, him

        wre, wim, h1re, h1im = cgs(wre, wim)
        wre, wim, h2re, h2im = cgs(wre, wim)
        hre, him = h1re + h2re, h1im + h2im
        beta = jnp.sqrt(jnp.sum(wre**2) + jnp.sum(wim**2))
        wre, wim = wre / beta, wim / beta

        Vre = Vre.at[k].set(wre.reshape(m + 1, n))
        Vim = Vim.at[k].set(wim.reshape(m + 1, n))
        Hre = Hre.at[:, k - 1].set(jnp.where(jblk == k, beta, hre))
        Him = Him.at[:, k - 1].set(jnp.where(jblk == k, 0.0, him))
        return (Vre, Vim, Hre, Him), beta

    H0 = jnp.zeros((m + 1, m), dtype=dt)
    (Vre, Vim, Hre, Him), _ = jax.lax.scan(
        step, (Vre, Vim, H0, H0), jnp.arange(1, m + 1)
    )
    return Vre, Vim, Hre, Him


def iar_real(nep, sigma=0.0, gamma=1.0, maxit=30, neigs=6, tol=None, v=None,
             dtype=jnp.float32, lu_piv=None, return_info=False):
    """Complex-as-real IAR on a DEP (reference ``iar`` contract: returns
    converged ``(lams, Q)``, sorted by residual).

    ``lu_piv``: optionally a prefactored result of
    :func:`dep_shift_block_lu` (the factorization-reuse path).
    """
    n = nep.n
    m = int(maxit)
    dt = jnp.dtype(dtype)
    if tol is None:
        tol = 1e4 * float(jnp.finfo(dt).eps)

    t0 = time.perf_counter()
    if lu_piv is None:
        lu_piv = dep_shift_block_lu(nep, sigma, dtype=dt)
        jax.block_until_ready(lu_piv)
    t_fact = time.perf_counter() - t0

    Cre, Cim = dep_coeff_table(nep, sigma, gamma, m)
    if v is None:
        v = np.ones(n)
    v = np.asarray(v, dtype=complex)

    t0 = time.perf_counter()
    Vre, Vim, Hre, Him = iar_real_scan(
        nep.bank, m,
        jnp.asarray(Cre, dt), jnp.asarray(Cim, dt),
        jnp.asarray(float(np.real(gamma)), dt),
        jnp.asarray(float(np.imag(gamma)), dt),
        jnp.asarray(v.real, dt), jnp.asarray(v.imag, dt),
        lu_piv[0].astype(dt), lu_piv[1],
    )
    Hre_h = np.asarray(Hre, dtype=np.float64)  # forces completion
    Him_h = np.asarray(Him, dtype=np.float64)
    t_scan = time.perf_counter() - t0

    # host Ritz extraction: lam = sigma + gamma / theta
    H = Hre_h[:m, :m] + 1j * Him_h[:m, :m]
    D, Z = np.linalg.eig(H)
    lams = complex(sigma) + complex(gamma) / D
    V0 = (np.asarray(Vre[:, 0, :], dtype=np.float64)
          + 1j * np.asarray(Vim[:, 0, :], dtype=np.float64)).T  # (n, m+1)
    Q = V0[:, :m] @ Z
    Q = Q / np.linalg.norm(Q, axis=0, keepdims=True)

    try:  # backend with complex support: residuals through the NEP protocol
        errs = np.array([float(compute_resnorm(nep, lams[s], jnp.asarray(Q[:, s])))
                         for s in range(len(lams))])
    except Exception:  # TPU without complex: host-side scipy residuals
        rn = _dep_host_resnorm(nep)
        errs = np.array([rn(lams[s], Q[:, s]) for s in range(len(lams))])
    idx = np.argsort(errs)
    nconv = int(np.sum(errs < tol))
    take = idx[: min(neigs, nconv)]
    info = {"t_factorize": t_fact, "t_scan": t_scan, "nconv": nconv,
            "errs": errs[idx]}
    if return_info:
        return lams[take], Q[:, take], info
    return lams[take], Q[:, take]
