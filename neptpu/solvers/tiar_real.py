"""Compiled complex-as-real tensor-IAR (TIAR) — the gun-scale Krylov layout.

Reference ``src/method_tiar.jl:52-257``: the IAR basis ``V (n(m+1) x m)`` is
factorized as ``Z (n x (m+1))`` times a coefficient tensor ``a (m+1)^3``, so
memory is O(nm + m^3) instead of IAR's O(nm^2) — at gun scale (n ~ 1e4,
m ~ 100) that is 8 MB instead of 800 MB.  This module compiles the whole
m-step recurrence into ONE ``lax.scan`` in split re/im channels (this TPU
exposes real f32/bf16 only):

* the length-n work per step is two GEMM pairs (``Z @ a``-slice expansions),
  the fused term-bank Mlincomb, the real 2n x 2n block-LU solve, and one
  DGKS pair against Z — everything else is (m+1)^2 tensor bookkeeping
  (reference ``method_tiar.jl:126-183``) expressed as padded einsum pairs;
* the same host-side coefficient tables and block LU as
  :mod:`neptpu.solvers.iar_real` / :mod:`neptpu.solvers.spmf_real` feed it,
  so every DEP and real-operand SPMF (gun = PEP + i*sqrt terms) runs on the
  real backend;
* ``check_error_every`` chunks the scan with host Ritz peeks for true
  time-to-tolerance early exit.
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["tiar_real_scan", "run_tiar_real", "tiar_real", "tiar_real_spmf"]


def _tiar_step_fn(bank, m, Cre, Cim, gre, gim, lu, piv, dt):
    """One split re/im TIAR step; ``k`` is the 1-based dynamic step index.

    carry: (Zre, Zim (n, m+1), are, aim (m+1, m+1, m+1) [i=deriv, j=iter,
    l=Z-col], Hre, Him (m+1, m)).  Padding invariant: column j of ``a`` and
    ``Z`` is zero for j > steps done, so padded GEMMs equal the reference's
    growing-slice GEMMs.
    """
    jblk = jnp.arange(m + 1)
    n = lu.shape[0] // 2

    def step(carry, k):
        Zre, Zim, are, aim, Hre, Him = carry
        inv = jnp.where((jblk >= 1) & (jblk <= k), 1.0 / jnp.maximum(jblk, 1),
                        0.0).astype(dt)

        # ---- expand: y[:, 1+i] = (Z @ a[:, k-1, :].T)[:, i] / (i+1) -------
        Are = are[:, k - 1, :]  # (i, l)
        Aim = aim[:, k - 1, :]
        Ytre = Zre @ Are.T - Zim @ Aim.T  # (n, m+1), col i
        Ytim = Zre @ Aim.T + Zim @ Are.T
        yre = jnp.roll(Ytre, 1, axis=1) * inv[None, :]  # y[:, 1:] filled
        yim = jnp.roll(Ytim, 1, axis=1) * inv[None, :]

        # ---- Mlincomb via coefficient table + fused bank apply ------------
        WreT = Cre @ yre.T - Cim @ yim.T  # (terms, n)
        WimT = Cre @ yim.T + Cim @ yre.T
        if hasattr(bank, "lincomb_apply_split"):  # complex-operand aware
            zre, zim = bank.lincomb_apply_split(WreT.T, WimT.T)
            zre, zim = zre.astype(dt), zim.astype(dt)
        else:
            zre = bank.lincomb_apply(WreT.T).astype(dt)
            zim = bank.lincomb_apply(WimT.T).astype(dt)
        zre = zre - gre * yre[:, 1] + gim * yim[:, 1]
        zim = zim - gre * yim[:, 1] - gim * yre[:, 1]

        # ---- shifted solve: y0 = -M(sigma)^{-1} z -------------------------
        sol = jax.scipy.linalg.lu_solve((lu, piv), jnp.concatenate([zre, zim]))
        y0re, y0im = -sol[:n], -sol[n:]

        # ---- DGKS of y0 against Z (columns > k-? are zero, harmless) ------
        def cgs(wre, wim):
            tre = Zre.T @ wre + Zim.T @ wim  # Re(Z^H w)
            tim = Zre.T @ wim - Zim.T @ wre  # Im(Z^H w)
            wre = wre - (Zre @ tre - Zim @ tim)
            wim = wim - (Zre @ tim + Zim @ tre)
            return wre, wim, tre, tim

        wre, wim, t1re, t1im = cgs(y0re, y0im)
        wre, wim, t2re, t2im = cgs(wre, wim)
        tre, tim = t1re + t2re, t1im + t2im
        beta = jnp.sqrt(jnp.sum(wre**2) + jnp.sum(wim**2))
        Zre = Zre.at[:, k].set(wre / beta)
        Zim = Zim.at[:, k].set(wim / beta)
        tre = tre.at[k].set(beta)  # t[k] = beta (real)

        # ---- tensor-level DGKS (reference :126-183), padded einsums -------
        # g[1+i, l] = a[i, k-1, l]/(i+1);  g[0, l] = t[l]
        gre_t = jnp.roll(Are, 1, axis=0) * inv[:, None]
        gim_t = jnp.roll(Aim, 1, axis=0) * inv[:, None]
        gre_t = gre_t.at[0, :].set(tre)
        gim_t = gim_t.at[0, :].set(tim)

        def tcgs(gre_t, gim_t):
            # h_j = sum_{i,l} conj(a[i,j,l]) g[i,l]
            hre = (jnp.einsum("ijl,il->j", are, gre_t)
                   + jnp.einsum("ijl,il->j", aim, gim_t))
            him = (jnp.einsum("ijl,il->j", are, gim_t)
                   - jnp.einsum("ijl,il->j", aim, gre_t))
            # f[i, l] = g[i, l] - sum_j a[i, j, l] h[j]
            fre = gre_t - (jnp.einsum("ijl,j->il", are, hre)
                           - jnp.einsum("ijl,j->il", aim, him))
            fim = gim_t - (jnp.einsum("ijl,j->il", are, him)
                           + jnp.einsum("ijl,j->il", aim, hre))
            return fre, fim, hre, him

        fre, fim, h1re, h1im = tcgs(gre_t, gim_t)
        fre, fim, h2re, h2im = tcgs(fre, fim)
        hre, him = h1re + h2re, h1im + h2im
        beta2 = jnp.sqrt(jnp.sum(fre**2) + jnp.sum(fim**2))

        Hre = Hre.at[:, k - 1].set(jnp.where(jblk == k, beta2, hre))
        Him = Him.at[:, k - 1].set(jnp.where(jblk == k, 0.0, him))
        are = are.at[:, k, :].set(fre / beta2)
        aim = aim.at[:, k, :].set(fim / beta2)
        return (Zre, Zim, are, aim, Hre, Him), beta2

    return step


def _tiar_init(m, v0re, v0im, dt):
    n = v0re.shape[0]
    nrm0 = jnp.sqrt(jnp.sum(v0re**2) + jnp.sum(v0im**2))
    Zre = jnp.zeros((n, m + 1), dtype=dt).at[:, 0].set(v0re / nrm0)
    Zim = jnp.zeros((n, m + 1), dtype=dt).at[:, 0].set(v0im / nrm0)
    are = jnp.zeros((m + 1, m + 1, m + 1), dtype=dt).at[0, 0, 0].set(1.0)
    aim = jnp.zeros((m + 1, m + 1, m + 1), dtype=dt)
    H0 = jnp.zeros((m + 1, m), dtype=dt)
    return (Zre, Zim, are, aim, H0, H0)


@partial(jax.jit, static_argnames=("m", "nsteps"))
def _tiar_chunk(bank, m, nsteps, k0, carry, Cre, Cim, gre, gim, lu, piv):
    dt = carry[0].dtype
    step = _tiar_step_fn(bank, m, Cre, Cim, gre, gim, lu, piv, dt)
    return jax.lax.scan(step, carry, k0 + jnp.arange(nsteps))[0]


@partial(jax.jit, static_argnames=("m",))
def tiar_real_scan(bank, m, Cre, Cim, gre, gim, v0re, v0im, lu, piv):
    """Run m complex-as-real TIAR steps; returns the final carry
    (Zre, Zim, are, aim, Hre, Him)."""
    dt = jnp.result_type(v0re.dtype, Cre.dtype)
    carry = _tiar_init(m, v0re.astype(dt), v0im.astype(dt), dt)
    step = _tiar_step_fn(bank, m, Cre, Cim, gre, gim, lu, piv, dt)
    return jax.lax.scan(step, carry, jnp.arange(1, m + 1))[0]


def _tiar_extract(carry, k_done, n, sigma, gamma):
    """Ritz pairs from the tensor basis: VV = Z[:, :k] @ a[0, :k, :k].T,
    Q = VV @ eigvecs(H[:k, :k])."""
    from .iar_real import fetch_host

    Zre, Zim, are, aim, Hre, Him = carry
    mp1 = Hre.shape[0]
    Hre_h = fetch_host(Hre, (mp1, mp1 - 1))
    Him_h = fetch_host(Him, (mp1, mp1 - 1))
    H = Hre_h[:k_done, :k_done] + 1j * Him_h[:k_done, :k_done]
    D, W = np.linalg.eig(H)
    lams = complex(sigma) + complex(gamma) / D
    nv = Zre.shape[0]
    Z = (fetch_host(Zre, (nv, mp1)) + 1j * fetch_host(Zim, (nv, mp1)))[:n]
    a0 = (fetch_host(are[0], (mp1, mp1)) + 1j * fetch_host(aim[0], (mp1, mp1)))
    VV = Z[:, :k_done] @ a0[:k_done, :k_done].T
    Q = VV @ W
    Q = Q / np.linalg.norm(Q, axis=0, keepdims=True)
    return lams, Q


def run_tiar_real(bank, m, Cre, Cim, id_coeff, v, lu_piv, dt, *, sigma, gamma,
                  neigs, tol, resnorm, n=None, check_error_every=None):
    """Shared complex-as-real TIAR driver (same contract as
    :func:`neptpu.solvers.iar_real.run_iar_real`)."""
    if n is None:
        n = int(lu_piv[0].shape[0]) // 2
    v = np.asarray(v, dtype=complex)
    id_coeff = complex(id_coeff)
    args = (jnp.asarray(Cre, dt), jnp.asarray(Cim, dt),
            jnp.asarray(id_coeff.real, dt),
            jnp.asarray(id_coeff.imag, dt),
            lu_piv[0].astype(dt), lu_piv[1])

    t0 = time.perf_counter()
    t_check = 0.0
    if check_error_every and np.isfinite(tol):
        chunk = int(check_error_every)
        carry = _tiar_init(m, jnp.asarray(v.real, dt), jnp.asarray(v.imag, dt),
                           dt)
        k_done = 0
        lams = Q = None
        while k_done < m:
            steps = min(chunk, m - k_done)
            carry = _tiar_chunk(bank, m, steps, jnp.asarray(k_done + 1),
                                carry, *args)
            k_done += steps
            tc = time.perf_counter()
            lams, Q = _tiar_extract(carry, k_done, n, sigma, gamma)
            errs = np.array([resnorm(lams[s], Q[:, s])
                             for s in range(len(lams))])
            t_check += time.perf_counter() - tc
            if int(np.sum(errs < tol)) >= neigs:
                break
    else:
        carry = tiar_real_scan(bank, m, *args[:4],
                               jnp.asarray(v.real, dt),
                               jnp.asarray(v.imag, dt), *args[4:])
        k_done = m
        lams, Q = _tiar_extract(carry, k_done, n, sigma, gamma)
        errs = np.array([resnorm(lams[s], Q[:, s]) for s in range(len(lams))])
    t_scan = time.perf_counter() - t0

    idx = np.argsort(errs)
    nconv = int(np.sum(errs < tol)) if np.isfinite(tol) else len(errs)
    take = idx[: min(neigs, nconv)]
    info = {"t_scan": t_scan, "t_check": t_check, "nconv": nconv,
            "k_done": k_done, "errs": errs[idx]}
    return lams[take], Q[:, take], info


def tiar_real(nep, sigma=0.0, gamma=1.0, maxit=30, neigs=6, tol=None, v=None,
              dtype=jnp.float32, lu_piv=None, check_error_every=None,
              errmeasure=None, return_info=False):
    """Compiled complex-as-real TIAR on a DEP (contract of
    :func:`neptpu.solvers.iar_real.iar_real`, tensor-factorized basis)."""
    from .iar_real import _dep_host_resnorm, dep_coeff_table, \
        dep_shift_block_lu

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
    rn = errmeasure if errmeasure is not None else _dep_host_resnorm(nep)
    lams, Q, info = run_tiar_real(
        nep.bank, m, Cre, Cim, gamma, v, lu_piv, dt,
        sigma=sigma, gamma=gamma, neigs=neigs, tol=tol, resnorm=rn, n=n,
        check_error_every=check_error_every)
    info["t_factorize"] = t_fact
    if return_info:
        return lams, Q, info
    return lams, Q


def tiar_real_spmf(nep, sigma=0.0, gamma=1.0, maxit=30, neigs=6, tol=None,
                   v=None, dtype=jnp.float32, lu_piv=None, bank=None,
                   check_error_every=None, errmeasure=None,
                   return_info=False):
    """Compiled complex-as-real TIAR on a real-operand SPMF (gun-class
    problems; contract of :func:`neptpu.solvers.spmf_real.iar_real_spmf`)."""
    from ..ops.mixed import make_mixed_bank
    from .spmf_real import (
        _spmf_host_resnorm,
        collect_spmf_terms,
        spmf_coeff_table,
        spmf_shift_block_lu,
    )

    mats, fv = collect_spmf_terms(nep)
    n = mats[0].shape[0]
    m = int(maxit)
    dt = jnp.dtype(dtype)
    if tol is None:
        tol = 1e4 * float(jnp.finfo(dt).eps)
    if bank is None:
        bank = make_mixed_bank(mats, dtype=np.dtype(dt))
    t0 = time.perf_counter()
    if lu_piv is None:
        lu_piv = spmf_shift_block_lu(mats, fv, sigma, dtype=dt)
        jax.block_until_ready(lu_piv)
    t_fact = time.perf_counter() - t0
    Cre, Cim = spmf_coeff_table(fv, sigma, gamma, m)
    if v is None:
        v = np.ones(n)
    rn = errmeasure if errmeasure is not None else _spmf_host_resnorm(mats, fv)
    lams, Q, info = run_tiar_real(
        bank, m, Cre, Cim, 0.0, v, lu_piv, dt,
        sigma=sigma, gamma=gamma, neigs=neigs, tol=tol, resnorm=rn, n=n,
        check_error_every=check_error_every)
    info["t_factorize"] = t_fact
    if return_info:
        return lams, Q, info
    return lams, Q
