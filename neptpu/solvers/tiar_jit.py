"""Compiled complex TIAR — one ``lax.scan`` for complex-dtype backends.

Reference ``src/method_tiar.jl:52-257``.  The host ``solvers/tiar.py`` loop
round-trips numpy<->device every iteration (~30 ms/op on a tunneled
runtime); this module compiles the whole m-step tensor-IAR recurrence into
ONE ``lax.scan`` in native complex arithmetic — the CPU/GPU complex128
counterpart of the split re/im ``solvers/tiar_real.py`` (TPU has no complex
dtype; CPU f64 complex is where the reference tolerances live).

Basis memory is O(nm + m^3): ``Z (n, m+1)`` orthonormal columns times the
coefficient tensor ``a (m+1)^3``.
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["tiar_scan_complex", "tiar_jitted", "tiar_jitted_spmf"]


def _step_fn(bank, m, C, gamma_id, lu, piv, cdt):
    """One complex TIAR step; ``k`` is the 1-based dynamic step index.
    carry: (Z (n, m+1), a (m+1)^3 [i=deriv, j=iter, l=Z-col], H (m+1, m))."""
    jblk = jnp.arange(m + 1)

    def step(carry, k):
        Z, a, H = carry
        inv = jnp.where((jblk >= 1) & (jblk <= k),
                        1.0 / jnp.maximum(jblk, 1), 0.0).astype(Z.real.dtype)

        # expand: y[:, 1+i] = (Z @ a[:, k-1, :].T)[:, i] / (i+1)
        A = a[:, k - 1, :]
        y = jnp.roll(Z @ A.T, 1, axis=1) * inv[None, :]

        # Mlincomb via the table + fused bank apply (complex path)
        W = (C @ y.T).T  # (n, terms)
        z = bank.lincomb_apply(W).astype(cdt)
        z = z - gamma_id * y[:, 1]

        sol = jax.scipy.linalg.lu_solve((lu, piv), z)
        y0 = -sol

        # DGKS of y0 against Z
        def cgs(w):
            t = Z.conj().T @ w
            return w - Z @ t, t

        w, t1 = cgs(y0)
        w, t2 = cgs(w)
        t = t1 + t2
        beta = jnp.sqrt(jnp.sum(jnp.abs(w) ** 2)).astype(cdt)
        Z = Z.at[:, k].set(w / beta)
        t = t.at[k].set(beta)

        # tensor-level DGKS (reference method_tiar.jl:126-183)
        g = jnp.roll(A, 1, axis=0) * inv[:, None]
        g = g.at[0, :].set(t)

        def tcgs(g):
            h = jnp.einsum("ijl,il->j", a.conj(), g)
            f = g - jnp.einsum("ijl,j->il", a, h)
            return f, h

        f, h1 = tcgs(g)
        f, h2 = tcgs(f)
        h = h1 + h2
        beta2 = jnp.sqrt(jnp.sum(jnp.abs(f) ** 2)).astype(cdt)
        H = H.at[:, k - 1].set(jnp.where(jblk == k, beta2, h))
        a = a.at[:, k, :].set(f / beta2)
        return (Z, a, H), beta2

    return step


def _init(m, v0, cdt):
    n = v0.shape[0]
    Z = jnp.zeros((n, m + 1), dtype=cdt).at[:, 0].set(
        v0 / jnp.linalg.norm(v0))
    a = jnp.zeros((m + 1, m + 1, m + 1), dtype=cdt).at[0, 0, 0].set(1.0)
    H = jnp.zeros((m + 1, m), dtype=cdt)
    return (Z, a, H)


@partial(jax.jit, static_argnames=("m", "nsteps"))
def _chunk(bank, m, nsteps, k0, carry, C, gamma_id, lu, piv):
    cdt = carry[0].dtype
    step = _step_fn(bank, m, C, gamma_id, lu, piv, cdt)
    return jax.lax.scan(step, carry, k0 + jnp.arange(nsteps))[0]


@partial(jax.jit, static_argnames=("m",))
def tiar_scan_complex(bank, m, C, gamma_id, v0, lu, piv):
    """Run m complex TIAR steps; returns the final carry (Z, a, H)."""
    cdt = jnp.result_type(v0.dtype, C.dtype)
    carry = _init(m, v0.astype(cdt), cdt)
    step = _step_fn(bank, m, C, gamma_id, lu, piv, cdt)
    return jax.lax.scan(step, carry, jnp.arange(1, m + 1))[0]


def _extract(carry, k_done, n, sigma, gamma):
    Z, a, H = carry
    H_h = np.asarray(H)[:k_done, :k_done]
    D, W = np.linalg.eig(H_h)
    lams = complex(sigma) + complex(gamma) / D
    VV = np.asarray(Z)[:n, :k_done] @ np.asarray(a)[0, :k_done, :k_done].T
    Q = VV @ W
    Q = Q / np.linalg.norm(Q, axis=0, keepdims=True)
    return lams, Q


def _run(bank, m, C, id_coeff, v, lu_piv, cdt, *, sigma, gamma, neigs, tol,
         resnorm, n, check_error_every=None):
    args = (jnp.asarray(C, cdt), jnp.asarray(complex(id_coeff), cdt),
            lu_piv[0].astype(cdt), lu_piv[1])
    v0 = jnp.asarray(np.asarray(v, dtype=complex), cdt)
    t0 = time.perf_counter()
    if check_error_every and np.isfinite(tol):
        chunk = int(check_error_every)
        carry = _init(m, v0, cdt)
        k_done = 0
        while k_done < m:
            steps = min(chunk, m - k_done)
            carry = _chunk(bank, m, steps, jnp.asarray(k_done + 1), carry,
                           *args)
            k_done += steps
            lams, Q = _extract(carry, k_done, n, sigma, gamma)
            errs = np.array([resnorm(lams[s], Q[:, s])
                             for s in range(len(lams))])
            if int(np.sum(errs < tol)) >= neigs:
                break
    else:
        carry = tiar_scan_complex(bank, m, *args[:2], v0, *args[2:])
        k_done = m
        lams, Q = _extract(carry, k_done, n, sigma, gamma)
        errs = np.array([resnorm(lams[s], Q[:, s]) for s in range(len(lams))])
    t_scan = time.perf_counter() - t0
    idx = np.argsort(errs)
    nconv = int(np.sum(errs < tol)) if np.isfinite(tol) else len(errs)
    take = idx[: min(neigs, nconv)]
    info = {"t_scan": t_scan, "nconv": nconv, "k_done": k_done,
            "errs": errs[idx]}
    return lams[take], Q[:, take], info


def _complex_shift_lu(mats, fv, sigma, cdt):
    from .spmf_real import spmf_fun_scalars

    w = spmf_fun_scalars(fv, sigma)
    M0 = None
    for wi, A in zip(w, mats):
        import scipy.sparse as sp

        T = (A * wi) if sp.issparse(A) else sp.csr_matrix(np.asarray(A) * wi)
        M0 = T if M0 is None else M0 + T
    return jax.scipy.linalg.lu_factor(jnp.asarray(M0.toarray(), cdt))


def tiar_jitted(nep, sigma=0.0, gamma=1.0, maxit=30, neigs=6, tol=None,
                v=None, dtype=jnp.complex128, check_error_every=None,
                errmeasure=None, return_info=False):
    """Compiled complex TIAR on a DEP (contract of ``solvers/tiar.py``'s
    ``tiar``; the whole recurrence is one jitted scan)."""
    import scipy.sparse as sp

    from .iar_real import _dep_host_resnorm, dep_coeff_table

    n = nep.n
    m = int(maxit)
    cdt = jnp.dtype(dtype)
    if tol is None:
        tol = 1e4 * float(jnp.finfo(jnp.finfo(cdt).dtype).eps)
    sigma_c = complex(sigma)
    t0 = time.perf_counter()
    M0 = sp.coo_matrix(
        (np.full(n, -sigma_c), (np.arange(n), np.arange(n))),
        shape=(n, n)).tocsr()
    for t, A in zip(np.asarray(nep.tauv, dtype=float),
                    nep.bank.host_csr_terms()):
        M0 = M0 + np.exp(-t * sigma_c) * A
    lu_piv = jax.scipy.linalg.lu_factor(jnp.asarray(M0.toarray(), cdt))
    jax.block_until_ready(lu_piv)
    t_fact = time.perf_counter() - t0
    Cre, Cim = dep_coeff_table(nep, sigma, gamma, m)
    C = Cre + 1j * Cim
    if v is None:
        v = np.ones(n)
    rn = errmeasure if errmeasure is not None else _dep_host_resnorm(nep)
    lams, Q, info = _run(nep.bank, m, C, gamma, v, lu_piv, cdt,
                         sigma=sigma, gamma=gamma, neigs=neigs, tol=tol,
                         resnorm=rn, n=n,
                         check_error_every=check_error_every)
    info["t_factorize"] = t_fact
    if return_info:
        return lams, Q, info
    return lams, Q


def tiar_jitted_spmf(nep, sigma=0.0, gamma=1.0, maxit=30, neigs=6, tol=None,
                     v=None, dtype=jnp.complex128, check_error_every=None,
                     errmeasure=None, return_info=False):
    """Compiled complex TIAR on any SPMF (gun/WEP class) — complex128
    counterpart of ``solvers/tiar_real.tiar_real_spmf``."""
    from ..ops.mixed import make_mixed_bank
    from .spmf_real import (_spmf_host_resnorm, collect_spmf_terms,
                            spmf_coeff_table)

    mats, fv = collect_spmf_terms(nep)
    n = mats[0].shape[0]
    m = int(maxit)
    cdt = jnp.dtype(dtype)
    if tol is None:
        tol = 1e4 * float(jnp.finfo(jnp.finfo(cdt).dtype).eps)
    bank = make_mixed_bank(mats, dtype=np.float64 if cdt == jnp.complex128
                           else np.float32)
    t0 = time.perf_counter()
    lu_piv = _complex_shift_lu(mats, fv, sigma, cdt)
    jax.block_until_ready(lu_piv)
    t_fact = time.perf_counter() - t0
    Cre, Cim = spmf_coeff_table(fv, sigma, gamma, m)
    C = Cre + 1j * Cim
    if v is None:
        v = np.ones(n)
    rn = errmeasure if errmeasure is not None else _spmf_host_resnorm(mats, fv)
    lams, Q, info = _run(bank, m, C, 0.0, v, lu_piv, cdt,
                         sigma=sigma, gamma=gamma, neigs=neigs, tol=tol,
                         resnorm=rn, n=n,
                         check_error_every=check_error_every)
    info["t_factorize"] = t_fact
    if return_info:
        return lams, Q, info
    return lams, Q
