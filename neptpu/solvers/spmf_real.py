"""Complex-as-real IAR for general real-operand SPMFs — the TPU-resident
path for the gun/WEP class of problems.

The round-1 complex-as-real machinery (``solvers/iar_real.py``) was
hard-coded to DEP coefficient tables.  This module factors the split-re/im
trick into a reusable layer for ANY ``AbstractSPMF`` whose operand matrices
are real (gun: K, M, W1, W2 real sparse; the complex behaviour lives
entirely in the term functions ``i sqrt(lam)``, ``i sqrt(lam - c)``,
reference ``NLEVP_native.jl:4-18``):

* the coefficient table ``C[i, j] = gamma^j f_i^{(j)}(sigma)`` is
  precomputed on the HOST in complex128 — exactly, when the term functions
  carry closed-form derivative rules (:class:`neptpu.ops.matfun.DerivFun`),
  else via the bidiagonal matrix-function trick on the CPU backend;
* the merged real term bank (all A_i stacked; DIA when banded, aligned-CSR
  else) drives the fused Mlincomb in paired real channels — the same four
  small GEMMs + two real bank applies as the DEP path;
* the shifted solve is structure-exploiting by default: the partitioned
  SPIKE + SMW solver (:mod:`neptpu.ops.partitioned` — banded bulk in the
  row-interleaved real encoding, low-rank/arrow parts by
  Sherman-Morrison-Woodbury, explicit block inverses + iterative
  refinement on TPU); the dense real 2n x 2n block LU remains the fallback
  for bulks that are neither banded nor arrow.

The scan kernel itself is *shared* with the DEP path
(:func:`neptpu.solvers.iar_real.iar_real_scan` with the virtual identity
term disabled — here every term, including the PEP part, lives in the bank).
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mixed import make_mixed_bank
from .iar_real import run_iar_real

__all__ = [
    "term_matrices",
    "collect_spmf_terms",
    "spmf_coeff_table",
    "finite_table_prefix",
    "spmf_fun_scalars",
    "spmf_shift_block_lu",
    "iar_real_spmf",
    "iar_real_spmf_multishift",
    "iar_real_spmf_deflated",
]


def term_matrices(bank):
    """Host scipy-CSR mirrors of every term of a DIA/CSR/dense bank (no
    device->host fetch when the bank carries its construction-time host
    mirror — required on tunneled TPU runtimes)."""
    return bank.host_csr_terms()


def collect_spmf_terms(nep):
    """(scipy term matrices, fv) for any AbstractSPMF — including sums whose
    parts live in separate banks (gun = PEP + sqrt-SPMF)."""
    from ..models.spmf import AbstractSPMF

    if not isinstance(nep, AbstractSPMF) and not (
        hasattr(nep, "get_Av") and hasattr(nep, "get_fv")
    ):
        raise TypeError(f"need an SPMF-like NEP, got {type(nep).__name__}")
    fv = list(nep.get_fv())
    # walk the banks instead of densifying term views
    mats = []
    for sub in _spmf_parts(nep):
        if hasattr(sub, "tauv"):  # DEP: virtual identity term (-lam I) first
            import scipy.sparse as sp

            mats.append(sp.eye(sub.n, format="csr"))
        mats.extend(term_matrices(sub.bank))
    if len(mats) != len(fv):
        raise ValueError(
            f"collected {len(mats)} operand matrices but {len(fv)} term "
            "functions")
    return mats, fv


def _spmf_parts(nep):
    """Flatten SPMFSumNEP trees into bank-holding leaves, fv-ordered."""
    if hasattr(nep, "nep1") and hasattr(nep, "nep2"):
        return _spmf_parts(nep.nep1) + _spmf_parts(nep.nep2)
    if not hasattr(nep, "bank"):
        raise TypeError(
            f"SPMF part {type(nep).__name__} holds no term bank; the "
            "complex-as-real path needs bank-backed operands")
    return [nep]


def spmf_coeff_table(fv, sigma, gamma, m, scaled=False):
    """C[i, j] = gamma^j f_i^{(j)}(sigma), j = 0..m, column 0 zeroed (IAR
    feeds derivatives 1..m).  complex128 on the host; exact for DerivFun
    terms, CPU-backend bidiagonal trick otherwise.  ``scaled`` divides
    column j by j! — the Taylor-normalized table for the ``scaled=True``
    kernels, whose entries stay O((|gamma|/R)^j) (R = distance from sigma to
    the nearest singularity of f) instead of growing factorially.  The
    gamma-power/factorial prefactor is accumulated progressively so neither
    factor over/underflows on its own before ~order 130 at gun-scale
    gamma ~ 1e4 (the (m+1)^2 n basis memory caps maxit well before that).
    Returns (Cre, Cim)."""
    sigma = complex(sigma)
    gamma = complex(gamma)
    gj = np.ones(m + 1, dtype=complex)
    for j in range(1, m + 1):
        gj[j] = gj[j - 1] * (gamma / j if scaled else gamma)
    C = np.zeros((len(fv), m + 1), dtype=complex)
    cpu_rows = []
    for i, f in enumerate(fv):
        if hasattr(f, "derivs"):
            C[i] = f.derivs(sigma, m + 1) * gj
        else:
            cpu_rows.append(i)
    if cpu_rows:
        from ..ops.matfun import fun_derivatives

        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            lam = jnp.asarray(sigma)
            for i in cpu_rows:
                d = np.asarray(fun_derivatives(fv[i], lam, m + 1))
                C[i] = d.astype(complex) * gj
    C[:, 0] = 0.0
    return np.ascontiguousarray(C.real), np.ascontiguousarray(C.imag)


def finite_table_prefix(Cre, Cim, dtype):
    """Largest k such that columns 0..k of the coefficient table are finite
    and representable in ``dtype`` with GEMM headroom.

    Derivative tables of sqrt/exp-type terms grow like ``(gamma/R)^j j!``
    past the branch-point radius R and overflow float32 around order 40-60;
    a padded-basis GEMM then multiplies those inf columns by the zero
    padding and poisons the whole scan with ``0 * inf = NaN`` from step 1.
    Callers truncate ``maxit`` to the returned prefix (the orders a
    low-precision IAR could use are long exhausted by then anyway)."""
    colmax = np.maximum(np.abs(Cre), np.abs(Cim)).max(axis=0)
    # headroom: a scan step contracts ~m table entries against a unit basis
    cap = float(jnp.finfo(jnp.dtype(dtype)).max) / max(16 * len(colmax), 256)
    ok = np.isfinite(colmax) & (colmax <= cap)
    bad = np.nonzero(~ok)[0]
    return int(bad[0] - 1) if bad.size else int(len(colmax) - 1)


def spmf_fun_scalars(fv, lam):
    """[f_i(lam)] in complex128 on the host (assembly + residuals)."""
    vals = np.zeros(len(fv), dtype=complex)
    pend = []
    for i, f in enumerate(fv):
        if hasattr(f, "derivs"):
            vals[i] = f.derivs(complex(lam), 1)[0]
        else:
            pend.append(i)
    if pend:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            S = jnp.asarray(complex(lam)).reshape(1, 1)
            for i in pend:
                vals[i] = complex(np.asarray(fv[i](S))[0, 0])
    return vals


@partial(jax.jit, static_argnames=("two_n",))
def _block_assemble_lu(rows, cols, re, im, two_n):
    """Scatter the COO triplets of M(sigma) into the real 2n x 2n block form
    [[Re, -Im], [Im, Re]] on DEVICE and LU-factorize there.  Only the nnz
    triplets cross the host->device link (a few MB) instead of the dense
    (2n)^2 block (GBs at gun/wep scale — 146 s over a tunneled runtime)."""
    n = two_n // 2
    blk = jnp.zeros((two_n, two_n), dtype=re.dtype)
    blk = blk.at[rows, cols].add(re)
    blk = blk.at[rows, cols + n].add(-im)
    blk = blk.at[rows + n, cols].add(im)
    blk = blk.at[rows + n, cols + n].add(re)
    return jax.scipy.linalg.lu_factor(blk)


def spmf_shift_block_lu(mats, fv, sigma, dtype=jnp.float32):
    """Real 2n x 2n block LU of M(sigma) = sum_i f_i(sigma) A_i (weights and
    the sparse sum in complex128 on the host; densification, block split and
    LU on the device from the COO triplets)."""
    import scipy.sparse as sp

    w = spmf_fun_scalars(fv, sigma)
    M0 = None
    for wi, A in zip(w, mats):
        T = (A * wi) if sp.issparse(A) else sp.csr_matrix(np.asarray(A) * wi)
        M0 = T if M0 is None else M0 + T
    n = M0.shape[0]
    M0 = M0.tocoo()
    rdt = np.dtype(dtype)
    return _block_assemble_lu(
        jnp.asarray(M0.row.astype(np.int32)),
        jnp.asarray(M0.col.astype(np.int32)),
        jnp.asarray(M0.data.real.astype(rdt)),
        jnp.asarray(M0.data.imag.astype(rdt)),
        2 * n)


def _spmf_host_resnorm(mats, fv):
    def resnorm(lam, q):
        w = spmf_fun_scalars(fv, lam)
        y = np.zeros(q.shape[0], dtype=complex)
        for wi, A in zip(w, mats):
            y = y + wi * (A @ q)
        return float(np.linalg.norm(y))

    return resnorm


def iar_real_spmf(nep, sigma=0.0, gamma=1.0, maxit=30, neigs=6, tol=None,
                  v=None, dtype=jnp.float32, lu_piv=None, bank=None,
                  check_error_every=None, errmeasure=None,
                  return_info=False, scaled="auto", precision=None,
                  return_solver=False):
    """Complex-as-real IAR on a real-operand SPMF (gun-class problems).

    Same contract as :func:`neptpu.solvers.iar_real.iar_real` (including
    ``check_error_every`` early exit); ``bank`` optionally reuses a prebuilt
    merged real term bank.
    """
    mats, fv = collect_spmf_terms(nep)
    n = mats[0].shape[0]
    m = int(maxit)
    dt = jnp.dtype(dtype)
    if tol is None:
        tol = 1e4 * float(jnp.finfo(dt).eps)
    if bank is None:
        # complex operands are fine when their imaginary parts are low-rank
        # (WEP boundary terms); bulk-complex operands raise in the builder
        bank = make_mixed_bank(mats, dtype=np.dtype(dt))

    t0 = time.perf_counter()
    if lu_piv is None:
        # structure-exploiting shifted solve first: partitioned banded
        # (SPIKE, batched GEMM hot path) + SMW low-rank correction —
        # O(n blk^2) factor instead of the dense (2n)^3 block LU
        from ..ops.partitioned import build_spmf_shift_solver

        lu_piv = build_spmf_shift_solver(mats, fv, sigma, dtype=dt)
        if lu_piv is None:  # bulk neither banded nor arrow: dense block LU
            lu_piv = spmf_shift_block_lu(mats, fv, sigma, dtype=dt)
        jax.block_until_ready(jax.tree_util.tree_leaves(lu_piv))
    t_fact = time.perf_counter() - t0

    # 'auto': classic Taylor space unless its table overflows ``dt`` before
    # ``maxit`` — then the theta-scaled space (see iar_real._step_fn)
    if scaled == "auto":
        Cre, Cim = spmf_coeff_table(fv, sigma, gamma, m, scaled=False)
        scaled = finite_table_prefix(Cre, Cim, dt) < m
    else:
        scaled = bool(scaled)
    Cre, Cim = spmf_coeff_table(fv, sigma, gamma, m, scaled=scaled)
    theta = 1.0
    if scaled:
        from .iar_real import apply_theta, auto_theta

        theta = auto_theta(Cre, Cim, m, dt)
        Cre, Cim = apply_theta(Cre, Cim, theta)
    m_fin = finite_table_prefix(Cre, Cim, dt)
    if m_fin < m:
        import warnings

        warnings.warn(
            f"coefficient table overflows {np.dtype(dt)} past derivative "
            f"order {m_fin}; truncating maxit {m} -> {m_fin}")
        m = m_fin
        Cre, Cim = Cre[:, : m + 1], Cim[:, : m + 1]
    if v is None:
        v = np.ones(n)

    rn = errmeasure if errmeasure is not None else _spmf_host_resnorm(mats, fv)
    lams, Q, info = run_iar_real(
        bank, m, Cre, Cim, 0.0, v, lu_piv, dt,  # no virtual -lam*I term
        sigma=sigma, gamma=gamma, neigs=neigs, tol=tol, resnorm=rn, n=n,
        check_error_every=check_error_every, scaled=scaled, theta=theta,
        precision=precision)
    info["t_factorize"] = t_fact
    if return_solver:
        # opt-in: the live factorization pins GBs of HBM at gun/WEP scale,
        # so callers must ask for it (resinv_refine reuse) explicitly
        info["solver"] = lu_piv
    if return_info:
        return lams, Q, info
    return lams, Q


def iar_real_spmf_multishift(nep, sigmas, gamma=1.0, maxit=30, neigs=6,
                             tol=None, dtype=jnp.float32,
                             check_error_every=None, errmeasure=None,
                             precision=None, dedupe_rel=1e-7,
                             return_info=False):
    """Complex-as-real IAR from SEVERAL shifts, merged and deduplicated.

    One Krylov run yields only the handful of well-separated eigenvalues
    near its shift (the reference's own wep oracle converges 3 pairs in
    100 iterations, ``test/wep_small.jl``); covering a spectral region
    needs several shifts.  The term bank is built ONCE and shared; every
    per-shift run reuses the same compiled scan programs (identical
    shapes — only the factorization and coefficient-table VALUES change),
    so each extra shift costs one shifted factorization plus one scan.

    Returns ``(lams, Q[, info])`` over the union of converged pairs, best
    residual first, pairs within ``dedupe_rel`` relative distance merged.
    """
    mats, fv = collect_spmf_terms(nep)
    dt = jnp.dtype(dtype)
    bank = make_mixed_bank(mats, dtype=np.dtype(dt))
    meas = errmeasure if errmeasure is not None else _spmf_host_resnorm(
        mats, fv)
    all_l, all_q, infos = [], [], []
    for s in sigmas:
        lams, Q, info = iar_real_spmf(
            nep, sigma=s, gamma=gamma, maxit=maxit, neigs=neigs, tol=tol,
            dtype=dt, bank=bank, check_error_every=check_error_every,
            errmeasure=errmeasure, precision=precision, return_info=True)
        info.pop("solver", None)
        infos.append(info)
        for j in range(len(np.asarray(lams))):
            all_l.append(complex(np.asarray(lams)[j]))
            all_q.append(np.asarray(Q[:, j]))
    if not all_l:
        out = (np.zeros(0, complex), np.zeros((nep.n, 0), complex))
        return out + ({"per_shift": infos},) if return_info else out
    errs = np.array([meas(la, q) for la, q in zip(all_l, all_q)])
    order = np.argsort(errs)
    sel = []
    for j in order:
        la = all_l[j]
        if all(abs(la - all_l[i]) > dedupe_rel * max(1.0, abs(la))
               for i in sel):
            sel.append(j)
    lams = np.array([all_l[j] for j in sel])
    Q = np.stack([all_q[j] for j in sel], axis=1)
    if return_info:
        return lams, Q, {"per_shift": infos, "errs": errs[sel]}
    return lams, Q


def iar_real_spmf_deflated(nep, sigma=0.0, gamma=1.0, maxit=30, neigs=6,
                           tol=None, restarts=None, v=None,
                           dtype=jnp.float32, check_error_every=None,
                           errmeasure=None, return_info=False, seed=0):
    """Restarted complex-as-real IAR with Effenberger deflation — the
    compiled-kernel never-reconverge loop (reference ``nep_deflation.jl:
    369-425`` + ``method_jd.jl`` restart pattern, recast for the TPU scan).

    Each sweep runs :func:`iar_real_spmf`'s scan in the theta-scaled space
    extended by the current invariant pair (X, S) via
    :class:`~neptpu.solvers.iar_real.DeflationOps` — the deflation rides
    INSIDE the compiled ``lax.scan`` (bank contraction on ``v' = v + X t``,
    bordered solve reusing the one shifted factorization).  Converged new
    pairs augment (X, S); converged pairs can never reconverge, so a small
    ``maxit`` per sweep bounds basis memory while the total converged count
    grows across sweeps.  Returns original-problem eigenpairs from the
    invariant pair (``eig(S)``; ``Q = X Z`` columns normalized).
    """
    from .iar_real import DeflationOps, auto_theta, apply_theta, run_iar_real
    from ..models.deflation import normalize_schur_pair

    mats, fv = collect_spmf_terms(nep)
    n = mats[0].shape[0]
    m = int(maxit)
    dt = jnp.dtype(dtype)
    if tol is None:
        tol = 1e4 * float(jnp.finfo(dt).eps)
    if restarts is None:
        restarts = int(neigs) + 2
    bank = make_mixed_bank(mats, dtype=np.dtype(dt))

    t0 = time.perf_counter()
    from ..ops.partitioned import build_spmf_shift_solver

    solver = build_spmf_shift_solver(mats, fv, sigma, dtype=dt)
    if solver is None:
        solver = spmf_shift_block_lu(mats, fv, sigma, dtype=dt)
    jax.block_until_ready(jax.tree_util.tree_leaves(solver))
    t_fact = time.perf_counter() - t0

    # the deflated scan runs in the theta-scaled Taylor space only
    Cre, Cim = spmf_coeff_table(fv, sigma, gamma, m, scaled=True)
    theta = auto_theta(Cre, Cim, m, dt)
    Cre, Cim = apply_theta(Cre, Cim, theta)
    m_fin = finite_table_prefix(Cre, Cim, dt)
    if m_fin < m:
        m = m_fin
        Cre, Cim = Cre[:, : m + 1], Cim[:, : m + 1]
    # the extension folds w-block content into v'_0 = X t_0, whose j=0 term
    # M(sigma) X t_0 must NOT be dropped: restore column 0 to f_i(sigma)
    # (harmless without deflation — the pre-solve block 0 is exactly zero)
    f0 = spmf_fun_scalars(fv, sigma)
    Cre[:, 0], Cim[:, 0] = f0.real, f0.imag

    fro = np.array([np.sqrt(np.abs(A.multiply(A.conj())).sum())
                    for A in mats])
    rn0 = _spmf_host_resnorm(mats, fv)

    def backward(lam, u):
        scale = float(np.abs(spmf_fun_scalars(fv, lam)) @ fro)
        return rn0(lam, u) / scale

    meas = errmeasure if errmeasure is not None else backward

    rng = np.random.default_rng(seed)
    X = np.zeros((n, 0), dtype=complex)
    S = np.zeros((0, 0), dtype=complex)
    sweeps = []
    found = []  # (lam, recovered original eigvec) captured at convergence
    t_scan = 0.0
    for sweep in range(int(restarts)):
        p = X.shape[1]
        if p >= neigs:
            break
        defl = None if p == 0 else DeflationOps.build(
            X, S, sigma, gamma * theta, m, dt)

        def rn_ext(lam, q, p=p, X=X, S=S):
            # original-problem backward error of the recovered eigvec
            # u = v + X (lam I - S)^{-1} w  (Effenberger recovery)
            if p == 0:
                u = q
            else:
                w = np.linalg.solve(
                    complex(lam) * np.eye(p) - S, np.asarray(q[n:]))
                u = np.asarray(q[:n]) + X @ w
            nu = np.linalg.norm(u)
            return meas(lam, u / nu) if nu > 0 else np.inf

        if v is not None and p == 0:
            v0 = np.asarray(v, dtype=complex)
            v0 = np.concatenate([v0, np.zeros(p)])
        else:
            v0 = (rng.standard_normal(n + p)
                  + 1j * rng.standard_normal(n + p))
        lams, Q, info = run_iar_real(
            bank, m, Cre, Cim, 0.0, v0, solver, dt,
            sigma=sigma, gamma=gamma, neigs=neigs - p, tol=tol,
            resnorm=rn_ext, n=n + p,
            check_error_every=check_error_every, scaled=True, theta=theta,
            defl=defl)
        t_scan += info["t_scan"]
        sweeps.append(info["nconv"])
        if info["nconv"] == 0:
            continue  # fresh random start next sweep
        # multi-augment the invariant pair with this sweep's converged new
        # pairs: V1 = [X, v_j...], S1 = [[S, w_j...], [0, diag(lam_j)]]
        eigS = np.linalg.eigvals(S) if p else np.array([])
        newV, newW, newL = [], [], []
        for j in range(len(lams)):
            la = complex(lams[j])
            if eigS.size and np.min(np.abs(la - eigS)) < 1e-8 * max(
                    1.0, abs(la)):
                continue  # numerically duplicate (should not happen)
            if newL and np.min(np.abs(la - np.asarray(newL))) < 1e-8 * max(
                    1.0, abs(la)):
                continue
            newV.append(np.asarray(Q[:n, j]))
            newW.append(np.asarray(Q[n:, j]) if p else np.zeros(0))
            newL.append(la)
            # capture the recovered original-problem eigvec NOW (the final
            # eig(S)-based extraction can lose digits to the invariant
            # pair's conditioning)
            if p:
                wj = np.linalg.solve(la * np.eye(p) - S, newW[-1])
                uj = newV[-1] + X @ wj
            else:
                uj = newV[-1]
            found.append((la, uj / np.linalg.norm(uj)))
        if not newL:
            continue
        k = len(newL)
        V1 = np.concatenate([X] + [vv[:, None] for vv in newV], axis=1)
        S1 = np.zeros((p + k, p + k), dtype=complex)
        S1[:p, :p] = S
        for j in range(k):
            S1[:p, p + j] = newW[j]
            S1[p + j, p + j] = newL[j]
        S, X = normalize_schur_pair(S1, V1)

    # eigenpairs as captured at convergence time, residual-sorted
    if found:
        D = np.array([la for la, _ in found])
        Q = np.stack([u for _, u in found], axis=1)
        order = np.argsort([meas(D[j], Q[:, j]) for j in range(len(D))])
        D, Q = D[order], Q[:, order]
    else:
        D = np.zeros(0, dtype=complex)
        Q = np.zeros((n, 0), dtype=complex)
    info = {"t_factorize": t_fact, "t_scan": t_scan, "theta": theta,
            "sweeps": sweeps, "nconv": int(len(D)), "m_per_sweep": m}
    if return_info:
        return D, Q, info
    return D, Q
