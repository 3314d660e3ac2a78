"""Eigenpair refinement: residual inverse iteration against the frozen
chip factorization — reference ``method_resinv.jl`` recast as a POLISHER.

The f32 chip paths (``solvers/spmf_real.py``) converge to backward errors
around the f32 floor (~1e-6).  The reference's oracles live at
1e-10/1e-11-class residuals; this module closes the gap without any new
factorization:

* residuals and eigenvalue updates run on the HOST in complex128 (cheap —
  one sparse SpMV per pair per sweep);
* the vector correction solves run on the CHIP through the ALREADY-BUILT
  shifted solver at ``sigma`` (``InterleavedSMW`` / ``DenseBlockLU``
  ``solve_pair``), all pairs batched into one (n, k) block solve per sweep.

Convergence is the classic residual-inverse-iteration rate (Neumaier '85):
linear with factor ~ how well M(sigma) approximates M(lam_j) — and because
the chip solve's f32 inexactness multiplies the CORRECTION (not the
iterate), the attainable floor is set by the f64 host residual, not by the
chip dtype.  Typical: 1e-6 -> 1e-10+ in 2-4 sweeps on the gun/WEP class.
"""
from __future__ import annotations

import numpy as np

__all__ = ["spmf_fun_derivs", "resinv_refine"]


def _solve_pair_jit(solver, zre, zim):
    import jax

    if not hasattr(_solve_pair_jit, "_fn"):
        _solve_pair_jit._fn = jax.jit(lambda s, a, b: s.solve_pair(a, b))
    return _solve_pair_jit._fn(solver, zre, zim)


def spmf_fun_derivs(fv, lam, k=2):
    """D[i, j] = f_i^{(j)}(lam), j = 0..k-1, complex128 on the host."""
    lam = complex(lam)
    D = np.zeros((len(fv), k), dtype=complex)
    pend = []
    for i, f in enumerate(fv):
        if hasattr(f, "derivs"):
            D[i] = f.derivs(lam, k)
        else:
            pend.append(i)
    if pend:
        import jax

        from ..ops.matfun import fun_derivatives

        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            for i in pend:
                D[i] = np.asarray(fun_derivatives(fv[i], lam, k))
    return D


class _TermOps:
    """Batched host-side SPMF residual machinery for the refinement sweeps.

    The naive per-pair form costs nt SpMVs per pair per quantity (the WEP
    carries 213 terms — tens of thousands of scipy calls per sweep); this
    stacks all terms into ONE tall CSR so each sweep pays a single
    C-level SpMM ``A_all @ Q`` -> (nt, n, k), then contracts against
    per-pair derivative weights with one einsum."""

    def __init__(self, csr, fv):
        import scipy.sparse as sp

        self.fv = fv
        self.nt = len(csr)
        self.n = csr[0].shape[0]
        self.A_all = sp.vstack(csr, format="csr")

    def weights(self, lams, nder=1):
        """W[i, d, j] = f_i^{(d)}(lams[j]) — complex128 (nt, nder, k)."""
        W = np.empty((self.nt, nder, len(lams)), dtype=complex)
        for j, la in enumerate(lams):
            W[:, :, j] = spmf_fun_derivs(self.fv, la, nder)
        return W

    def apply(self, Q):
        """(nt, n, k) stack of per-term products A_i @ Q, one SpMM."""
        return np.asarray(self.A_all @ Q).reshape(self.nt, self.n, -1)

    @staticmethod
    def contract(T, w):
        """sum_i w[i, j] * T[i, :, j] -> (n, k)."""
        return np.einsum("tnk,tk->nk", T, w)


def _refine_batch_limit(plan, p=8, budget_bytes=6.0e9):
    """Largest shift-batch whose solver state fits the HBM budget.

    Per-shift footprint of :class:`BatchedShiftSMW` (ir mode): f32 block
    inverses + reduced inverse, f64 block-tridiag matvec form, f64 HALF
    SMW operands (Xh, Lh, Uh — R columns each, the rot_i commutation
    halving)."""
    n2 = 2 * plan.n
    b2 = 2 * max(plan.b, 1) + 1
    blk = -(-n2 // p)
    rank = sum(L.shape[1] for _, L, _ in plan.lr) + 2 * plan.m
    Rh = max(rank, 1)
    per = (4 * (p * blk * blk + (2 * b2 * p) ** 2)      # fac + reduced
           + 8 * 3 * n2 * b2                            # D64/B64/C64
           + 8 * 3 * n2 * Rh                            # X64h, Lh64, Uh64
           + 12 * n2 * b2)                              # strips (f32 + f64)
    return max(1, int(budget_bytes // per))


def newton_refine(mats, fv, lams, Q, *, nsweeps=2, tol=None,
                  errmeasure=None, dtype=None, p=16, bsolver=None,
                  plan=None, ir=0, shift_rel=1e-8, return_solver=False,
                  max_batch=None, backend="chip", target_distinct=None,
                  _second_pass=False):
    """Per-pair nonlinear inverse iteration against a BATCHED per-shift
    factorization — reference-class floors (1e-10+) from f32 chip solves.

    All converged shifts are factored in ONE vmapped partitioned program
    (:class:`neptpu.ops.partitioned.BatchedShiftSMW`); each sweep then runs
    the Guettel--Tisseur nonlinear inverse iteration ``v <- M(lam_j^0)^{-1}
    M'(lam_j) v`` (one batched chip dispatch for all pairs) with the
    Rayleigh-functional eigenvalue update and residuals in complex128 on
    the host.  The frozen-at-lam0 Jacobian contracts by ~|lam - lam0|/gap
    per sweep, so 1-2 sweeps reach the f64 residual floor from a 1e-6
    start.  Solve inexactness multiplies the CORRECTION, not the iterate —
    the f32 chip dtype does not cap the attainable backward error.
    """
    import jax.numpy as jnp

    from ..ops.partitioned import BatchedShiftSMW

    lams = np.array(lams, dtype=complex, copy=True)
    Q = np.array(Q, dtype=complex, copy=True)
    k = len(lams)
    if k == 0:
        return (lams, Q, np.zeros(0)) + ((None,) if return_solver else ())
    if backend not in ("chip", "host", "auto"):
        raise ValueError(f"backend must be chip|host|auto, got {backend!r}")
    # ONE partition count for both the HBM budget and the solver itself —
    # the budget's reduced-system term scales as p^2, so budgeting at a
    # smaller p than the allocation would defeat the chunking
    p = min(int(p), 8)
    n = Q.shape[0]
    csr = [A.tocsr() for A in mats]
    if dtype is None:
        dtype = jnp.float32
    if backend == "host":
        # host sweeps are cheap (k SpMVs + triangular solves); weakly
        # converged Ritz pairs need several frozen-shift contractions
        nsweeps = max(int(nsweeps), 6)
    if backend == "auto":
        from ..ops.partitioned import ShiftPlan

        if plan is None:
            plan = ShiftPlan(mats, fv)
        # Measured crossover (TPU v5e via tunnel, benchmarks/profile_refine
        # .py): at gun scale (n=9956, R=84) host splu + batched sweeps run
        # 12 shifts in ~1.2 s vs ~16 s for the chip batch; at WEP scale
        # (n=11655, R=420) ~11 s vs ~66 s — the per-shift chip
        # factorization pays R-column f64-IR solves plus ~85 MB/s tunnel
        # transfers, while SuperLU factors the banded+border pattern in
        # ~0.1-1.5 s/shift.  The chip batch wins only where a host sparse
        # LU stops being tractable (n past ~10^5, or no host fallback);
        # until then auto = host.
        backend = "chip" if (plan.ok and 2 * plan.n > 2e5) else "host"
    # memory-aware chunking: at WEP scale each shift's solver state is
    # ~1 GB of HBM; process the pairs in batches that fit, each batch with
    # its OWN factorization (built, used for all sweeps, freed)
    if backend == "chip" and bsolver is None and not _second_pass:
        from ..ops.partitioned import ShiftPlan

        if plan is None:
            plan = ShiftPlan(mats, fv)
        if max_batch is None:
            from ..ops.partitioned import BATCH_SIZES

            # largest CANONICAL size within the HBM budget: chunk sizes
            # are padded to canonical program shapes (compile-cache reuse),
            # so the padded size must be what fits
            lim = _refine_batch_limit(plan, p=p)
            fits = [c for c in BATCH_SIZES if c <= lim]
            max_batch = fits[-1] if fits else lim
        if k > max_batch:
            import gc

            # even chunk sizes (5+5, not 9+1): fewer distinct batch shapes
            # means fewer compiled program variants
            nchunks = -(-k // max_batch)
            max_batch = -(-k // nchunks)
            errs = np.zeros(k)
            for s0 in range(0, k, max_batch):
                sl = slice(s0, min(s0 + max_batch, k))
                lams[sl], Q[:, sl], errs[sl] = newton_refine(
                    mats, fv, lams[sl], Q[:, sl], nsweeps=nsweeps, tol=tol,
                    errmeasure=errmeasure, dtype=dtype, p=p, plan=plan,
                    ir=ir, shift_rel=shift_rel, max_batch=max_batch)
                gc.collect()
            if return_solver:
                return lams, Q, errs, None
            return lams, Q, errs
    sig_f = lams + 1j * shift_rel * np.maximum(np.abs(lams), 1.0)
    if backend == "host":
        # exact scipy splu per shift — the reference's own per-eigenvalue
        # UMFPACK pattern (method_resinv.jl); at banded+low-rank sparsity a
        # factorization costs ~0.1-1.5 s, amortized over all sweeps
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        # aligned banks give every term an identical pattern: the weighted
        # sum is then ONE (nt,) @ (nt, nnz) GEMV instead of nt CSR adds
        A0 = csr[0]
        aligned = all(
            A.nnz == A0.nnz and np.array_equal(A.indices, A0.indices)
            and np.array_equal(A.indptr, A0.indptr) for A in csr[1:])
        if aligned:
            Dstack = np.stack([A.data.astype(complex) for A in csr])

        fallback = {}
        for j in range(k):
            w = spmf_fun_derivs(fv, sig_f[j], 1)[:, 0]
            if aligned:
                M = sp.csr_matrix((w @ Dstack, A0.indices, A0.indptr),
                                  shape=A0.shape)
            else:
                M = None
                for wi, A in zip(w, csr):
                    T = A.astype(complex) * wi
                    M = T if M is None else M + T
            fallback[j] = spla.splu(M.tocsc())
        bsolver = _HostBatchSolver(fallback, n)
    elif bsolver is None:
        # factor at OFFSET shifts: an eigenvalue-accurate shift makes
        # M(lam_j) singular to ~the backward error, and the f32-correction
        # IR diverges once kappa*eps_f32 > 1.  A relative offset of
        # ``shift_rel`` bounds kappa at ~1/shift_rel while the per-sweep
        # contraction (offset/gap) stays tiny.
        bsolver = BatchedShiftSMW(mats, fv, sig_f, dtype=dtype, p=p,
                                  plan=plan, ir=ir, pad_to_canonical=True)
    if backend == "host":
        pass  # every pair already routed through its exact splu
    else:
        # validate every shift's solve with one random probe (host f64
        # residual): the mixed-precision SPIKE+SMW chain can still lose a
        # shift whose BANDED bulk alone is near-singular (kappa(B(sigma))
        # past the f32-seeded IR radius); those shifts fall back to a host
        # splu — exact, and cheap for banded+low-rank sparsity
        fallback = _validate_shifts(csr, fv, sig_f, bsolver)

    ops = _TermOps(csr, fv)
    # an errmeasure callable may carry a BATCHED form under ``.batch``
    # (lams_vec, Q_block) -> errs_vec; without one, scalar calls loop
    err_batch = getattr(errmeasure, "batch", None)

    def meas_vec(lams_v, Qm):
        """Backward errors for a batch of pairs (columns of Qm)."""
        if err_batch is not None:
            return np.asarray(err_batch(lams_v, Qm), dtype=float)
        if errmeasure is not None:
            return np.array([float(errmeasure(lams_v[j], Qm[:, j]))
                             for j in range(len(lams_v))])
        T = ops.apply(Qm)
        W = ops.weights(lams_v, 1)
        return np.linalg.norm(ops.contract(T, W[:, 0]), axis=0)

    errs = meas_vec(lams, Q)
    for _ in range(int(nsweeps)):
        if tol is not None and np.all(errs < tol):
            break
        T = ops.apply(Q)                       # (nt, n, k), one SpMM
        W = ops.weights(lams, 2)
        Mq = ops.contract(T, W[:, 0])
        Mpq = ops.contract(T, W[:, 1])
        # least-squares eigenvalue update lam = argmin ||M(lam) q||:
        # never overshoots (the one-sided Rayleigh step's error is
        # O(resnorm) with a right vector only, which stalls the
        # iteration at small residuals)
        denom = np.einsum("nk,nk->k", np.conj(Mpq), Mpq).real
        num = np.einsum("nk,nk->k", np.conj(Mpq), Mq)
        step = np.where(denom > 0, num / np.where(denom > 0, denom, 1.0), 0)
        cand = lams - step
        # inverse-iteration RHS at the UPDATED eigenvalues: M'(cand) q
        Wc = ops.weights(cand, 2)
        R = ops.contract(T, Wc[:, 1])
        yre, yim = bsolver.solve_pairs(R.real, R.imag)
        Y = np.asarray(yre, dtype=np.float64) \
            + 1j * np.asarray(yim, dtype=np.float64)
        for j, lu in fallback.items():
            Y[:, j] = lu.solve(R[:, j])
        newQ = Y / np.linalg.norm(Y, axis=0, keepdims=True)
        # accept the first improving combo of (new lam, new q) /
        # (old lam, new q) / (new lam, old q), per pair; never worse.
        # Each combo is measured BATCHED, later combos only on the pairs
        # the earlier ones did not improve.
        pend = np.arange(k)
        for li, Qi in ((cand, newQ), (lams.copy(), newQ), (cand, Q.copy())):
            if not len(pend):
                break
            e = meas_vec(li[pend], Qi[:, pend])
            hit = e < errs[pend]
            idx = pend[hit]
            lams[idx] = li[idx]
            Q[:, idx] = Qi[:, idx]
            errs[idx] = e[hit]
            pend = pend[~hit]
    # stragglers (a pair whose first-pass shift was too far off — a poorly
    # converged Ritz value can sit a whole gap away from the eigenvalue it
    # belongs to) get up to two more passes, each with a FRESH
    # factorization at the now-much-better eigenvalue estimates — the
    # refactor restores the tiny offset/gap contraction
    def _distinct_done():
        """``target_distinct`` DISTINCT pairs already below tol: stragglers
        are duplicate-cluster losers, not missing eigenvalues — stop."""
        if target_distinct is None:
            return False
        good = np.nonzero(errs < tol)[0]
        sel = []
        for j in good[np.argsort(errs[good])]:
            if all(abs(lams[j] - lams[i]) > 1e-7 * max(1.0, abs(lams[j]))
                   for i in sel):
                sel.append(j)
        return len(sel) >= int(target_distinct)

    passes = 0
    max_passes = 4 if backend == "host" else 2  # host refactors are cheap
    while (tol is not None and not _second_pass and passes < max_passes
           and np.any(errs >= tol) and not _distinct_done()):
        bad = np.nonzero(errs >= tol)[0]
        lb, Qb, eb = newton_refine(
            mats, fv, lams[bad], Q[:, bad], nsweeps=nsweeps, tol=tol,
            errmeasure=errmeasure, dtype=dtype, p=p, plan=plan, ir=ir,
            shift_rel=shift_rel, backend=backend, _second_pass=True)
        improved = False
        for t, j in enumerate(bad):
            if eb[t] < errs[j]:
                lams[j], Q[:, j], errs[j] = lb[t], Qb[:, t], eb[t]
                improved = True
        passes += 1
        if not improved:
            break
    if return_solver:
        return lams, Q, errs, bsolver
    return lams, Q, errs


class _HostBatchSolver:
    """backend='host' stand-in: every pair is solved by its splu in the
    fallback dict; the chip call returns zeros that are overwritten."""

    def __init__(self, fallback, n):
        self.n = n

    def solve_pairs(self, Rre, Rim):
        z = np.zeros_like(np.asarray(Rre, dtype=np.float64))
        return z, z


def _validate_shifts(csr, fv, sig_f, bsolver, rel_tol=1e-6, seed=123):
    """One random-probe solve per shift; shifts whose host-f64 residual
    exceeds ``rel_tol`` get a scipy splu fallback (dict: index -> splu)."""
    import scipy.sparse.linalg as spla

    n = csr[0].shape[0]
    k = len(sig_f)
    rng = np.random.default_rng(seed)
    probe = rng.standard_normal((n, k))
    yre, yim = bsolver.solve_pairs(probe, np.zeros_like(probe))
    Y = np.asarray(yre, dtype=np.float64) \
        + 1j * np.asarray(yim, dtype=np.float64)
    ops = _TermOps(csr, fv)
    W = ops.weights(sig_f, 1)[:, 0]          # (nt, k)
    My = ops.contract(ops.apply(Y), W)       # batched residual matvecs
    rel = np.linalg.norm(My - probe, axis=0) / np.linalg.norm(probe, axis=0)
    fallback = {}
    for j in np.nonzero(~np.isfinite(rel) | (rel > rel_tol))[0]:
        M = None
        for wi, A in zip(W[:, j], csr):
            T = A.astype(complex) * wi
            M = T if M is None else M + T
        fallback[int(j)] = spla.splu(M.tocsc())
    return fallback


def resinv_refine(mats, fv, solver, lams, Q, *, nsweeps=3, tol=None,
                  errmeasure=None):
    """Polish eigenpairs ``(lams[j], Q[:, j])`` by residual inverse iteration.

    ``solver``: a ``solve_pair`` object factored at the IAR shift sigma
    (reused — no new factorization).  ``errmeasure(lam, q)`` drives the
    optional early exit at ``tol`` and the returned error vector.

    Returns ``(lams, Q, errs)`` with unit columns; pairs that fail to
    improve keep their best-so-far iterate (a diverging correction is
    rejected, so refinement never makes a pair worse).

    Frozen-shift residual inverse iteration amplifies the sigma-CLOSEST
    eigendirections in every other pair's correction (shift-invert power
    dynamics), so each correction is projected out of the span of the
    current converged set before it is applied — the divergent directions
    are exactly the ones the set already contains.  The attainable floor is
    then set by cross-contamination INSIDE the span (~1e-9 backward on the
    gun/WEP class); for reference-class 1e-10+ floors use
    :func:`newton_refine` with a batched per-shift factorization.
    """
    import jax.numpy as jnp

    from .iar_real import as_pair_solver

    solver = as_pair_solver(solver)
    lams = np.array(lams, dtype=complex, copy=True)
    Q = np.array(Q, dtype=complex, copy=True)
    k = len(lams)
    if k == 0:
        return lams, Q, np.zeros(0)
    n = Q.shape[0]
    csr = [A.tocsr() for A in mats]

    def meas(lam, q):
        if errmeasure is not None:
            return float(errmeasure(lam, q))
        y = np.zeros(n, dtype=complex)
        D = spmf_fun_derivs(fv, lam, 1)[:, 0]
        for wi, A in zip(D, csr):
            y = y + wi * (A @ q)
        return float(np.linalg.norm(y))

    errs = np.array([meas(lams[j], Q[:, j]) for j in range(k)])
    dt = solver.X.dtype if getattr(solver, "X", None) is not None else (
        solver.strips.dtype if hasattr(solver, "strips") else jnp.float32)

    for _ in range(int(nsweeps)):
        if tol is not None and np.all(errs < tol):
            break
        # eigenvalue update + residual, all pairs, host complex128
        R = np.zeros((n, k), dtype=complex)
        cand = lams.copy()
        for j in range(k):
            D = spmf_fun_derivs(fv, lams[j], 2)
            Mq = np.zeros(n, dtype=complex)
            Mpq = np.zeros(n, dtype=complex)
            for i, A in enumerate(csr):
                Aq = A @ Q[:, j]
                Mq += D[i, 0] * Aq
                Mpq += D[i, 1] * Aq
            # one-dim Newton on u^H M(lam) q with u = q (Rayleigh functional)
            denom = np.vdot(Q[:, j], Mpq)
            if denom != 0:
                dlam = np.vdot(Q[:, j], Mq) / denom
                cand[j] = lams[j] - dlam
                # residual at the UPDATED eigenvalue
                Dn = spmf_fun_derivs(fv, cand[j], 1)[:, 0]
                Mq = np.zeros(n, dtype=complex)
                for i, A in enumerate(csr):
                    Mq += Dn[i] * (A @ Q[:, j])
            R[:, j] = Mq
        # chip correction: dq = M(sigma)^{-1} r, batched over pairs, one
        # jitted dispatch (rides the persistent compile cache)
        dre, dim_ = _solve_pair_jit(
            solver, jnp.asarray(R.real, dtype=dt),
            jnp.asarray(R.imag, dtype=dt))
        dq = np.asarray(dre, dtype=np.float64) \
            + 1j * np.asarray(dim_, dtype=np.float64)
        # project the correction out of the converged subspace (see
        # docstring: keeps the sigma-closest divergent directions out of
        # every pair's update)
        Uo, _ = np.linalg.qr(Q)
        dq = dq - Uo @ (Uo.conj().T @ dq)
        newQ = Q - dq
        newQ = newQ / np.linalg.norm(newQ, axis=0, keepdims=True)
        for j in range(k):
            e = meas(cand[j], newQ[:, j])
            if e < errs[j]:  # accept lam and q together, else keep both
                lams[j] = cand[j]
                Q[:, j] = newQ[:, j]
                errs[j] = e
    return lams, Q, errs
