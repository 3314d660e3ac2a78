"""Solver-level north-star benchmark: time-to-tolerance for k=10 eigenpairs
on a gun-scale banded DEP, on real TPU hardware.

BASELINE.json north star #2: "time-to-tol for k=10 eigenpairs" at reference
test tolerances.  The problem is the gallery's ``dep_symm_double`` (2D
kron-Laplacian DEP, reference ``gallery_examples.jl:15-30``) at n = nside^2
~ 1e4 — the same scale as gun (n = 9956).  The solve is the complex-as-real
compiled IAR (``neptpu.solvers.iar_real``): one real 2n x 2n block LU of
M(sigma) (the reference's cached UMFPACK factorization role) + an m-step
``lax.scan`` whose hot op is the fused multi-term SpMV.

Convergence is counted in BACKWARD error (reference DefaultErrmeasure ->
StandardSPMFErrmeasure, ``src/errmeasure.jl:174-191``):
    eta(lam, v) = ||M(lam) v|| / (|f0(lam)| ||A0||_F + |f1(lam)| ||A1||_F
                                  + |lam| sqrt(n))
with unit-norm v.  Default tolerance 1e-6 (f32 backward error floors near
3e-9 on this problem, f64 near 1e-17 — see tests/test_iar_real.py probes).

Usage:  python benchmarks/time_to_tol.py [--nside 100] [--maxit 60]
                                         [--tol 1e-6] [--k 10] [--json out]
Prints one JSON line with the time-to-tol and phase breakdown.
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault("NEPTPU_DISABLE_X64", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_problem(nside):
    import scipy.sparse as sp

    from neptpu import DEP, nep_gallery
    from neptpu.ops.dia import DiaTermBank

    nep0 = nep_gallery("dep_symm_double", nside)
    mats = []
    for i in range(nep0.bank.nterms):
        t = nep0.bank.term(i)
        A = t.to_scipy() if hasattr(t, "to_scipy") else np.asarray(t.to_dense())
        mats.append(sp.csr_matrix(A))
    bank = DiaTermBank.from_matrices(mats, dtype=np.float32)
    nep = DEP(None, tauv=np.asarray(nep0.tauv), bank=bank)
    fro = [float(np.sqrt((m.multiply(m.conj())).sum()).real) for m in mats]
    return nep, fro


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nside", type=int, default=100)
    ap.add_argument("--maxit", type=int, default=60)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--sigma", type=float, default=-1.0)
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    import jax.numpy as jnp

    from neptpu.solvers.iar_real import _dep_host_resnorm, iar_real

    nep, fro = build_problem(args.nside)
    n = nep.n
    taus = [float(t) for t in np.asarray(nep.tauv)]

    t_all0 = time.perf_counter()
    lams, Q, info = iar_real(nep, sigma=args.sigma, maxit=args.maxit,
                             neigs=args.maxit, tol=np.inf,
                             dtype=jnp.float32, return_info=True)
    rn = _dep_host_resnorm(nep)

    def backward_scale(lam):
        s = abs(lam) * np.sqrt(n)
        for t, f in zip(taus, fro):
            s += abs(np.exp(-t * lam)) * f
        return s

    errs = np.array([rn(l, Q[:, i]) / backward_scale(l)
                     for i, l in enumerate(lams)])
    t_total = time.perf_counter() - t_all0

    order = np.argsort(errs)
    nconv = int(np.sum(errs < args.tol))
    result = {
        "metric": f"time_to_tol_k{args.k}_dep_symm_double_n{n}",
        "value": round(t_total, 4),
        "unit": "s",
        "converged": nconv,
        "k_target": args.k,
        "tol_backward": args.tol,
        "met": bool(nconv >= args.k),
        "t_factorize_s": round(info["t_factorize"], 4),
        "t_scan_s": round(info["t_scan"], 4),
        "maxit": args.maxit,
        "eigs_best10": [str(complex(l)) for l in np.asarray(lams)[order][:10]],
    }
    print(json.dumps(result))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=1)
    return 0 if result["met"] else 1


if __name__ == "__main__":
    sys.exit(main())
