"""CPU float64 reference runs for the bench phases — the comparator behind
the ``*_cpu_ref_s`` keys in ``bench.py``'s JSON line.

Same problem, same k, same tolerance and the same backward-error measure as
the chip phases, solved by the repo's own host path: complex128 IAR
(``solvers/iar.py``, the reference ``method_iar.jl`` algorithm) with a
cached scipy ``splu`` factorization (``SparseFactorizeLinSolver`` — the
reference's UMFPACK role, ``LinSolvers.jl:109-137``).  This is the fastest
CPU configuration the framework ships; "matching-or-beating on perf" is
evidenced by the chip phase beating this wall time.

``converged`` counts DISTINCT eigenpairs below the tolerance (best
residual per 1e-7-relative group) — the same rule as the chip phases'
``*_converged`` keys in ``bench.py``, so the two sides count the same
thing.

Usage: ``python benchmarks/cpu_ref.py <gun_like|wep|wep_large> [maxit]``
prints one JSON line ``{"phase": ..., "cpu_ref_s": ..., "converged": ...}``.
With ``--save``, the result is also merged into
``benchmarks/cpu_ref_results.json`` (host + date metadata) — the committed
comparator cache that ``bench.py`` reads so the driver-window bench never
re-pays the 2-11 min comparator runs.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("NEPTPU_DISABLE_X64", None)  # the comparator runs in f64
import jax

jax.config.update("jax_platforms", "cpu")  # env vars are too late (sitecustomize)
jax.config.update("jax_enable_x64", True)

import numpy as np


def backward_errmeasure(mats, fv):
    from neptpu.solvers.spmf_real import _spmf_host_resnorm, spmf_fun_scalars

    fro = np.array([np.sqrt(np.abs(A.multiply(A.conj())).sum())
                    for A in mats])
    rn = _spmf_host_resnorm(mats, fv)

    def err(lam, q):
        q = np.asarray(q)
        lam = complex(lam)
        return rn(lam, q) / (float(np.abs(spmf_fun_scalars(fv, lam)) @ fro)
                             * max(np.linalg.norm(q), 1e-300))

    return err


def main():
    import neptpu
    from neptpu.core.exceptions import NoConvergenceException
    from neptpu.ops.linsolve import SparseFactorizeLinSolverCreator
    from neptpu.solvers import iar
    from neptpu.solvers.spmf_real import collect_spmf_terms

    args = [a for a in sys.argv[1:] if a != "--save"]
    save = "--save" in sys.argv[1:]
    phase = args[0] if args else "gun_like"
    if phase == "gun_like":
        nep = neptpu.nep_gallery("gun_like")
        sigma, gamma, tol, maxit = 2.0e4 + 100j, 1.0e4, 1e-6, 60
    elif phase == "wep":
        nep = neptpu.nep_gallery("waveguide", nx=109, nz=105,
                                 benchmark_problem="JARLEBRING",
                                 neptype="SPMF")
        sigma, gamma, tol, maxit = -3 - 3.5j, 1.0, 1e-5, 80
    elif phase == "wep_large":
        nep = neptpu.nep_gallery("waveguide", nx=119, nz=115,
                                 benchmark_problem="JARLEBRING",
                                 neptype="SPMF")
        sigma, gamma, tol, maxit = -3 - 3.5j, 1.0, 1e-5, 80
    else:
        raise SystemExit(f"unknown phase {phase}")
    if len(args) > 1:
        maxit = int(args[1])

    mats, fv = collect_spmf_terms(nep)
    err = backward_errmeasure(mats, fv)
    neigs = 10

    def distinct_count(lams, Q):
        """DISTINCT converged pairs — same rule as bench.py's
        distinct_below_tol (best residual per 1e-7-relative group)."""
        lams = np.asarray(lams)
        errs = np.array([err(la, np.asarray(Q[:, j]))
                         for j, la in enumerate(lams)])
        good = np.nonzero(errs < tol)[0]
        sel = []
        for j in good[np.argsort(errs[good])]:
            if all(abs(lams[j] - lams[i]) > 1e-7 * max(1.0, abs(lams[j]))
                   for i in sel):
                sel.append(j)
        return len(sel)

    t0 = time.perf_counter()
    try:
        lams, Q, V = iar(nep, sigma=sigma, gamma=gamma, maxit=maxit,
                         neigs=neigs, tol=tol, errmeasure=err,
                         check_error_every=10,
                         linsolvercreator=SparseFactorizeLinSolverCreator())
        nconv = distinct_count(lams, Q)
    except NoConvergenceException as e:
        lams = np.asarray(e.lam) if e.lam is not None else np.zeros(0)
        Qp = np.asarray(e.v) if e.v is not None else None
        nconv = 0
        if Qp is not None and lams.size:
            nconv = distinct_count(lams, Qp)
    wall = time.perf_counter() - t0
    rec = {"phase": phase, "cpu_ref_s": round(wall, 3),
           "converged": nconv, "n": int(nep.n),
           "k_target": neigs, "tol_backward": tol}
    print(json.dumps(rec), flush=True)
    if save:
        import datetime
        import platform

        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "cpu_ref_results.json")
        try:
            with open(path) as fh:
                cache = json.load(fh)
        except (OSError, json.JSONDecodeError):
            cache = {}
        rec = dict(rec)
        rec["recorded"] = datetime.date.today().isoformat()
        rec["host"] = f"{platform.machine()}-{os.cpu_count()}cpu"
        cache[phase] = rec
        with open(path, "w") as fh:
            json.dump(cache, fh, indent=1, sort_keys=True)
            fh.write("\n")


if __name__ == "__main__":
    main()
