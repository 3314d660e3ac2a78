"""Stage-level profile of the batched per-shift refinement path.

Answers "where does ``*_t_refine_s`` go" for the bench phases: host
assembly vs host->device transfer vs the compiled setup program vs the
host capacitance inversion vs the per-sweep solves, for both the chip
(``BatchedShiftSMW``) and host (scipy splu) backends, on REAL shift sets
(eigenvalue estimates from a stored spectrum or a quick scan).

Usage: python benchmarks/profile_refine.py <gun_like|wep|wep_large> [S]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
_vmem = "--xla_tpu_scoped_vmem_limit_kib=65536"
if "scoped_vmem" not in os.environ.get("LIBTPU_INIT_ARGS", ""):
    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "") + " " + _vmem).strip()

import numpy as np

# representative refined eigenvalues (round-4 bench records) — the profile
# factors at *realistic* shifts without paying a full scan first
SPECTRA = {
    "gun_like": [22345.1 + 0.64j, 23420.8 + 5.2j, 24232.7 + 11.5j,
                 25312.5 + 22.1j, 26720.2 + 42.3j, 28180.9 + 71.5j,
                 29716.1 + 111.2j, 31384.3 + 163.9j, 33159.8 + 231.1j,
                 35026.1 + 314.5j, 36990.4 + 415.2j, 39050.6 + 534.0j],
    "wep": [-2.7432 - 3.1439j, -3.0466 - 3.5842j, -2.4499 - 2.7038j,
            -3.3547 - 4.0143j, -2.1636 - 2.2668j, -3.6692 - 4.4409j,
            -1.8852 - 1.8413j, -3.9886 - 4.8634j, -1.6147 - 1.4213j,
            -4.3126 - 5.2812j, -1.3528 - 1.0043j, -4.6410 - 5.6942j],
}
SPECTRA["wep_large"] = SPECTRA["wep"]


def build(phase):
    import neptpu

    if phase == "gun_like":
        return neptpu.nep_gallery("gun_like")
    nx, nz = (109, 105) if phase == "wep" else (119, 115)
    return neptpu.nep_gallery("waveguide", nx=nx, nz=nz,
                              benchmark_problem="JARLEBRING", neptype="SPMF")


def main():
    from neptpu.ops.partitioned import BatchedShiftSMW, ShiftPlan
    from neptpu.solvers.refine import _refine_batch_limit, newton_refine
    from neptpu.solvers.spmf_real import collect_spmf_terms

    phase = sys.argv[1] if len(sys.argv) > 1 else "gun_like"
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    lams = np.array(SPECTRA[phase][:S])

    t0 = time.perf_counter()
    with jax.default_device(jax.devices("cpu")[0]):
        nep = build(phase)
    mats, fv = collect_spmf_terms(nep)
    print(f"[{time.perf_counter()-t0:7.2f}s] gallery+terms  n={nep.n}")

    t0 = time.perf_counter()
    plan = ShiftPlan(mats, fv)
    rank = sum(L.shape[1] for _, L, _ in plan.lr) + 2 * plan.m
    lim = _refine_batch_limit(plan, p=8)
    print(f"[{time.perf_counter()-t0:7.2f}s] plan: b={plan.b} "
          f"ndiag={len(plan.offsets)} m={plan.m} rank_c={rank} 2R={2*rank} "
          f"bulk_terms={len(plan.bulk_idx)} lr_terms={len(plan.lr)} "
          f"batch_limit(p=8)={lim}")

    sig = lams + 1j * 1e-8 * np.maximum(np.abs(lams), 1.0)
    rng = np.random.default_rng(0)
    import gc

    backends = os.environ.get("PROFILE_BACKENDS", "chip,host").split(",")
    if "chip" in backends:
        t0 = time.perf_counter()
        bs = BatchedShiftSMW(mats, fv, sig, p=8, plan=plan, ir=3)
        t_build = time.perf_counter() - t0
        print(f"[{t_build:7.2f}s] BatchedShiftSMW(S={S}, ir=3) "
              f"timings={ {k: round(v, 2) for k, v in bs.timings.items()} }")
        R = rng.standard_normal((nep.n, S))
        for it in range(3):
            t0 = time.perf_counter()
            yre, yim = bs.solve_pairs(R, 0 * R)
            jax.block_until_ready(yre)
            print(f"[{time.perf_counter()-t0:7.2f}s] solve_pairs #{it}")
        del bs, yre, yim
        gc.collect()

    # end-to-end newton_refine comparison, both backends, from perturbed
    # eigenvalue estimates (1e-6-class start like the real bench phase)
    for backend in backends:
        Q = rng.standard_normal((nep.n, S)) + 1j * rng.standard_normal(
            (nep.n, S))
        Q /= np.linalg.norm(Q, axis=0, keepdims=True)
        lam0 = lams * (1 + 3e-6) + 1e-6
        t0 = time.perf_counter()
        # tol=None: fixed sweep count, no straggler passes — pure cost
        l2, Q2, errs = newton_refine(mats, fv, lam0, Q, nsweeps=3, tol=None,
                                     dtype=None, ir=3, backend=backend)
        print(f"[{time.perf_counter()-t0:7.2f}s] newton_refine "
              f"backend={backend}  max_err={max(errs):.2e} "
              f"nbelow={int((errs < 1e-9).sum())}")
        gc.collect()


if __name__ == "__main__":
    main()
