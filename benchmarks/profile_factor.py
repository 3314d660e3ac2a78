"""Profile where the shifted-factorization time goes for the bench configs.

Stages timed separately:
  collect   — gallery ctor + term collection (host)
  assemble  — assemble_shift_parts: bulk sum + arrow/band split (host scipy)
  interleave— complex->real strip interleave (host numpy)
  factor    — PartitionedBandedSolver/_factor_partitioned (device; includes
              any AOT compile not in cache)
  smw       — InterleavedSMW X/K setup (device solves)
Run twice in-process to split compile from steady-state.
"""
import os
import time

os.environ.setdefault("NEPTPU_DISABLE_X64", "1")
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp
import numpy as np

import neptpu
from neptpu.ops.partitioned import (InterleavedSMW, PartitionedBandedSolver,
                                    assemble_shift_parts,
                                    complex_lowrank_to_half)
from neptpu.parallel.spike import interleave_complex_banded
from neptpu.solvers.spmf_real import collect_spmf_terms


def profile(name, make_nep, sigma):
    print(f"=== {name} ===", flush=True)
    t0 = time.perf_counter()
    with jax.default_device(jax.devices("cpu")[0]):
        nep = make_nep()
    mats, fv = collect_spmf_terms(nep)
    t1 = time.perf_counter()
    print(f"collect: {t1 - t0:.2f}s  (n={nep.n})", flush=True)

    parts = assemble_shift_parts(mats, fv, sigma)
    t2 = time.perf_counter()
    print(f"assemble: {t2 - t1:.2f}s", flush=True)
    strips, offs, Lc, Uc = parts
    print(f"  strips {strips.shape} band offsets {min(offs)}..{max(offs)} "
          f"rank {0 if Lc is None else Lc.shape[1]}", flush=True)

    rstrips, roffs = interleave_complex_banded(strips, offs)
    t3 = time.perf_counter()
    print(f"interleave: {t3 - t2:.2f}s  rstrips {rstrips.shape}", flush=True)

    for run in (1, 2):
        ta = time.perf_counter()
        base = PartitionedBandedSolver(rstrips.astype(np.float32), roffs,
                                       p=16, mode="inv")
        jax.block_until_ready(jax.tree_util.tree_leaves(base.tree_flatten()[0]))
        tb = time.perf_counter()
        print(f"factor(run{run}): {tb - ta:.2f}s  "
              f"p={base.p} blk={base.blk} b={base.b}", flush=True)
        if Lc is not None:
            Lh, Uh = complex_lowrank_to_half(Lc, Uc)
            smw = InterleavedSMW(base, Lh.astype(np.float32),
                                 Uh.astype(np.float32))
        else:
            smw = InterleavedSMW(base)
        jax.block_until_ready(jax.tree_util.tree_leaves(smw.tree_flatten()[0]))
        tc = time.perf_counter()
        print(f"smw(run{run}): {tc - tb:.2f}s", flush=True)


profile("gun_like", lambda: neptpu.nep_gallery("gun_like"), 2.0e4 + 100j)
profile("wep(109x105)",
        lambda: neptpu.nep_gallery("waveguide", nx=109, nz=105,
                                   benchmark_problem="JARLEBRING",
                                   neptype="SPMF"), -3 - 3.5j)
