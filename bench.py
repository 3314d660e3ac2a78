"""Benchmark: fused multi-term SpMV (compute_Mlincomb kernel) nnz/s per chip.

North-star metric from BASELINE.json: SpMV nnz/s per chip driving
compute_Mlincomb.  The problem is a gun-scale banded SPMF bank (2D-stencil
bands, the structure of the gallery's FD/FEM operators) in float32.

The measured kernel is the framework's auto-selected stacked-DIA streaming
layout (no gathers).  ``vs_baseline`` reports its speedup over the
gather+segment-sum CSR kernel on the same operands — the direct mapping of
the reference's per-term SpMV loop (``NEPTypes.jl:972-1011``) to TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import time

os.environ.setdefault("NEPTPU_DISABLE_X64", "1")  # f32 on the TPU bench path

import numpy as np


def build_problem(n, m, seed=7):
    """Gun-scale banded SPMF bank: 2D-stencil-like bands (near-diagonal block
    plus far couplings at +-sqrt(n))."""
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    w = int(round(np.sqrt(n)))
    offs = [-w - 1, -w, -w + 1, -1, 0, 1, w - 1, w, w + 1]
    mats = []
    for _ in range(m):
        diags = [rng.standard_normal(n - abs(o)).astype(np.float32) for o in offs]
        mats.append(sp.diags(diags, offs, shape=(n, n), format="csr"))
    return mats


def main():
    import jax
    import jax.numpy as jnp

    from neptpu.ops.dia import DiaTermBank
    from neptpu.ops.sparse import SparseTermBank

    n = int(os.environ.get("BENCH_N", 1_000_000))
    m = int(os.environ.get("BENCH_TERMS", 4))
    mats = build_problem(n, m)
    nnz_total = sum(A.nnz for A in mats)

    bank_dia = DiaTermBank.from_matrices(mats, dtype=np.float32)
    bank_csr = SparseTermBank.from_matrices(mats, dtype=np.float32)

    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.standard_normal((n, m)).astype(np.float32))

    f_dia = jax.jit(bank_dia.lincomb_apply)
    f_csr = jax.jit(bank_csr.lincomb_apply)

    y1 = f_dia(W).block_until_ready()
    y2 = f_csr(W).block_until_ready()
    scale = float(jnp.linalg.norm(y2))
    assert float(jnp.linalg.norm(y1 - y2)) < 1e-3 * scale

    def timeit(fn, iters):
        fn(W).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(W)
        out.block_until_ready()
        return (time.perf_counter() - t0) / iters

    t_dia = timeit(f_dia, 50)
    t_csr = timeit(f_csr, 5)

    result = {
        "metric": "fused_mlincomb_spmv_nnz_per_s_per_chip",
        "value": float(f"{nnz_total / t_dia:.4g}"),
        "unit": "nnz/s",
        "vs_baseline": float(f"{t_csr / t_dia:.4g}"),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
