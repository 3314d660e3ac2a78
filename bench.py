"""Benchmark: fused multi-term SpMV (compute_Mlincomb kernel) nnz/s per chip.

North-star metric from BASELINE.json: SpMV nnz/s per chip driving
compute_Mlincomb.  The reference publishes no throughput numbers
(BASELINE.md), so ``vs_baseline`` reports the speedup of the fused
aligned-bank kernel over the naive per-term SpMV loop (the reference's
computational pattern: one SpMV per SPMF term, ``NEPTypes.jl:972-1011``)
measured on the same chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

os.environ.setdefault("NEPTPU_DISABLE_X64", "1")  # f32 on the TPU bench path

import numpy as np


def build_problem(n=200_000, row_nnz=10, m=4, seed=7):
    """Synthetic gun-scale aligned SPMF bank: m terms sharing one pattern."""
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), row_nnz)
    cols = rng.integers(0, n, size=n * row_nnz)
    pattern = sp.csr_matrix(
        (np.ones(n * row_nnz, dtype=np.float32), (rows, cols)), shape=(n, n)
    )
    pattern.sum_duplicates()
    mats = []
    for i in range(m):
        A = pattern.copy()
        A.data = rng.standard_normal(A.nnz).astype(np.float32)
        mats.append(A)
    return mats


def main():
    import jax
    import jax.numpy as jnp

    from neptpu.ops.sparse import CSR, SparseTermBank, spmv

    n = int(os.environ.get("BENCH_N", 200_000))
    row_nnz = int(os.environ.get("BENCH_ROW_NNZ", 10))
    m = int(os.environ.get("BENCH_TERMS", 4))
    mats = build_problem(n, row_nnz, m)
    bank = SparseTermBank.from_matrices(mats, dtype=np.float32)
    nnz = bank.nnz

    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.standard_normal((n, m)).astype(np.float32))

    fused = jax.jit(bank.lincomb_apply)
    y = fused(W).block_until_ready()

    # naive baseline: one separate SpMV per term (the reference's pattern)
    csrs = [bank.term_csr(i) for i in range(m)]

    @jax.jit
    def naive(W):
        y = spmv(csrs[0], W[:, 0])
        for i in range(1, m):
            y = y + spmv(csrs[i], W[:, i])
        return y

    y2 = naive(W).block_until_ready()
    assert np.allclose(np.asarray(y), np.asarray(y2), atol=1e-2 * float(jnp.linalg.norm(y)) / np.sqrt(n) + 1e-3)

    def timeit(fn, iters=30):
        fn(W).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(W)
        out.block_until_ready()
        return (time.perf_counter() - t0) / iters

    t_fused = timeit(fused)
    t_naive = timeit(naive)

    total_nnz = nnz * m  # operand entries touched per Mlincomb application
    nnz_per_s = total_nnz / t_fused
    result = {
        "metric": "fused_mlincomb_spmv_nnz_per_s_per_chip",
        "value": float(f"{nnz_per_s:.4g}"),
        "unit": "nnz/s",
        "vs_baseline": float(f"{t_naive / t_fused:.4g}"),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
