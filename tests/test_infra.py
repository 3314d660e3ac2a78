"""Infrastructure tests: native runtime library, serialization round-trip,
benchmark harness, logger."""
import os

import numpy as np
import pytest

import neptpu
from neptpu.utils.benchmark import Benchmarker, load_history, render_report
from neptpu.utils.serialization import read_sparse_matrix, write_sparse_matrix


def test_serialization_roundtrip(tmp_path):
    import scipy.sparse as sp

    rng = np.random.default_rng(0)
    A = sp.random(30, 30, density=0.2, random_state=7, format="csr")
    p = str(tmp_path / "m.txt")
    write_sparse_matrix(p, A)
    B = read_sparse_matrix(p)
    assert (A != B).nnz == 0


def test_native_msws_bit_exact():
    from neptpu.native import msws_gen_mat

    A = msws_gen_mat(20, 15)
    if A is None:
        pytest.skip("native library not built")
    from neptpu.models.gallery.msws import MSWS_RNG

    assert np.array_equal(A, MSWS_RNG().gen_mat(20, 15))


def test_native_text_reader(tmp_path):
    from neptpu.native import read_sparse_matrix_text

    import scipy.sparse as sp

    A = sp.random(20, 20, density=0.3, random_state=3, format="csr")
    p = str(tmp_path / "m.txt")
    write_sparse_matrix(p, A)
    B = read_sparse_matrix_text(p)
    if B is None:
        pytest.skip("native library not built")
    assert (A != B).nnz == 0


def test_benchmarker(tmp_path):
    b = Benchmarker(repeats=2)
    b.run("noop", lambda: sum(range(100)))
    p = str(tmp_path / "hist.json")
    b.save(p)
    b.save(p)
    hist = load_history(p)
    assert len(hist) == 2
    rep = render_report(p)
    assert "noop" in rep


def test_error_logger_records_history():
    from neptpu import ErrorLogger, nep_gallery

    lg = ErrorLogger(maxits=100, maxvals=10)
    nep = nep_gallery("dep0")
    lam, v = neptpu.augnewton(nep, v=np.ones(5), tol=1e-12, maxit=30, logger=lg)
    errs = lg.errs
    filled = errs[~np.isnan(errs[:, 0]), 0]
    assert len(filled) >= 2
    assert filled[-1] < 1e-12  # converged history recorded
    # "essentially quadratic" tail (reference test/logger.jl:12-15):
    # log10 of the last error ~ twice the log10 of the one before
    if len(filled) >= 3 and filled[-2] > 0:
        assert abs(2 * np.log10(filled[-2]) - np.log10(filled[-1])) < 2


def test_pallas_dia_kernel_interpret_matches_jnp():
    """The TPU Pallas streaming DIA kernel (interpret mode on CPU) computes
    the same fused multi-term SpMV as the portable XLA path."""
    import jax.numpy as jnp
    import scipy.sparse as sp

    from neptpu.ops.dia import DiaTermBank
    from neptpu.ops.pallas_spmv import dia_lincomb_pallas

    rng = np.random.default_rng(3)
    n, m = 700, 3
    offs = [-26, -25, -1, 0, 1, 25, 26]
    mats = []
    for _ in range(m):
        diags = [rng.standard_normal(n - abs(o)).astype(np.float32) for o in offs]
        mats.append(sp.diags(diags, offs, shape=(n, n), format="csr"))
    bank = DiaTermBank.from_matrices(mats, dtype=np.float32)
    W = jnp.asarray(rng.standard_normal((n, m)).astype(np.float32))

    y_ref = bank.lincomb_apply(W)  # CPU backend -> portable XLA path
    y_pal = dia_lincomb_pallas(bank.data, bank.offsets, W, block_rows=256,
                               interpret=True)
    assert float(jnp.linalg.norm(y_pal - y_ref)) < 1e-4 * float(
        jnp.linalg.norm(y_ref)
    )
