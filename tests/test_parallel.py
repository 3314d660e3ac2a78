"""Sharded-vs-single-device equivalence tests on the virtual 8-device CPU mesh
(the testing template from SURVEY.md §4: same math two ways must agree)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neptpu
from neptpu import nep_gallery
from neptpu.parallel import (
    RowShardedBank,
    make_mesh,
    sharded_contour_moments,
    sharded_gram,
    sharded_lincomb_apply,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_sharded_lincomb_matches_local():
    nep = nep_gallery("dep0_sparse", 100, 0.2)
    bank = nep.bank
    mesh = make_mesh(rows=8, nodes=1)
    sbank = RowShardedBank(bank, 8)
    rng = np.random.default_rng(0)
    W = rng.standard_normal((100, bank.nterms))
    y_ref = np.asarray(bank.lincomb_apply(jnp.asarray(W)))
    y_sh = np.asarray(sharded_lincomb_apply(sbank, W, mesh))
    np.testing.assert_allclose(y_sh, y_ref, rtol=1e-12, atol=1e-12)


def test_sharded_gram_matches_local():
    mesh = make_mesh(rows=8, nodes=1)
    rng = np.random.default_rng(1)
    V = rng.standard_normal((64, 5)) + 1j * rng.standard_normal((64, 5))
    w = rng.standard_normal(64) + 0j
    h_ref = V.conj().T @ w
    h_sh = np.asarray(sharded_gram(jnp.asarray(V), jnp.asarray(w), mesh))
    np.testing.assert_allclose(h_sh, h_ref, rtol=1e-12)


def test_halo_sharded_dia_lincomb_matches_local():
    """Halo-exchange row-sharded DIA Mlincomb == serial (vectors sharded too)."""
    import scipy.sparse as sp

    from neptpu.ops.dia import DiaTermBank
    from neptpu.parallel import (
        ShardedDiaBank,
        shard_vector,
        sharded_dia_lincomb,
        unshard_vector,
    )

    rng = np.random.default_rng(0)
    n, m, w = 237, 3, 15
    offs = [-w, -1, 0, 1, w]
    mats = [sp.diags([rng.standard_normal(n - abs(o)) for o in offs], offs,
                     shape=(n, n), format="csr") for _ in range(m)]
    bank = DiaTermBank.from_matrices(mats)
    W = rng.standard_normal((n, m))
    y_ref = np.asarray(bank.lincomb_apply(jnp.asarray(W)))

    mesh = make_mesh(rows=8, nodes=1)
    sb = ShardedDiaBank(bank, 8).device_put(mesh)
    ys = sharded_dia_lincomb(sb, shard_vector(W, sb.ndev, sb.blk), mesh)
    y = unshard_vector(ys, n)
    np.testing.assert_allclose(y, y_ref, rtol=1e-12, atol=1e-12)


def test_spike_banded_solver_exact():
    """Distributed SPIKE banded solve == direct dense solve (real, block
    RHS)."""
    import scipy.sparse as sp

    from neptpu.parallel import SpikeBandedSolver, dia_strips_from_dense

    rng = np.random.default_rng(0)
    n, w = 237, 9
    offs = [-w, -1, 0, 1, w]
    diags = [rng.standard_normal(n - abs(o)) for o in offs]
    diags[2] += 8.0
    A = sp.diags(diags, offs, shape=(n, n)).toarray()
    mesh = make_mesh(rows=8, nodes=1)
    solver = SpikeBandedSolver(dia_strips_from_dense(A, offs), offs, mesh)
    B = rng.standard_normal((n, 3))
    X = np.asarray(solver.solve(B))
    assert np.abs(A @ X - B).max() < 1e-9


@pytest.mark.slow
def test_spike_banded_solver_complex_interleaved():
    """Complex banded system through the row-interleaved real SPIKE form."""
    import scipy.sparse as sp

    from neptpu.parallel import (
        SpikeBandedSolver,
        dia_strips_from_dense,
        interleave_complex_banded,
    )

    rng = np.random.default_rng(0)
    n, w = 237, 9
    offs = [-w, -1, 0, 1, w]
    diags = [rng.standard_normal(n - abs(o)) for o in offs]
    diags[2] += 8.0
    A = sp.diags(diags, offs, shape=(n, n)).toarray()
    mesh = make_mesh(rows=8, nodes=1)
    Ac = A + 1j * sp.diags([rng.standard_normal(n - abs(o)) for o in offs],
                           offs, shape=(n, n)).toarray()
    rstrips, roffs = interleave_complex_banded(
        dia_strips_from_dense(Ac, offs), offs)
    solver_c = SpikeBandedSolver(rstrips, roffs, mesh)
    bc = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    f = np.zeros(2 * n)
    f[0::2], f[1::2] = bc.real, bc.imag
    xr = np.asarray(solver_c.solve(f))
    xc = xr[0::2] + 1j * xr[1::2]
    assert np.abs(Ac @ xc - bc).max() < 1e-8


@pytest.mark.slow
def test_iar_sharded_matches_serial():
    """End-to-end sharded solver: fully row-sharded complex-as-real IAR
    (halo Mlincomb + SPIKE shifted solve + psum DGKS) reproduces the serial
    iar_real spectrum on the 8-device mesh."""
    from neptpu.solvers.iar_real import iar_real
    from neptpu.solvers.iar_sharded import iar_real_sharded

    nep = nep_gallery("dep0_tridiag", 600)
    mesh = make_mesh(rows=8, nodes=1)
    kw = dict(sigma=-0.2 + 0.1j, maxit=40, neigs=4, tol=1e-6,
              dtype=jnp.float64)
    lam_s, Q_s = iar_real(nep, **kw)
    lam_p, Q_p = iar_real_sharded(nep, mesh, **kw)
    assert len(lam_s) == len(lam_p) >= 4
    np.testing.assert_allclose(np.sort_complex(lam_p), np.sort_complex(lam_s),
                               rtol=1e-10, atol=1e-12)


def test_sharded_contour_moments_match_serial():
    nep = nep_gallery("dep0")
    mesh = make_mesh(rows=1, nodes=8)
    rng = np.random.default_rng(10)
    Vh = rng.standard_normal((5, 2)) + 0j
    A = sharded_contour_moments(nep, -0.16, 0.3, Vh, 64, 2, mesh)
    from neptpu.solvers.contour import _contour_moments
    from neptpu.ops.linsolve import BackslashLinSolverCreator

    A_ref = _contour_moments(nep, -0.16, (0.3, 0.3), jnp.asarray(Vh, dtype=jnp.complex128),
                             64, 2, BackslashLinSolverCreator(), None, None)
    for j in range(2):
        np.testing.assert_allclose(np.asarray(A[j]), np.asarray(A_ref[j]),
                                   rtol=1e-10, atol=1e-12)


def test_contour_beyn_mesh_matches_serial():
    """Solver-level sharded quadrature: contour_beyn(mesh=...) == serial
    contour_beyn spectra (node axis over 8 virtual devices)."""
    from neptpu.solvers.contour import contour_beyn

    nep = nep_gallery("dep0")
    mesh = make_mesh(rows=1, nodes=8)
    kw = dict(sigma=-0.2, radius=0.7, neigs=2, N=64, tol=1e-6)
    lam_s, V_s = contour_beyn(nep, **kw)
    lam_p, V_p = contour_beyn(nep, mesh=mesh, **kw)
    lam_s, lam_p = np.asarray(lam_s), np.asarray(lam_p)
    assert len(lam_p) == len(lam_s) >= 1
    np.testing.assert_allclose(np.sort_complex(lam_p), np.sort_complex(lam_s),
                               rtol=1e-7, atol=1e-9)
