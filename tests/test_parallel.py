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
