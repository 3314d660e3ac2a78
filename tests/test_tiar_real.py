"""Compiled complex-as-real TIAR vs the host-loop tiar / complex iar
(same math two ways, SURVEY.md §4)."""
import jax.numpy as jnp
import numpy as np
import pytest

import neptpu
from neptpu import compute_resnorm, nep_gallery
from neptpu.solvers.tiar_real import tiar_real, tiar_real_spmf


def _match(lams_a, lams_b, tol):
    for la in lams_a:
        assert min(abs(la - lb) for lb in lams_b) < tol, (la, lams_b)


def test_tiar_real_matches_host_tiar():
    nep = nep_gallery("dep0_tridiag", 64)
    # host tiar stops at the first k where 4 pairs converge; the compiled run
    # does all 40 steps, so compare the host set against a larger compiled set
    lams_c, Q_c, _ = neptpu.tiar(nep, sigma=-0.3, maxit=40, neigs=4,
                                 v=np.ones(nep.n), tol=1e-9)
    lams_r, Q_r = tiar_real(nep, sigma=-0.3, maxit=40, neigs=10, tol=1e-9,
                            dtype=jnp.float64)
    assert len(lams_r) >= 4
    _match(np.asarray(lams_c), lams_r, 1e-7)
    for s in range(len(lams_r)):
        r = float(compute_resnorm(nep, lams_r[s], jnp.asarray(Q_r[:, s])))
        assert r < 1e-8


def test_tiar_real_early_exit():
    nep = nep_gallery("dep0_tridiag", 128)
    lams, Q, info = tiar_real(nep, sigma=-0.3, maxit=40, neigs=3, tol=1e-9,
                              dtype=jnp.float64, check_error_every=5,
                              return_info=True)
    assert info["k_done"] < 40
    assert info["nconv"] >= 3
    for s in range(len(lams)):
        r = float(compute_resnorm(nep, lams[s], jnp.asarray(Q[:, s])))
        assert r < 1e-8


@pytest.mark.slow
def test_tiar_real_spmf_small_gun():
    from tests.test_spmf_real import _small_gun

    nep = _small_gun(n=80)
    sigma = 30.0 + 1.0j
    lams_c, _, _ = neptpu.iar(nep, sigma=sigma, neigs=4, maxit=35,
                              v=np.ones(nep.n), tol=1e-8)
    lams_r, Q_r = tiar_real_spmf(nep, sigma=sigma, maxit=35, neigs=4,
                                 tol=1e-8, dtype=jnp.float64)
    assert len(lams_r) >= 3
    _match(lams_r[:3], np.asarray(lams_c), 1e-5)
    for s in range(min(3, len(lams_r))):
        r = float(compute_resnorm(nep, lams_r[s], jnp.asarray(Q_r[:, s])))
        assert r < 1e-5
