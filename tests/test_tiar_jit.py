"""Compiled complex TIAR (one lax.scan) vs the host-loop ``tiar``.

Reference template (SURVEY.md §4): same math two ways — the jitted complex
scan (``solvers/tiar_jit.py``) against the host reference implementation on
DEP and gun-class SPMF problems (CPU complex128).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from neptpu import compute_resnorm, nep_gallery
from neptpu.solvers.tiar import tiar
from neptpu.solvers.tiar_jit import tiar_jitted, tiar_jitted_spmf


def test_tiar_jitted_matches_host_tiar_dep():
    nep = nep_gallery("dep0_tridiag", 64)
    l1, Q1, info = tiar_jitted(nep, sigma=-0.3, maxit=40, neigs=4,
                               tol=1e-10, return_info=True)
    assert info["nconv"] >= 3
    l2, _, _ = tiar(nep, sigma=-0.3, maxit=40, neigs=8, tol=1e-9)
    l2 = np.asarray(l2)
    closed = np.concatenate([l2, np.conj(l2)])
    for la in l1:
        assert min(abs(la - closed)) < 1e-8, (la, l2)
    for s in range(len(l1)):
        r = float(compute_resnorm(nep, l1[s], jnp.asarray(Q1[:, s])))
        assert r < 1e-9


@pytest.mark.slow
def test_tiar_jitted_spmf_gun_class():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_spmf_real import _small_gun

    nep = _small_gun()
    sigma = 30 + 1j
    l3, Q3, info = tiar_jitted_spmf(nep, sigma=sigma, maxit=35, neigs=4,
                                    tol=1e-8, return_info=True,
                                    check_error_every=35)
    assert info["nconv"] >= 3
    for s in range(len(l3)):
        r = float(compute_resnorm(nep, l3[s], jnp.asarray(Q3[:, s])))
        assert r < 1e-6
    # agreement with the (differently-formulated) split-real IAR path
    from neptpu.solvers.spmf_real import iar_real_spmf

    lam_ref, _ = iar_real_spmf(nep, sigma=sigma, maxit=35, neigs=8,
                               tol=1e-8, dtype=jnp.float64)
    lam_ref = np.asarray(lam_ref)
    near = sorted(l3, key=lambda la: abs(la - sigma))[:3]
    for la in near:
        assert min(abs(la - lam_ref)) < 1e-6, (la, lam_ref)
