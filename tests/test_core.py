"""Protocol/consistency tests (reference ``test/core.jl``, ``test/spmf.jl``):

* compute_Mlincomb == sum_j a_j M^(j) v_j built from compute_Mder
* startder semantics
* analytic derivative vs central finite difference
* compute_MM diagonalization identity
* conversion fallbacks (Mlincomb-from-MM, Mder-from-MM)
"""
import jax.numpy as jnp
import numpy as np
import pytest

import neptpu
from neptpu import (
    DEP,
    PEP,
    SPMF_NEP,
    compute_Mder,
    compute_Mlincomb,
    compute_MM,
    matfun,
    nep_gallery,
)
from neptpu.core.nep import mder_from_mm, mlincomb_from_mder, mlincomb_from_mm

RNG = np.random.default_rng(42)


def _dense(M):
    return np.asarray(M if isinstance(M, jnp.ndarray) else M.to_dense())


def make_problems():
    probs = {
        "dep0": nep_gallery("dep0"),
        "dep0_sparse": nep_gallery("dep0_sparse", 40, 0.25),
        "pep0": nep_gallery("pep0", 30),
        "pep0_sparse": nep_gallery("pep0_sparse", 40, 0.1),
        "qdep1": nep_gallery("qdep1"),
        "real_quadratic": nep_gallery("real_quadratic"),
        "neuron0": nep_gallery("neuron0"),
    }
    return probs


PROBS = make_problems()


@pytest.mark.parametrize("name", sorted(PROBS))
def test_mlincomb_vs_mder(name):
    nep = PROBS[name]
    n = nep.n
    lam = 0.33 + 0.41j
    k = 4
    V = RNG.standard_normal((n, k)) + 1j * RNG.standard_normal((n, k))
    a = np.array([1.0, -0.5, 2.0, 0.25])
    got = np.asarray(compute_Mlincomb(nep, lam, V, a))
    want = np.zeros(n, dtype=complex)
    for j in range(k):
        want += a[j] * (_dense(compute_Mder(nep, lam, j)) @ V[:, j])
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("name", sorted(PROBS))
def test_mlincomb_startder(name):
    nep = PROBS[name]
    n = nep.n
    lam = -0.2 + 0.7j
    k = 3
    sd = 2
    V = RNG.standard_normal((n, k))
    a = np.array([0.7, 1.3, -0.6])
    got = np.asarray(compute_Mlincomb(nep, lam, V, a, startder=sd))
    want = np.zeros(n, dtype=complex)
    for j in range(k):
        want += a[j] * (_dense(compute_Mder(nep, lam, j + sd)) @ V[:, j])
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("name", sorted(PROBS))
def test_fd_derivative(name):
    """M'(lam) v ~ (M(lam+e) - M(lam-e)) v / 2e (reference pattern, e.g.
    ``test/gun_native.jl:22-32``)."""
    nep = PROBS[name]
    n = nep.n
    lam = 0.15 - 0.3j
    eps = 1e-6
    v = RNG.standard_normal(n)
    Mp = _dense(compute_Mder(nep, lam + eps))
    Mm = _dense(compute_Mder(nep, lam - eps))
    fd = (Mp - Mm) @ v / (2 * eps)
    an = np.asarray(compute_Mlincomb(nep, lam, v[:, None], np.ones(1), startder=1))
    np.testing.assert_allclose(an, fd, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("name", ["dep0", "pep0", "qdep1"])
def test_mm_diagonalization_identity(name):
    """compute_MM(S, V) columns match M-action through the eigendecomposition
    of S (reference ``test/spmf.jl``)."""
    nep = PROBS[name]
    n = nep.n
    k = 3
    S = np.diag(RNG.standard_normal(k) + 1j * RNG.standard_normal(k))
    V = RNG.standard_normal((n, k)) + 0j
    Z = np.asarray(compute_MM(nep, S, V))
    for j in range(k):
        want = _dense(compute_Mder(nep, S[j, j])) @ V[:, j]
        np.testing.assert_allclose(Z[:, j], want, rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("name", ["dep0", "pep0", "qdep1"])
def test_mlincomb_from_mm_conversion(name):
    nep = PROBS[name]
    n = nep.n
    lam = 0.1 + 0.2j
    k = 3
    V = RNG.standard_normal((n, k)) + 0j
    a = np.array([1.0, 0.0, -2.0])  # includes a zero: exercises the masking
    got = np.asarray(mlincomb_from_mm(nep, lam, V, a))
    want = np.asarray(mlincomb_from_mder(nep, lam, V, a))
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)


def test_mder_from_mm_conversion():
    nep = PROBS["dep0"]
    lam = 0.3 - 0.1j
    for der in (0, 1, 2):
        got = np.asarray(mder_from_mm(nep, lam, der))
        want = _dense(compute_Mder(nep, lam, der))
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)


def test_deriv_weights_exp():
    lam = 0.4 + 0.9j
    tau = 1.7
    f = lambda S: matfun.expm(-tau * S)
    k = 5
    w = np.asarray(matfun.fun_derivatives(f, lam, k))
    want = np.array([(-tau) ** j * np.exp(-tau * lam) for j in range(k)])
    np.testing.assert_allclose(w, want, rtol=1e-9)


def test_resnorm_and_errmeasure():
    nep = PROBS["dep0"]
    v = np.ones(nep.n)
    r = float(neptpu.compute_resnorm(nep, 0.5, v))
    M = _dense(compute_Mder(nep, 0.5))
    np.testing.assert_allclose(r, np.linalg.norm(M @ v), rtol=1e-10)
    em = neptpu.DefaultErrmeasure(nep)
    assert float(neptpu.estimate_error(em, 0.5, v)) > 0
