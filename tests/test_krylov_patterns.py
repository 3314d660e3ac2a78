"""IAR/TIAR contract patterns from the reference's test suite
(``test/iar.jl``, ``test/tiar.jl``): neigs=Inf, user-supplied
orthogonalization, iar==tiar numerical equivalence, and the
NoConvergenceException contract."""
import numpy as np
import pytest

import jax.numpy as jnp

import neptpu
from neptpu import compute_resnorm, nep_gallery
from neptpu.core.exceptions import NoConvergenceException


@pytest.fixture(scope="module")
def dep():
    return nep_gallery("dep0", 100)


def test_tiar_neigs_inf(dep):
    """neigs=Inf: return every pair that converges within maxit
    (``tiar.jl:28-31`` expects 7 on this problem)."""
    lam, Q, _ = neptpu.tiar(dep, sigma=1.1, gamma=3, neigs=np.inf,
                            v=np.ones(dep.n), maxit=50, tol=1e-13)
    lam = np.asarray(lam)
    assert len(lam) >= 7
    for l, q in zip(lam, np.asarray(Q).T):
        assert float(compute_resnorm(dep, complex(l), q)) < 1e-11


def test_user_supplied_orthogonalization(dep):
    """A user callable with the (V, w) -> (w, h, beta) contract drives the
    Krylov basis (reference custom OrthogonalizationMethod,
    ``tiar.jl:6-17``); the basis must stay orthonormal."""
    calls = {"n": 0}

    def double_cgs(V, w):
        calls["n"] += 1
        w = jnp.asarray(w)
        if V.shape[1] == 0:
            beta = jnp.linalg.norm(w)
            return w / beta, jnp.zeros((0,), w.dtype), beta
        h = V.conj().T @ w
        w = w - V @ h
        g = V.conj().T @ w
        w = w - V @ g
        beta = jnp.linalg.norm(w)
        return w / beta, h + g, beta

    lam, Q, Z = neptpu.tiar(dep, sigma=1.1, gamma=3, neigs=4,
                            v=np.ones(dep.n), maxit=50, tol=1e-13,
                            orthmethod=double_cgs)
    assert calls["n"] > 0
    Z = np.asarray(Z)
    assert np.linalg.norm(Z.conj().T @ Z - np.eye(Z.shape[1])) < 1e-6
    for l, q in zip(np.asarray(lam), np.asarray(Q).T):
        assert float(compute_resnorm(dep, complex(l), q)) < 1e-11


def test_bad_orthmethod_type_raises(dep):
    with pytest.raises(TypeError, match="orthmethod"):
        neptpu.tiar(dep, sigma=1.1, neigs=2, v=np.ones(dep.n), maxit=20,
                    orthmethod=object())


def test_iar_tiar_equivalence(dep):
    """iar and tiar are mathematically equivalent for maxit << n: the
    converged spectra must agree to high accuracy (``tiar.jl:57-63``)."""
    kw = dict(sigma=1.1, gamma=3, neigs=2, v=np.ones(dep.n), maxit=50,
              tol=1e-13)
    lam_t, _, _ = neptpu.tiar(dep, **kw)
    lam_i, _, _ = neptpu.iar(dep, **kw)
    lt = np.sort_complex(np.asarray(lam_t))
    li = np.sort_complex(np.asarray(lam_i))
    assert len(lt) == len(li)
    np.testing.assert_allclose(lt, li, rtol=1e-9)


def test_iar_nonconvergence_contract(dep):
    """maxit too small: NoConvergenceException, carrying any partial
    results (``iar.jl:65-71``)."""
    with pytest.raises(NoConvergenceException):
        neptpu.iar(dep, sigma=1.1, neigs=6, v=np.ones(dep.n), maxit=7,
                   tol=1e-13)
