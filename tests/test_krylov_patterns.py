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


def test_iar_chebyshev_user_compute_y0(dep):
    """A user-supplied compute_y0 callable (the reference's compute_y0_cheb
    extension point, ``method_iar_chebyshev.jl``) reproduces the built-in
    :DEP fast path's spectrum."""
    from neptpu.ops.linsolve import lin_solve
    from neptpu.solvers.iar_chebyshev import _cheb_vals, iar_chebyshev

    tauv = np.asarray(dep.tauv)
    a, b = -float(np.max(tauv)), 0.0
    cc, kk2 = (a + b) / (a - b), 2 / (b - a)
    Av = dep.get_Av()  # [I, A_1, ...]
    calls = {"n": 0}

    def my_y0(nep, X, Y, k, M0inv, a_, b_):
        calls["n"] += 1
        Tc = _cheb_vals(cc, k - 1)
        y0 = np.sum(X * Tc[None, :k], axis=1, keepdims=True)
        for j, t in enumerate(tauv):
            Tt = _cheb_vals(-kk2 * t + cc, k)
            z = np.sum(np.asarray(Y)[:, : k + 1] * Tt[None, : k + 1],
                       axis=1, keepdims=True)
            Azv = np.asarray(Av[j + 1] @ jnp.asarray(z)) if hasattr(
                Av[j + 1], "__matmul__") else np.asarray(Av[j + 1].matmat(z))
            y0 = y0 - Azv
        return np.asarray(lin_solve(M0inv, jnp.asarray(y0[:, 0])))

    kw = dict(neigs=3, maxit=30, v=np.ones(dep.n), tol=1e-10)
    lam_ref, _ = iar_chebyshev(dep, compute_y0_method=":DEP", **kw)
    lam_usr, _ = iar_chebyshev(dep, compute_y0_method=my_y0, **kw)
    assert calls["n"] > 0
    np.testing.assert_allclose(np.sort_complex(np.asarray(lam_usr)),
                               np.sort_complex(np.asarray(lam_ref)),
                               rtol=1e-8)
