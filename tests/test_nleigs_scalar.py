"""Scalar purely-nonlinear NLEIGS (reference ``test/nleigs/nleigs_scalar.jl``):
A(lam) = 0.2 sqrt(lam) - 0.6 sin(2 lam).  The polynomial variant finds the
eigenvalues away from the sqrt branch cut; only the FULLY RATIONAL variant
(pole candidates on the negative axis) also captures the one near zero."""
import numpy as np

import jax.numpy as jnp

from neptpu import SPMF_NEP, nleigs
from neptpu.ops import matfun


def _scalar_nep():
    f1 = lambda S: (matfun.sqrtm(jnp.asarray(S))
                    if jnp.asarray(S).ndim >= 2 else jnp.sqrt(jnp.asarray(S)))
    f2 = lambda S: (matfun.sinm(2 * jnp.asarray(S))
                    if jnp.asarray(S).ndim >= 2 else jnp.sin(2 * jnp.asarray(S)))
    return SPMF_NEP([np.array([[0.2]]), np.array([[-0.6]])], [f1, f2],
                    check_consistency=False)


def _scalar_residual(lam):
    return abs(0.2 * np.sqrt(complex(lam)) - 0.6 * np.sin(2 * complex(lam)))


SIGMA = [0.01 + 0j, 4 + 0j]


def test_nleigs_scalar_polynomial():
    """Polynomial (Leja on Sigma, no poles): at least one eigenvalue
    converges (``nleigs_scalar.jl:18-23``)."""
    nep = _scalar_nep()
    lam, X, _, _ = nleigs(nep, SIGMA, maxit=100, v=np.ones(1) + 0j,
                          leja=2, isfunm=False)
    lam = np.asarray(lam)
    assert len(lam) >= 1
    for l in lam:
        assert _scalar_residual(l) < 1e-10


def test_nleigs_scalar_fully_rational():
    """With pole candidates on the negative axis THREE eigenvalues converge,
    including the one at ~0.0278 near the sqrt branch point
    (``nleigs_scalar.jl:25-33``)."""
    nep = _scalar_nep()
    Xi = -10.0 ** np.linspace(-6, 5, 10000)
    lam, X, _, _ = nleigs(nep, SIGMA, Xi=Xi, maxit=100, v=np.ones(1) + 0j,
                          leja=2, isfunm=False)
    lam = np.asarray(lam)
    assert len(lam) >= 3
    for l in lam:
        assert _scalar_residual(l) < 1e-10
    # the branch-point eigenvalue only the rational variant captures
    assert np.min(np.abs(lam - 0.0278)) < 1e-2
