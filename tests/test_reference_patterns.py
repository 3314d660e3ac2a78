"""Reference test patterns ported in round 4 (VERDICT item 7):

* end-to-end solvers in extended precision (``/root/reference/test/
  bigfloats.jl`` — BigFloat PEP through augnewton, iterate-path
  comparisons across dtypes);
* error-path sweeps (``gun_native.jl:34-37`` ``@test_throws`` pattern —
  bad gallery arguments, malformed operands, maxder violations);
* broyden mode/pmax coverage (``test/broyden.jl`` — Schur-pair invariants,
  addconj, :eig/:invpow restart eigsolvers);
* nlar sorter coverage (``test/nlar.jl`` — all three eigenvalue sorters).
"""
import numpy as np
import pytest

import jax.numpy as jnp

import neptpu
from neptpu import (PEP, compute_MM, compute_Mlincomb, compute_resnorm,
                    nep_gallery)
from neptpu.solvers import augnewton, broyden, nlar
from neptpu.solvers.nlar import (default_eigval_sorter,
                                 residual_eigval_sorter,
                                 threshold_eigval_sorter)


# ---------------------------------------------------------------------------
# bigfloats.jl: extended-precision end-to-end
# ---------------------------------------------------------------------------


def _bigfloat_pep():
    """The bigfloats.jl PEP: A0 = ones-I, A1 = u v^T, A2 = I + pi e_21."""
    A0 = np.ones((4, 4)) - np.eye(4)
    u = np.arange(1.0, 5.0)
    v = u - 2
    A1 = np.outer(u, v)
    A2 = np.eye(4)
    A2[1, 0] = np.pi
    return PEP([jnp.asarray(A0), jnp.asarray(A1), jnp.asarray(A2)])


def test_extended_precision_end_to_end_beyond_f64():
    """augnewton in mpmath 256-bit on the bigfloats.jl PEP: the residual
    must drop far below anything float64 can certify (>= 1e-20)."""
    from neptpu.utils.extended import augnewton_mp, mp_from_nep, resnorm_mp

    pep = _bigfloat_pep()
    mpnep = mp_from_nep(pep, prec=256)
    lam, v = augnewton_mp(mpnep, lam0=0.2, tol=None, maxit=80)
    r = resnorm_mp(mpnep, lam, v)
    assert float(r) < 1e-30, r


def test_extended_precision_iterates_match_f64_path():
    """The f64 augnewton must walk (to f64 accuracy) the same iterate path
    as the extended-precision run — the bigfloats.jl 'type stability'
    comparison, with mpmath standing in for BigFloat."""
    from neptpu.utils.extended import mp_from_nep, newton_mp, resnorm_mp

    pep = _bigfloat_pep()
    mpnep = mp_from_nep(pep, prec=256)
    lam_mp, v_mp = newton_mp(mpnep, lam0=0.2, maxit=60)
    lam64, v64 = augnewton(pep, lam=0.2, tol=1e-12, maxit=60)
    assert abs(complex(lam64) - complex(lam_mp)) < 1e-10 * max(
        1.0, abs(complex(lam_mp)))


# ---------------------------------------------------------------------------
# gun_native.jl:34-37: error paths
# ---------------------------------------------------------------------------


def test_gallery_rejects_bad_arguments():
    with pytest.raises((TypeError, ValueError)):
        nep_gallery("gun_like", unknown_kwarg=15)
    with pytest.raises((TypeError, ValueError)):
        nep_gallery("dep0", unknown_kwarg=15)
    with pytest.raises(ValueError):
        nep_gallery("definitely_not_a_problem")
    with pytest.raises((TypeError, ValueError)):
        nep_gallery("waveguide", nx=-3)


def test_spmf_rejects_mismatched_operands():
    from neptpu import SPMF_NEP

    A = np.eye(3)
    with pytest.raises(ValueError):
        SPMF_NEP([jnp.asarray(A)], [lambda S: S, lambda S: S @ S])


def test_dep_rejects_complex_delays():
    from neptpu import DEP

    with pytest.raises(ValueError):
        DEP([jnp.asarray(np.eye(3))], tauv=[1.0 + 1j])


def test_mder_nep_maxder_violation():
    """Mder_NEP with maxder=1 must refuse higher derivative requests
    (reference Mder_NEP contract)."""
    from neptpu import Mder_NEP

    nep = Mder_NEP(3, lambda lam, der=0: jnp.eye(3) * (lam if der == 0
                                                       else 1.0), maxder=1)
    from neptpu.core.nep import compute_Mder

    compute_Mder(nep, 0.5, 1)  # allowed
    with pytest.raises((ValueError, AssertionError)):
        compute_Mder(nep, 0.5, 2)


def test_compute_mlincomb_rejects_bad_shapes():
    nep = nep_gallery("dep0", 8)
    with pytest.raises((ValueError, TypeError, AssertionError)):
        compute_Mlincomb(nep, 0.0, jnp.ones((7, 2)), jnp.ones(2))  # wrong n


# ---------------------------------------------------------------------------
# broyden.jl: Schur pair, addconj, modes, pmax
# ---------------------------------------------------------------------------


def test_broyden_schur_pair_dep1():
    dep = nep_gallery("dep1")
    S, V = broyden(dep)
    MM = np.asarray(compute_MM(dep, jnp.asarray(S), jnp.asarray(V)))
    assert np.linalg.norm(MM, 2) < np.sqrt(np.finfo(float).eps)


def test_broyden_addconj_pmax():
    dep = nep_gallery("dep1")
    S, V = broyden(dep, addconj=True, pmax=5)
    D, X = np.linalg.eig(np.asarray(S))
    Vx = np.asarray(V) @ X
    good = 0
    for j in range(len(D)):
        q = Vx[:, j]
        nq = np.linalg.norm(q)
        if nq < 1e-12:
            continue
        if float(compute_resnorm(dep, complex(D[j]), q / nq)) < 1e-7:
            good += 1
    assert good >= 4, good
    # conjugate closure: spectrum symmetric under conjugation
    for d in D[:good]:
        assert np.min(np.abs(np.conj(d) - D)) < 1e-7


def test_broyden_invpow_mode_valid_invariant_pair():
    """:invpow restarts may pick different (closest-to-sigma) eigenvalues
    than :eig, but the returned Schur pair must satisfy MM(S, V) ~ 0."""
    dep = nep_gallery("dep0", 16)
    S2, V2 = broyden(dep, pmax=2, eigmethod=":invpow")
    MM = np.asarray(compute_MM(dep, jnp.asarray(S2), jnp.asarray(V2)))
    assert np.linalg.norm(MM, 2) < 1e-6


# ---------------------------------------------------------------------------
# nlar.jl: sorters
# ---------------------------------------------------------------------------


@pytest.mark.slow
@pytest.mark.parametrize("sorter", [default_eigval_sorter,
                                    residual_eigval_sorter,
                                    threshold_eigval_sorter])
def test_nlar_sorters_converge(sorter):
    nep = nep_gallery("pep0", 50)
    lams, V, _hist = nlar(nep, neigs=2, maxit=50, tol=1e-9, lam=0.0,
                          eigval_sorter=sorter, num_restart_ritz_vecs=2,
                          v=np.ones(50))
    assert len(np.asarray(lams)) >= 2
    for j in range(len(np.asarray(lams))):
        q = np.asarray(V[:, j])
        r = float(compute_resnorm(nep, complex(np.asarray(lams)[j]),
                                  q / np.linalg.norm(q)))
        assert r < 1e-7, (j, r)
