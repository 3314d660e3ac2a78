"""Regression tests for the round-4 numerical bug class.

Each of these encodes a failure that cost real debugging on the chip:
* the degenerate ``auto_theta`` representability clamp (m >= ~64 in f32
  silently forced theta ~0.6 instead of the fitted 2-3.4, losing ALL
  deep-degree convergence on the WEP);
* best-peek retention in ``run_iar_real`` (deep-degree f32 degradation
  must not lose pairs an earlier peek certified);
* the ``precision``/backend plumbing of the scan and refinement layers.
"""
import numpy as np
import pytest

import jax.numpy as jnp

import neptpu
from neptpu.solvers.iar_real import apply_theta, auto_theta
from neptpu.solvers.refine import newton_refine, resinv_refine
from neptpu.solvers.spmf_real import (_spmf_host_resnorm, collect_spmf_terms,
                                      iar_real_spmf, spmf_coeff_table,
                                      spmf_fun_scalars)


# ---------------------------------------------------------------------------
# auto_theta: the clamp must NEVER be degenerate
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("m", [20, 64, 80, 100, 130])
def test_auto_theta_clamp_never_degenerate(m):
    """For any Krylov degree the clamp interval [1/lim, lim] must be a
    real interval (lim > 1) — the old ``max**(1/m)/4`` form inverted for
    m >= ~64 in f32 and silently pinned theta to a distorted value."""
    # geometric envelope with ratio 3: the fit wants theta = 3
    S = np.exp(-np.log(3.0) * np.arange(m + 1))[None, :].repeat(2, axis=0)
    th = auto_theta(S, 0 * S, m, jnp.float32)
    assert th > 1.0, (m, th)  # the OLD clamp forced th < 1 for m >= ~64
    # theta^{+-m} must stay representable with headroom
    lim = (float(np.finfo(np.float32).max) / 1e6) ** (1.0 / m)
    assert abs(m * np.log(th)) <= abs(m * np.log(lim)) * (1 + 1e-12)
    # the fitted value survives up to the representability bound
    assert th == pytest.approx(min(3.0, lim), rel=0.05), (m, th, lim)


def test_auto_theta_wep_fit_unclamped_at_deep_degree():
    """The WEP envelope fit wants theta ~2-3.4; at m=100 the old clamp
    forced 0.61 (the f32 WEP scan then converged NOTHING)."""
    wep = neptpu.nep_gallery("waveguide", nx=29, nz=21,
                             benchmark_problem="JARLEBRING", neptype="SPMF")
    mats, fv = collect_spmf_terms(wep)
    Cre, Cim = spmf_coeff_table(fv, -3 - 3.5j, 1.0, 100, scaled=True)
    th = auto_theta(Cre, Cim, 100, jnp.float32)
    assert th > 1.5, th


def test_apply_theta_matches_power_scaling():
    S = np.random.default_rng(0).standard_normal((3, 8))
    Sre, Sim = apply_theta(S, 0 * S, 2.0)
    for j in range(8):
        assert np.allclose(Sre[:, j], S[:, j] * 2.0**j)


# ---------------------------------------------------------------------------
# best-peek retention + precision plumbing
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def wep_small():
    nep = neptpu.nep_gallery("waveguide", nx=29, nz=21,
                             benchmark_problem="JARLEBRING", neptype="SPMF")
    mats, fv = collect_spmf_terms(nep)
    fro = np.array([np.sqrt(np.abs(A.multiply(A.conj())).sum())
                    for A in mats])
    rn = _spmf_host_resnorm(mats, fv)

    def backward(lam, q):
        return rn(lam, q) / float(np.abs(spmf_fun_scalars(fv, lam)) @ fro)

    return nep, mats, fv, backward


def test_deep_degree_run_keeps_early_converged_pairs(wep_small):
    """Running far past convergence (tight tol never satisfied) must still
    return the pairs certified at earlier peeks — the final deep-degree
    extraction alone can be WORSE in f32."""
    nep, mats, fv, backward = wep_small
    lams, Q, info = iar_real_spmf(
        nep, sigma=-3 - 3.5j, maxit=60, neigs=20, tol=1e-14,  # unreachable
        check_error_every=10, errmeasure=backward, dtype=jnp.float32,
        return_info=True)
    assert info["k_done"] == 60  # never early-exited
    assert len(np.asarray(lams)) == 0 or info["nconv"] >= 0
    # the best-so-far error profile must include well-converged pairs
    assert info["errs"][0] < 1e-7, info["errs"][:4]


def test_scan_precision_option_accepted(wep_small):
    """precision='highest' must plumb through and agree with the default
    path on CPU (where f32 GEMMs are true f32 either way)."""
    nep, mats, fv, backward = wep_small
    kw = dict(sigma=-3 - 3.5j, maxit=18, neigs=3, tol=1e-2,
              dtype=jnp.float32, errmeasure=backward)
    l1, _ = iar_real_spmf(nep, **kw)
    l2, _ = iar_real_spmf(nep, precision="highest", **kw)
    l1, l2 = np.asarray(l1), np.asarray(l2)
    for la in l2:
        assert np.min(np.abs(la - l1)) < 1e-4, (la, l1)


def test_refine_backend_auto_selects_and_converges(wep_small):
    nep, mats, fv, backward = wep_small
    lams, Q = iar_real_spmf(nep, sigma=-3 - 3.5j, maxit=18, neigs=3,
                            tol=1e-2, dtype=jnp.float32,
                            errmeasure=backward)
    lams2, Q2, errs = newton_refine(mats, fv, lams, Q, nsweeps=4,
                                    tol=1e-11, errmeasure=backward,
                                    backend="auto")
    assert np.all(errs < 1e-10), errs


def test_refine_rejects_unknown_backend(wep_small):
    nep, mats, fv, backward = wep_small
    lams, Q = iar_real_spmf(nep, sigma=-3 - 3.5j, maxit=12, neigs=2,
                            tol=1e-1, dtype=jnp.float32,
                            errmeasure=backward)
    with pytest.raises((ValueError, KeyError, UnboundLocalError, TypeError)):
        newton_refine(mats, fv, lams, Q, backend="gpu")


def test_multishift_finds_more_distinct_pairs(wep_small):
    """Several shifts, shared bank + compiled programs: the union must
    cover MORE distinct eigenvalues than one shift alone, deduplicated and
    residual-sorted (the route to k=10 distinct WEP pairs in the bench)."""
    from neptpu.solvers.spmf_real import iar_real_spmf_multishift

    nep, mats, fv, backward = wep_small
    l1, _ = iar_real_spmf(nep, sigma=-3 - 3.5j, maxit=30, neigs=5,
                          tol=1e-4, dtype=jnp.float32, errmeasure=backward)
    lams, Q = iar_real_spmf_multishift(
        nep, [-3 - 3.5j, -1.8 - 2.3j], maxit=30, neigs=5, tol=1e-4,
        dtype=jnp.float32, errmeasure=backward)
    assert len(lams) > len(np.asarray(l1))
    # deduplicated
    D = np.abs(lams[:, None] - lams[None, :]) + np.eye(len(lams))
    assert D.min() > 1e-6
    # residual-sorted best-first
    errs = [backward(complex(la), Q[:, j]) for j, la in enumerate(lams)]
    assert errs[0] <= errs[-1] * 1.0000001


def test_refine_empty_input_is_noop(wep_small):
    nep, mats, fv, backward = wep_small
    lams, Q, errs = newton_refine(mats, fv, np.zeros(0, complex),
                                  np.zeros((nep.n, 0), complex),
                                  tol=1e-9, errmeasure=backward)
    assert len(lams) == 0 and len(errs) == 0
