"""Dtype-policy tests — the translation of the reference's type-promotion
contract (``test/compute_types.jl``; promotion rule ``NEPTypes.jl:162-170``):
``dtype(result) == result_type(dtype(lam), dtype(operands))``, solvers honor
their ``dtype`` argument, and real-mode runs stay real."""
import jax.numpy as jnp
import numpy as np
import pytest

import neptpu
from neptpu import compute_Mder, compute_Mlincomb, compute_MM, nep_gallery

PROBS = {
    "dep0": nep_gallery("dep0"),
    "pep0": nep_gallery("pep0", 12),
    "qdep1": nep_gallery("qdep1"),
}

LAMS = {
    "f32": np.float32(0.3),
    "f64": np.float64(0.3),
    "c64": np.complex64(0.3 + 0.1j),
    "c128": np.complex128(0.3 + 0.1j),
}


def _dense(M):
    return M if isinstance(M, jnp.ndarray) else M.to_dense()


@pytest.mark.parametrize("pname", sorted(PROBS))
@pytest.mark.parametrize("lname", sorted(LAMS))
def test_mder_promotion(pname, lname):
    nep = PROBS[pname]
    lam = LAMS[lname]
    M = _dense(compute_Mder(nep, jnp.asarray(lam)))
    expect = jnp.result_type(lam, nep.bank.dtype)
    assert jnp.result_type(M.dtype, expect) == M.dtype  # no silent downcast
    if np.dtype(lam).kind == "f":
        # real lambda on real operands stays real
        assert not jnp.iscomplexobj(M) or jnp.iscomplexobj(jnp.zeros((), nep.bank.dtype))


@pytest.mark.parametrize("pname", sorted(PROBS))
def test_mlincomb_promotion(pname):
    nep = PROBS[pname]
    n = nep.n
    V = np.ones((n, 2))
    # complex lambda must give complex result
    z = compute_Mlincomb(nep, 0.3 + 0.2j, V, np.ones(2))
    assert jnp.iscomplexobj(z)
    # real lambda, real V, real operands -> real result for DEP/PEP fast paths
    z2 = compute_Mlincomb(nep, jnp.float64(0.3), jnp.asarray(V), jnp.ones(2))
    M0 = _dense(compute_Mder(nep, jnp.float64(0.3)))
    M1 = _dense(compute_Mder(nep, jnp.float64(0.3), 1))
    want = M0 @ V[:, 0] + M1 @ V[:, 1]
    np.testing.assert_allclose(np.asarray(z2), np.asarray(want), rtol=1e-8, atol=1e-10)


def test_mm_promotion():
    nep = PROBS["dep0"]
    S = np.diag([0.1, 0.2]).astype(np.float64)
    V = np.ones((nep.n, 2))
    Z = compute_MM(nep, S, V)
    assert Z.shape == (nep.n, 2)
    Zc = compute_MM(nep, S + 0.1j * np.eye(2), V)
    assert jnp.iscomplexobj(Zc)


def test_solver_dtype_argument():
    """newton(dtype=...) controls the iteration arithmetic
    (reference ``newton(Float64, nep)``)."""
    nep = nep_gallery("real_quadratic")
    lam_r, v_r = neptpu.newton(nep, dtype=np.float64, lam=-4.0, v=np.ones(4), tol=1e-12, maxit=50)
    assert np.asarray(lam_r).dtype == np.float64
    assert np.asarray(v_r).dtype == np.float64
    lam_c, v_c = neptpu.newton(nep, dtype=np.complex128, lam=-4.0, v=np.ones(4), tol=1e-12, maxit=50)
    assert np.asarray(lam_c).dtype == np.complex128
    assert abs(complex(lam_c) - complex(lam_r)) < 1e-8


def test_f32_mode_runs():
    """Lower-precision arithmetic works end-to-end (the reference's Float32
    sweep analogue) at commensurately looser tolerance."""
    nep = nep_gallery("dep0")
    lam, v = neptpu.augnewton(nep, dtype=np.complex64, lam=0.0, v=np.ones(5),
                              tol=1e-4, maxit=50)
    assert np.asarray(v).dtype == np.complex64
    r = float(neptpu.compute_resnorm(nep, lam, v))
    assert r < 1e-3


# ---------------------------------------------------------------------------
# Full NEP-class x lambda-dtype sweep (reference compute_types.jl:30-80):
# for every problem class, compute_Mder/compute_Mlincomb must be consistent
# with each other at every lambda dtype, results never silently downcast
# below result_type(lam, operands), and real-lambda-real-operand runs of
# real problems stay real.
# ---------------------------------------------------------------------------


def _sweep_problems():
    import scipy.sparse as sp

    from neptpu import PEP, SPMF_NEP, SumNEP
    from neptpu.models.cheb import ChebPEP
    from neptpu.models.derspmf import DerSPMF
    from neptpu.models.helpers import REP
    from neptpu.models.projection import create_proj_NEP
    from neptpu.models.deflation import deflate_eigpair

    rng = np.random.default_rng(0)
    n = 10
    A0 = rng.standard_normal((n, n))
    A1 = rng.standard_normal((n, n))
    A2 = rng.standard_normal((n, n))
    probs = {}
    # REP's barycentric machinery is complex-valued by construction (the
    # reference sweep likewise skip-lists it for real types)
    probs["rep"] = (REP([A0, A1], [1.0, 2.0], [3.0, -1.0]), False)
    pep = PEP([A0, A1, A2])
    probs["cheb_pep"] = (ChebPEP(pep, k=6, a=-1.0, b=1.0), True)
    dep = nep_gallery("dep0_tridiag", n)
    probs["derspmf"] = (DerSPMF(dep, sigma=0.2, m=8), False)  # complex table
    probs["sum"] = (SumNEP(pep, dep), True)
    proj = create_proj_NEP(pep, maxsize=4, dtype=np.float64)
    V = np.linalg.qr(rng.standard_normal((pep.n, 3)))[0]
    proj.set_projectmatrices(V, V)
    probs["proj"] = (proj, True)
    lam0, v0 = 0.27 + 0.31j, rng.standard_normal(pep.n) + 0j
    probs["deflated"] = (deflate_eigpair(pep, lam0, v0, mode=":Generic"),
                         False)
    return probs


@pytest.mark.parametrize("lname", sorted(LAMS))
@pytest.mark.parametrize("pname", ["rep", "cheb_pep", "derspmf", "sum",
                                   "proj", "deflated"])
def test_class_sweep_mder_mlincomb_consistent(pname, lname):
    nep, is_real = _sweep_problems()[pname]
    lam = LAMS[lname]
    if pname == "derspmf" and np.dtype(lam).kind == "f":
        lam = np.complex128(lam)  # DerSPMF is built around a complex shift
    n = nep.n
    M0 = _dense(compute_Mder(nep, lam))
    M1 = _dense(compute_Mder(nep, lam, 1))
    # no silent downcast below result_type(lam, f64 operands)
    expect = jnp.result_type(np.dtype(type(np.asarray(lam).item()))
                             if np.isscalar(lam) else lam, np.float64)
    assert jnp.result_type(M0.dtype, expect) == M0.dtype, (M0.dtype, expect)
    # Mlincomb == explicit derivative combination
    rng = np.random.default_rng(1)
    V = rng.standard_normal((n, 2))
    z = np.asarray(compute_Mlincomb(nep, lam, jnp.asarray(V + 0j)))
    want = np.asarray(M0) @ V[:, 0] + np.asarray(M1) @ V[:, 1]
    np.testing.assert_allclose(z, want, rtol=1e-6, atol=1e-8)
    # real problems at real lambda stay real
    if is_real and np.dtype(lam).kind == "f":
        assert not np.iscomplexobj(np.asarray(M0)), pname
