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
