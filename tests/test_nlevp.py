"""NLEVP-native gallery tests (reference ``test/fiber_native.jl``,
``test/cd_player.jl`` analogues)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

import neptpu
from neptpu import compute_Mlincomb, compute_resnorm, nep_gallery

# gallery data ships vendored in neptpu/data; the gate only matters for
# exotic setups where the package data was stripped
from neptpu.models.gallery.examples import data_dir
HAS_DATA = os.path.exists(os.path.join(data_dir(), "converted_nlevp"))


@pytest.mark.slow
def test_fiber_oracle():
    """lam_ref = 7.139494306065948e-07, |lam - lam_ref| < 1e-10
    (reference ``test/fiber_native.jl:10-22``)."""
    nep = nep_gallery("nlevp_native_fiber")
    assert nep.n == 2400
    sol_val = 7.139494306065948e-07
    lam, v = neptpu.quasinewton(nep, lam=7.14e-7, v=np.ones(nep.n),
                                armijo_factor=0.5, armijo_max=10, maxit=100)
    assert abs(complex(lam) - sol_val) < 1e-10
    # real arithmetic is maintained
    vv = np.real(np.asarray(v) / np.asarray(v)[0])
    lam1, v1 = neptpu.resinv(nep, dtype=np.float64, lam=7.14e-7, v=vv, maxit=100)
    assert abs(complex(lam1) - sol_val) < 1e-10
    assert np.asarray(v1).dtype == np.float64


@pytest.mark.skipif(not HAS_DATA, reason="gallery data files not present")
def test_cd_player():
    nep = nep_gallery("nlevp_native_cd_player")
    assert nep.n == 60
    lam, v = neptpu.newton(nep, lam=-1e5, v=np.ones(nep.n), maxit=50, tol=1e-10)
    r = float(compute_resnorm(nep, lam, v)) / float(jnp.linalg.norm(v))
    assert r < 1e-6


def test_hadeler():
    nep = nep_gallery("nlevp_native_hadeler")
    assert nep.n == 8
    # hadeler is symmetric with real eigenvalues; mslp finds one
    lam, v = neptpu.mslp(nep, lam=10.0, tol=1e-10)
    assert float(compute_resnorm(nep, lam, v)) < 1e-6


def test_loaded_string():
    nep = nep_gallery("nlevp_native_loaded_string")
    assert nep.n == 20
    x = np.ones(20)
    z1 = np.asarray(compute_Mlincomb(nep, 1.3, x[:, None], np.ones(1)))
    z2 = np.asarray(nep.Mder_dense(1.3)) @ x
    np.testing.assert_allclose(z1, z2, rtol=1e-10)
    lam, v = neptpu.augnewton(nep, lam=4.0, v=np.ones(20), maxit=100, armijo_factor=0.9)
    assert float(compute_resnorm(nep, lam, v)) / float(jnp.linalg.norm(v)) < 1e-10


def test_pdde_stability():
    nep = nep_gallery("nlevp_native_pdde_stability")
    assert nep.n == 225
    lams, V = neptpu.polyeig(nep)
    lams = np.asarray(lams)
    V = np.asarray(V)
    i = np.argmin(np.abs(lams - 1.0))
    r = float(compute_resnorm(nep, lams[i], jnp.asarray(V[:, i])))
    assert r / np.linalg.norm(V[:, i]) < 1e-8


def test_gun_like_structure():
    nep = nep_gallery("gun_like")
    assert nep.n == 9956  # gun dimension (from the W1/W2 data files)
    # SPMF structure: 4 terms (K, -M, W1 sqrt, W2 sqrt)
    assert len(nep.get_Av()) == 4
    x = np.ones(nep.n)
    lam = 150.0**2 + 1.0j  # the gun run starting point
    z = np.asarray(compute_Mlincomb(nep, lam, x[:, None], np.ones(1)))
    assert np.all(np.isfinite(z))


@pytest.mark.skipif(
    not os.path.exists("/root/reference/src/gallery_extra/converted_nlevp/gun_K.txt"),
    reason="gun K/M data files not in this reference snapshot",
)
def test_gun_oracle():
    """lam_ref = 22345.116783765 + 0.644998598i (reference
    ``test/gun_native.jl:9-19``)."""
    nep = nep_gallery("nlevp_native_gun")
    lam_ref = 22345.116783765 + 0.644998598j
    lam, v = neptpu.quasinewton(nep, lam=150.0**2 + 1j, v=np.ones(nep.n),
                                tol=1e-11, maxit=100, armijo_factor=0.5)
    assert abs(complex(lam) - lam_ref) < np.sqrt(1e-11) * 100
