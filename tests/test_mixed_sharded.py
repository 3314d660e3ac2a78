"""Sharded mixed-bank solver path (gun/WEP class on a mesh).

Reference testing template (SURVEY.md §4): same math two ways must agree —
the fully-sharded complex-as-real IAR on the virtual 8-device CPU mesh
against the serial kernel, on both structure classes:

* WEP SPMF (arrow bulk + complex rank-one boundary terms,
  reference ``GalleryWaveguide.jl`` ``assemble_waveguide_spmf_fd``)
* gun-class (PEP bulk + real low-rank boundary + i*sqrt terms,
  reference ``NLEVP_native.jl:4-18``)
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import neptpu
from neptpu import compute_resnorm, nep_gallery
from neptpu.solvers.spmf_real import collect_spmf_terms, iar_real_spmf, \
    spmf_fun_scalars
from neptpu.parallel.mixed_sharded import iar_real_spmf_sharded


def _mesh(ndev):
    devs = jax.devices()
    if len(devs) < ndev:
        pytest.skip(f"needs {ndev} devices (xla_force_host_platform)")
    return Mesh(np.array(devs[:ndev]).reshape(ndev), ("rows",))


@pytest.mark.slow
def test_wep_sharded_matches_serial():
    # small config + moderate Krylov degree: the 8-way-oversubscribed
    # virtual CPU mesh makes basis work the wall-time driver (this test
    # alone was 519 s of the slow tier at maxit=50/nx=29)
    nep = nep_gallery("waveguide", nx=23, nz=17,
                      benchmark_problem="JARLEBRING", neptype="SPMF")
    sigma = -3 - 3.5j
    mesh = _mesh(8)
    lam_sh, Q_sh, info = iar_real_spmf_sharded(
        nep, mesh, sigma=sigma, maxit=36, neigs=3, tol=1e-8,
        dtype=jnp.float64, return_info=True)
    assert info["nconv"] >= 3
    lam_s, _ = iar_real_spmf(nep, sigma=sigma, maxit=36, neigs=3, tol=1e-8,
                             dtype=jnp.float64, scaled=True)
    lam_s = np.asarray(lam_s)
    for la in lam_sh:
        assert min(abs(la - lam_s)) < 1e-10, (la, lam_s)
    # residuals through the complex protocol
    for s in range(len(lam_sh)):
        r = float(compute_resnorm(nep, lam_sh[s], jnp.asarray(Q_sh[:, s])))
        assert r < 1e-8


@pytest.mark.slow
def test_gun_class_sharded_matches_serial():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_spmf_real import _small_gun

    nep = _small_gun()
    sigma = 30 + 1j
    mesh = _mesh(4)
    lam_sh, Q_sh, info = iar_real_spmf_sharded(
        nep, mesh, sigma=sigma, maxit=35, neigs=3, tol=1e-8,
        dtype=jnp.float64, return_info=True)
    assert info["nconv"] >= 3
    lam_s, _ = iar_real_spmf(nep, sigma=sigma, maxit=35, neigs=8, tol=1e-8,
                             dtype=jnp.float64, scaled=True)
    lam_s = np.asarray(lam_s)
    # compare the pairs nearest sigma (set tails may differ between runs)
    near = sorted(lam_sh, key=lambda la: abs(la - sigma))[:2]
    for la in near:
        assert min(abs(la - lam_s)) < 1e-9, (la, lam_s)
    for s in range(len(lam_sh)):
        r = float(compute_resnorm(nep, lam_sh[s], jnp.asarray(Q_sh[:, s])))
        assert r < 1e-7


def test_sharded_smw_solve_exact():
    """The distributed SPIKE+SMW shifted solve == scipy splu on M(sigma)."""
    import scipy.sparse.linalg as spla
    from functools import partial

    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P


    from neptpu.ops.partitioned import complex_lowrank_to_interleaved
    from neptpu.parallel.mixed_sharded import _assemble_sigma, _shard2, \
        _smw_solve_local
    from neptpu.parallel.spike import SpikeBandedSolver, \
        interleave_complex_banded

    nep = nep_gallery("waveguide", nx=17, nz=11,
                      benchmark_problem="TAUSCH", neptype="SPMF")
    mats, fv = collect_spmf_terms(nep)
    n = mats[0].shape[0]
    sigma = -1.3 - 0.31j
    mesh = _mesh(4)
    ndev = 4
    blk = -(-n // ndev)
    cstrips, coffs, Lc, Uc = _assemble_sigma(mats, fv, sigma)
    padc = np.zeros((cstrips.shape[0], ndev * blk), dtype=complex)
    padc[:, :n] = cstrips
    padc[coffs.index(0), n:] = 1.0
    rstrips, roffs = interleave_complex_banded(padc, coffs)
    spike = SpikeBandedSolver(rstrips, roffs, mesh, dtype=np.float64)
    Ltil, Util = complex_lowrank_to_interleaved(Lc, Uc)
    Ltil_s = _shard2(Ltil, ndev, 2 * blk, mesh, "rows")
    Util_s = _shard2(Util, ndev, 2 * blk, mesh, "rows")
    X_s = spike.solve_sharded(Ltil_s)
    Ug = Util_s.reshape(ndev * 2 * blk, -1)
    K = jnp.eye(Ug.shape[1]) + Ug.T @ X_s.reshape(ndev * 2 * blk, -1)
    Kinv = jnp.linalg.inv(K)

    w = spmf_fun_scalars(fv, sigma)
    Mfull = sum(wi * A.astype(complex) for wi, A in zip(w, mats)).tocsc()
    rng = np.random.default_rng(3)
    f = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    x_ref = spla.splu(Mfull).solve(f)

    fr = np.zeros(2 * ndev * blk)
    fr[0:2 * n:2] = f.real
    fr[1:2 * n:2] = f.imag
    fs = jax.device_put(jnp.asarray(fr.reshape(ndev, 2 * blk)),
                        NamedSharding(mesh, P("rows")))

    @partial(shard_map, mesh=mesh,
             in_specs=(P("rows"),) * 5 + (P(), P(), P("rows"), P("rows"),
                                          P()),
             out_specs=P("rows"), check_vma=False)
    def solve(lu, piv, V, W, fs, rlu, rpiv, X, Util, Kinv):
        return _smw_solve_local((spike.b, ndev), lu[0], piv[0], V[0], W[0],
                                rlu, rpiv, X[0], Util[0], Kinv, fs[0],
                                "rows")[None]

    xs = solve(spike.lu, spike.piv, spike.V, spike.W, fs,
               spike.r_lu[0], spike.r_lu[1], X_s, Util_s, Kinv)
    xg = np.asarray(xs).reshape(-1)[: 2 * n]
    x = xg[0::2] + 1j * xg[1::2]
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-11


def test_partitioned_smw_matches_splu():
    """Single-device partitioned banded + SMW == scipy splu (both WEP arrow
    and gun banded structures, f64 lu mode and f32 inv+refine mode)."""
    import scipy.sparse.linalg as spla

    from neptpu.ops.partitioned import build_spmf_shift_solver

    nep = nep_gallery("waveguide", nx=17, nz=11,
                      benchmark_problem="TAUSCH", neptype="SPMF")
    mats, fv = collect_spmf_terms(nep)
    n = mats[0].shape[0]
    sigma = -1.3 - 0.31j
    w = spmf_fun_scalars(fv, sigma)
    Mfull = sum(wi * A.astype(complex) for wi, A in zip(w, mats)).tocsc()
    rng = np.random.default_rng(1)
    f = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    x_ref = spla.splu(Mfull).solve(f)
    for mode, dt, tol in (("lu", jnp.float64, 1e-11),
                          ("inv", jnp.float32, 5e-5)):
        slv = build_spmf_shift_solver(mats, fv, sigma, dtype=dt, p=4,
                                      mode=mode)
        assert slv is not None
        xre, xim = slv.solve_pair(jnp.asarray(f.real, dt),
                                  jnp.asarray(f.imag, dt))
        x = np.asarray(xre) + 1j * np.asarray(xim)
        assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < tol, mode


def test_block_tridiag_solver_wide_band():
    """Block-Thomas direct solver (ops/partitioned.BlockTridiagSolver):
    exact on wide-band matrices where SPIKE's dense partition blocks would
    be orders of magnitude more expensive (the waveguide's dense z
    coupling).  f64 'lu' regime — the unpivoted Schur recursion is gated
    out of f32 runs."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from neptpu.ops.partitioned import BlockTridiagSolver, csr_to_strips

    rng = np.random.default_rng(3)
    n, b = 700, 41
    A = sp.diags([rng.standard_normal(n - abs(o))
                  for o in range(-b, b + 1)],
                 list(range(-b, b + 1))).tocsr() + 10 * sp.eye(n)
    strips, offs = csr_to_strips(A)
    slv = BlockTridiagSolver(strips, offs)
    f = rng.standard_normal((n, 3))
    x = np.asarray(slv.solve(jnp.asarray(f)))
    x_ref = spla.splu(A.tocsc()).solve(f)
    assert np.linalg.norm(x - x_ref) < 1e-12 * np.linalg.norm(x_ref)
    y = np.asarray(slv.matvec(jnp.asarray(f)))
    assert np.linalg.norm(y - A @ f) < 1e-12 * np.linalg.norm(A @ f)


@pytest.mark.slow
def test_wep_reference_large_scale_solve():
    """The reference's own largest WEP debug configuration
    (test/wep_large.jl: nx=119, nz=115) — the structure-exploiting shifted
    solve must be exact at that scale (f64, CPU)."""
    import scipy.sparse.linalg as spla

    from neptpu.ops.partitioned import build_spmf_shift_solver

    nep = nep_gallery("waveguide", nx=119, nz=115,
                      benchmark_problem="JARLEBRING", neptype="SPMF")
    mats, fv = collect_spmf_terms(nep)
    sigma = -3 - 3.5j
    n = nep.n
    slv = build_spmf_shift_solver(mats, fv, sigma, dtype=jnp.float64,
                                  mode="lu")
    assert slv is not None
    rng = np.random.default_rng(0)
    f = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    w = spmf_fun_scalars(fv, sigma)
    Mfull = sum(wi * A.astype(complex) for wi, A in zip(w, mats)).tocsc()
    x_ref = spla.splu(Mfull).solve(f)
    xre, xim = slv.solve_pair(jnp.asarray(f.real), jnp.asarray(f.imag))
    x = np.asarray(xre) + 1j * np.asarray(xim)
    assert np.linalg.norm(x - x_ref) < 1e-9 * np.linalg.norm(x_ref)
