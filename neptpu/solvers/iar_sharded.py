"""Fully-sharded complex-as-real IAR — the end-to-end multi-chip solver.

Every length-n object (Krylov basis blocks, Mlincomb operands, the shifted
solve) lives row-sharded over the mesh's ``rows`` axis; per-device memory is
``O((m+1)^2 n / ndev)`` and shrinks linearly with the mesh.  Per IAR step the
communication is:

* 4 ``ppermute`` halo strips (re/im x prev/next) inside the banded Mlincomb
  (``parallel/halo.py``), overlapped with the local FMA streams;
* 1 ``all_gather`` of 2b boundary rows inside the SPIKE shifted solve
  (``parallel/spike.py``) — the distributed replacement for the reference's
  cached UMFPACK factorization (``LinSolvers.jl:109-137``);
* 3 ``psum`` reductions for the DGKS Gram pair and the norm.

The m-step run compiles to ONE ``shard_map``-wrapped ``lax.scan``; the math
is identical to ``solvers/iar_real.py`` (reference ``method_iar.jl:46-184``
in split re/im channels), and tests assert sharded == serial spectra on the
virtual 8-device CPU mesh.
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel.halo import (
    ShardedDiaBank,
    halo_exchange,
    local_halo_lincomb,
    shard_vector,
)
from ..parallel.spike import (
    SpikeBandedSolver,
    interleave_complex_banded,
    spike_solve_local,
)
from .iar_real import _dep_host_resnorm, dep_coeff_table

__all__ = ["iar_real_sharded", "dep_sigma_strips"]


def dep_sigma_strips(nep, sigma):
    """Complex diagonal strips of M(sigma) = -sigma I + sum_i A_i e^{-tau_i
    sigma} for a DEP over a DiaTermBank (host-side, O(ndiag * n))."""
    bank = nep.bank
    tau = np.asarray(nep.tauv, dtype=float)
    w = np.exp(-tau * complex(sigma))
    data = np.asarray(bank.data)
    strips = np.tensordot(w, data.astype(complex), axes=1)  # (ndiag, n)
    offsets = list(bank.offsets)
    if 0 in offsets:
        strips[offsets.index(0)] -= complex(sigma)
    else:
        extra = np.full((1, strips.shape[1]), -complex(sigma))
        strips = np.concatenate([strips, extra], axis=0)
        offsets = offsets + [0]
    return strips, tuple(offsets)


def _build_scan(mesh, axis, offsets, halo_lo, halo_hi, ndev, b2, m):
    """The jitted m-step sharded scan (all static config baked in)."""

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis),                      # bank data
                  P(), P(), P(), P(),           # Cre, Cim, gre, gim
                  P(axis), P(axis), P(axis), P(axis),  # spike lu/piv/V/W
                  P(), P(),                     # reduced lu, piv
                  P(axis), P(axis)),            # v0 re/im
        out_specs=(P(axis), P(axis), P(), P()),
        check_vma=False,
    )
    def run(data, Cre, Cim, gre, gim, lu, piv, Vsp, Wsp, rlu, rpiv,
            v0re, v0im):
        data_d = data[0]
        lu_d, piv_d, Vsp_d, Wsp_d = lu[0], piv[0], Vsp[0], Wsp[0]
        v0re_d, v0im_d = v0re[0], v0im[0]
        blk = v0re_d.shape[0]
        dt = v0re_d.dtype
        jblk = jnp.arange(m + 1)

        nrm0 = jnp.sqrt(jax.lax.psum(
            jnp.sum(v0re_d**2) + jnp.sum(v0im_d**2), axis))
        Vre = jnp.zeros((m + 1, m + 1, blk), dtype=dt).at[0, 0].set(v0re_d / nrm0)
        Vim = jnp.zeros((m + 1, m + 1, blk), dtype=dt).at[0, 0].set(v0im_d / nrm0)

        def step(carry, k):
            Vre, Vim, Hre, Him = carry
            scale = jnp.where(jblk < k, 1.0 / (jblk + 1.0), 0.0).astype(dt)
            ytre = jnp.roll(Vre[k - 1] * scale[:, None], 1, axis=0)  # (m+1, blk)
            ytim = jnp.roll(Vim[k - 1] * scale[:, None], 1, axis=0)

            # delay terms: four small local GEMMs -> (terms, blk)
            WreT = Cre @ ytre - Cim @ ytim
            WimT = Cre @ ytim + Cim @ ytre
            # halo-exchange banded Mlincomb, both channels
            Wre_d = WreT.T  # (blk, terms)
            Wim_d = WimT.T
            hp_re, hn_re = halo_exchange(Wre_d, halo_lo, halo_hi, ndev, axis)
            hp_im, hn_im = halo_exchange(Wim_d, halo_lo, halo_hi, ndev, axis)
            zre = local_halo_lincomb(data_d, offsets, Wre_d, hp_re, hn_re,
                                     halo_lo, halo_hi).astype(dt)
            zim = local_halo_lincomb(data_d, offsets, Wim_d, hp_im, hn_im,
                                     halo_lo, halo_hi).astype(dt)
            # identity term: -gamma * y_1
            zre = zre - gre * ytre[1] + gim * ytim[1]
            zim = zim - gre * ytim[1] - gim * ytre[1]

            # SPIKE shifted solve on the row-interleaved real form
            f = jnp.zeros((2 * blk,), dtype=dt)
            f = f.at[0::2].set(zre).at[1::2].set(zim)
            sol = spike_solve_local(lu_d, piv_d, Vsp_d, Wsp_d, rlu, rpiv, f,
                                    b=b2, ndev=ndev, axis=axis)
            yre = ytre.at[0].set(-sol[0::2])
            yim = ytim.at[0].set(-sol[1::2])

            # DGKS (two-pass CGS), Gram products psum'ed over the mesh
            wre, wim = yre.reshape(-1), yim.reshape(-1)
            VreM = Vre.reshape(m + 1, -1)
            VimM = Vim.reshape(m + 1, -1)

            def cgs(wre, wim):
                hre = jax.lax.psum(VreM @ wre + VimM @ wim, axis)
                him = jax.lax.psum(VreM @ wim - VimM @ wre, axis)
                wre = wre - (VreM.T @ hre - VimM.T @ him)
                wim = wim - (VreM.T @ him + VimM.T @ hre)
                return wre, wim, hre, him

            wre, wim, h1re, h1im = cgs(wre, wim)
            wre, wim, h2re, h2im = cgs(wre, wim)
            hre, him = h1re + h2re, h1im + h2im
            beta = jnp.sqrt(jax.lax.psum(
                jnp.sum(wre**2) + jnp.sum(wim**2), axis))
            wre, wim = wre / beta, wim / beta

            Vre = Vre.at[k].set(wre.reshape(m + 1, blk))
            Vim = Vim.at[k].set(wim.reshape(m + 1, blk))
            Hre = Hre.at[:, k - 1].set(jnp.where(jblk == k, beta, hre))
            Him = Him.at[:, k - 1].set(jnp.where(jblk == k, 0.0, him))
            return (Vre, Vim, Hre, Him), beta

        H0 = jnp.zeros((m + 1, m), dtype=dt)
        (Vre, Vim, Hre, Him), _ = jax.lax.scan(
            step, (Vre, Vim, H0, H0), jnp.arange(1, m + 1)
        )
        return Vre[None], Vim[None], Hre, Him

    return run


def iar_real_sharded(nep, mesh, sigma=0.0, gamma=1.0, maxit=30, neigs=6,
                     tol=None, v=None, dtype=jnp.float64, axis: str = "rows",
                     return_info=False):
    """Distributed complex-as-real IAR on a banded DEP.

    Same contract as :func:`neptpu.solvers.iar_real.iar_real`, but with the
    Krylov basis, Mlincomb, orthogonalization, and the shifted direct solve
    all row-sharded over ``mesh``'s ``axis``.
    """
    n = nep.n
    m = int(maxit)
    dt = jnp.dtype(dtype)
    if dt == np.float64 and not jax.config.jax_enable_x64:
        # key the constant dtype off the x64 config instead of letting JAX
        # truncate each f64 request with a UserWarning per constant
        dt = jnp.dtype(jnp.float32)
    if tol is None:
        tol = 1e4 * float(jnp.finfo(dt).eps)
    ndev = int(mesh.shape[axis])

    sbank = ShardedDiaBank(nep.bank, ndev).device_put(mesh, axis)
    blk = sbank.blk

    # distributed shifted factorization (SPIKE on the interleaved real form)
    t0 = time.perf_counter()
    cstrips, coffs = dep_sigma_strips(nep, sigma)
    if cstrips.shape[1] < ndev * blk:  # pad to the sharded length
        padc = np.zeros((cstrips.shape[0], ndev * blk), dtype=cstrips.dtype)
        padc[:, : cstrips.shape[1]] = cstrips
        j0 = coffs.index(0)
        padc[j0, cstrips.shape[1]:] = 1.0
        cstrips = padc
    rstrips, roffs = interleave_complex_banded(cstrips, coffs)
    spike = SpikeBandedSolver(rstrips, roffs, mesh, axis=axis,
                              dtype=np.dtype(dt))
    jax.block_until_ready(spike.lu)
    t_fact = time.perf_counter() - t0

    Cre, Cim = dep_coeff_table(nep, sigma, gamma, m)
    if v is None:
        v = np.ones(n)
    v = np.asarray(v, dtype=complex)
    sh = NamedSharding(mesh, P(axis))
    v0re = jax.device_put(shard_vector(v.real.astype(np.dtype(dt)), ndev, blk), sh)
    v0im = jax.device_put(shard_vector(v.imag.astype(np.dtype(dt)), ndev, blk), sh)

    run = _build_scan(mesh, axis, sbank.offsets, sbank.halo_lo, sbank.halo_hi,
                      ndev, spike.b, m)
    t0 = time.perf_counter()
    Vre, Vim, Hre, Him = run(
        sbank.data.astype(dt),
        jnp.asarray(Cre, dt), jnp.asarray(Cim, dt),
        jnp.asarray(float(np.real(gamma)), dt),
        jnp.asarray(float(np.imag(gamma)), dt),
        spike.lu, spike.piv, spike.V, spike.W,
        spike.r_lu[0], spike.r_lu[1],
        v0re, v0im,
    )
    Hre_h = np.asarray(Hre, dtype=np.float64)
    Him_h = np.asarray(Him, dtype=np.float64)
    t_scan = time.perf_counter() - t0

    # host Ritz extraction (identical to iar_real)
    H = Hre_h[:m, :m] + 1j * Him_h[:m, :m]
    D, Z = np.linalg.eig(H)
    lams = complex(sigma) + complex(gamma) / D
    # first-block basis rows: (ndev, m+1, blk) -> (m+1, n)
    V0re = np.asarray(Vre[:, :, 0, :], dtype=np.float64)
    V0im = np.asarray(Vim[:, :, 0, :], dtype=np.float64)
    V0 = (V0re + 1j * V0im).transpose(1, 0, 2).reshape(m + 1, -1)[:, :n].T
    Q = V0[:, :m] @ Z
    Q = Q / np.linalg.norm(Q, axis=0, keepdims=True)

    rn = _dep_host_resnorm(nep)
    errs = np.array([rn(lams[s], Q[:, s]) for s in range(len(lams))])
    idx = np.argsort(errs)
    nconv = int(np.sum(errs < tol))
    take = idx[: min(neigs, nconv)]
    info = {"t_factorize": t_fact, "t_scan": t_scan, "nconv": nconv,
            "errs": errs[idx]}
    if return_info:
        return lams[take], Q[:, take], info
    return lams[take], Q[:, take]
