"""Sharded mixed bank + SMW shifted solve: the gun/WEP class on a mesh.

Round 2's end-to-end sharded solver (``solvers/iar_sharded.py``) was
DEP-only: pure-banded operands, pure-banded SPIKE solve.  This module
generalizes the whole pipeline to the :class:`neptpu.ops.mixed.MixedTermBank`
decomposition — banded bulk + stacked low-rank factors (boundary terms,
arrow borders, complex parts) — which is what the gun and waveguide
problems actually are:

* the DIA bulk is row-sharded with ppermute halo exchange
  (``parallel/halo.py``), unchanged;
* low-rank factors are ROW-SHARDED too: the contraction
  ``u_r = sum_n U[n, r] W[n, tidx_r]`` becomes a local partial sum + one
  ``psum`` of a length-R vector per apply; the expansion ``L @ u`` is local.
  Communication per Mlincomb: 4 halo strips + 2 psum(R) — independent of n;
* the shifted solve is SPIKE on the interleaved-real banded part
  (``parallel/spike.py``) + a Sherman-Morrison-Woodbury correction for the
  summed low-rank part (the reference's own WEP trick,
  ``waveguide_preconditioner.jl:10-120``, recast distributed): per solve one
  ``all_gather`` of 2b boundary rows + one ``psum`` of a 2R vector.

:func:`iar_real_spmf_sharded` runs the complex-as-real IAR
(``method_iar.jl:46-184`` in split re/im channels, auto theta-scaled like
``solvers/spmf_real.py``) as ONE ``shard_map``-wrapped ``lax.scan``; tests
assert sharded == serial spectra on the virtual 8-device CPU mesh.
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.partitioned import complex_lowrank_to_interleaved
from .halo import (
    ShardedDiaBank,
    halo_exchange,
    local_halo_lincomb,
    shard_vector,
)
from .spike import SpikeBandedSolver, interleave_complex_banded, \
    spike_solve_local

__all__ = ["ShardedMixedBank", "iar_real_spmf_sharded"]


def _shard2(x, ndev, blk, mesh, axis):
    """(n, k) host array -> (ndev, blk, k) device array sharded over axis."""
    xs = shard_vector(np.asarray(x), ndev, blk)
    return jax.device_put(xs, NamedSharding(mesh, P(axis)))


class ShardedMixedBank:
    """Row-sharded :class:`~neptpu.ops.mixed.MixedTermBank`: DIA bulk via
    :class:`~neptpu.parallel.halo.ShardedDiaBank`, low-rank factor stacks as
    ``(ndev, blk, R)`` shards."""

    def __init__(self, bank, ndev, mesh, axis="rows"):
        from ..ops.dia import DiaTermBank

        if not isinstance(bank.inner, DiaTermBank):
            raise TypeError(
                "sharded mixed bank needs a DIA (banded) main bank; got "
                f"{type(bank.inner).__name__} — the bulk terms are not "
                "banded/arrow-splittable at this size")
        self.sdia = ShardedDiaBank(bank.inner, ndev).device_put(mesh, axis)
        self.blk = self.sdia.blk
        self.ndev = ndev
        self.n = bank.n
        self.nterms = bank.nterms
        self.main_idx = bank.main_idx
        self.tidx_r, self.tidx_i = bank.tidx_r, bank.tidx_i

        def put(x):
            if x is None:
                return None
            return _shard2(np.asarray(x), ndev, self.blk, mesh, axis)

        self.Lr, self.Ur = put(bank.Lr), put(bank.Ur)
        self.Li, self.Ui = put(bank.Li), put(bank.Ui)


def _mixed_lincomb_split_local(sb_cfg, data_d, Lr_d, Ur_d, Li_d, Ui_d,
                               Wre_d, Wim_d, axis):
    """One device's rows of the split-channel mixed Mlincomb.

    sb_cfg: (offsets, halo_lo, halo_hi, ndev, main_idx, tidx_r, tidx_i).
    W*_d: (blk, nterms) local blocks in ORIGINAL term order.
    """
    offsets, halo_lo, halo_hi, ndev, main_idx, tidx_r, tidx_i = sb_cfg
    sel = list(main_idx)
    Wre_m = Wre_d[:, sel]
    Wim_m = Wim_d[:, sel]
    hp_re, hn_re = halo_exchange(Wre_m, halo_lo, halo_hi, ndev, axis)
    hp_im, hn_im = halo_exchange(Wim_m, halo_lo, halo_hi, ndev, axis)
    zre = local_halo_lincomb(data_d, offsets, Wre_m, hp_re, hn_re,
                             halo_lo, halo_hi)
    zim = local_halo_lincomb(data_d, offsets, Wim_m, hp_im, hn_im,
                             halo_lo, halo_hi)

    def group_u(U_d, tidx, W_d):
        # u_r = psum_d sum_n U_d[n, r] W_d[n, tidx[r]]
        part = jnp.sum(U_d * W_d[:, list(tidx)], axis=0)
        return jax.lax.psum(part, axis)

    if Lr_d is not None:
        ure = group_u(Ur_d, tidx_r, Wre_d)
        uim = group_u(Ur_d, tidx_r, Wim_d)
        zre = zre + Lr_d @ ure
        zim = zim + Lr_d @ uim
    if Li_d is not None:
        vre = group_u(Ui_d, tidx_i, Wre_d)
        vim = group_u(Ui_d, tidx_i, Wim_d)
        zre = zre - Li_d @ vim
        zim = zim + Li_d @ vre
    return zre, zim


def _smw_solve_local(spk_cfg, lu_d, piv_d, V_d, W_d, rlu, rpiv,
                     X_d, Util_d, Kinv, f_d, axis):
    """Sharded SMW solve body (call inside shard_map): SPIKE banded solve +
    psum'd low-rank correction.  f_d: (2*blk,) interleaved local RHS."""
    b, ndev = spk_cfg
    g = spike_solve_local(lu_d, piv_d, V_d, W_d, rlu, rpiv, f_d,
                          b=b, ndev=ndev, axis=axis)
    if X_d is None:
        return g
    t = jax.lax.psum(Util_d.T @ g, axis)
    return g - X_d @ (Kinv @ t)


def _assemble_sigma(mats, fv, sigma):
    """Complex banded strips + stacked complex low-rank factors of
    M(sigma) (host side, exact complex128) — the shared serial assembly,
    which keeps complex tail diagonals in the BAND (the bank's re/im split
    would leave the banded real part singular for WEP-class problems)."""
    from ..ops.partitioned import assemble_shift_parts

    parts = assemble_shift_parts(mats, fv, sigma)
    if parts is None:
        raise ValueError(
            "M(sigma) bulk is neither banded nor arrow-splittable; the "
            "sharded SPIKE+SMW solve does not apply")
    strips, offs, Lc, Uc = parts
    return strips, tuple(offs), Lc, Uc


def _build_mixed_scan(mesh, axis, sb_cfg, spk_cfg, m, nterms, has_lr,
                      has_li, has_lowrank):
    """The jitted m-step sharded mixed-bank scan (static config baked in).

    ``has_lr``/``has_li`` key the BANK's low-rank factor stacks; the SMW
    operands (X, Util, Kinv) are keyed by ``has_lowrank`` — the
    sigma-assembly's low-rank presence — which need not agree with the
    bank's (e.g. an SPMF whose only low-rank content is the imaginary part
    of a banded bulk term has bank.Li set but no SMW correction)."""
    shard = P(axis)
    rep = P()
    lr_specs = (shard, shard) if has_lr else (rep, rep)
    li_specs = (shard, shard) if has_li else (rep, rep)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=((shard,) + lr_specs + li_specs    # bank data + factors
                  + (rep, rep, rep)                 # Cre, Cim, inv_theta
                  + (shard,) * 4 + (rep, rep)       # spike lu/piv/V/W + red
                  + ((shard, shard, rep) if has_lowrank
                     else (rep, rep, rep))          # X, Util, Kinv
                  + (shard, shard)),                # v0 re/im
        out_specs=(shard, shard, rep, rep),
        check_vma=False,
    )
    def run(data, Lr, Ur, Li, Ui, Cre, Cim, inv_theta, lu, piv, Vsp, Wsp,
            rlu, rpiv, X, Util, Kinv, v0re, v0im):
        data_d = data[0]
        Lr_d = Lr[0] if has_lr else None
        Ur_d = Ur[0] if has_lr else None
        Li_d = Li[0] if has_li else None
        Ui_d = Ui[0] if has_li else None
        lu_d, piv_d, Vsp_d, Wsp_d = lu[0], piv[0], Vsp[0], Wsp[0]
        X_d = X[0] if has_lowrank else None
        Util_d = Util[0] if has_lowrank else None
        v0re_d, v0im_d = v0re[0], v0im[0]
        blk = v0re_d.shape[0]
        dt = v0re_d.dtype
        jblk = jnp.arange(m + 1)

        nrm0 = jnp.sqrt(jax.lax.psum(
            jnp.sum(v0re_d**2) + jnp.sum(v0im_d**2), axis))
        Vre = jnp.zeros((m + 1, m + 1, blk), dtype=dt).at[0, 0].set(
            v0re_d / nrm0)
        Vim = jnp.zeros((m + 1, m + 1, blk), dtype=dt).at[0, 0].set(
            v0im_d / nrm0)

        def step(carry, k):
            Vre, Vim, Hre, Him = carry
            scale = jnp.where(jblk < k, inv_theta, 0.0).astype(dt)
            ytre = jnp.roll(Vre[k - 1] * scale[:, None], 1, axis=0)
            ytim = jnp.roll(Vim[k - 1] * scale[:, None], 1, axis=0)

            WreT = Cre @ ytre - Cim @ ytim     # (nterms, blk)
            WimT = Cre @ ytim + Cim @ ytre
            zre, zim = _mixed_lincomb_split_local(
                sb_cfg, data_d, Lr_d, Ur_d, Li_d, Ui_d,
                WreT.T, WimT.T, axis)
            zre, zim = zre.astype(dt), zim.astype(dt)

            f = jnp.zeros((2 * blk,), dtype=dt)
            f = f.at[0::2].set(zre).at[1::2].set(zim)
            sol = _smw_solve_local(spk_cfg, lu_d, piv_d, Vsp_d, Wsp_d,
                                   rlu, rpiv, X_d, Util_d, Kinv, f, axis)
            yre = ytre.at[0].set(-sol[0::2])
            yim = ytim.at[0].set(-sol[1::2])

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
            step, (Vre, Vim, H0, H0), jnp.arange(1, m + 1))
        return Vre[None], Vim[None], Hre, Him

    return run


def iar_real_spmf_sharded(nep, mesh, sigma=0.0, gamma=1.0, maxit=30,
                          neigs=6, tol=None, v=None, dtype=jnp.float64,
                          axis="rows", errmeasure=None, return_info=False,
                          cost_only=False):
    """Distributed complex-as-real IAR on a mixed-bank SPMF (gun/WEP class).

    Same contract as :func:`neptpu.solvers.spmf_real.iar_real_spmf`, with
    basis, Mlincomb, orthogonalization, and the SPIKE+SMW shifted solve all
    row-sharded over ``mesh``'s ``axis``.
    """
    from ..ops.mixed import make_mixed_bank
    from ..solvers.iar_real import apply_theta, auto_theta
    from ..solvers.spmf_real import (_spmf_host_resnorm, collect_spmf_terms,
                                     finite_table_prefix, spmf_coeff_table)

    mats, fv = collect_spmf_terms(nep)
    n = mats[0].shape[0]
    m = int(maxit)
    dt = jnp.dtype(dtype)
    if dt == np.float64 and not jax.config.jax_enable_x64:
        dt = jnp.dtype(jnp.float32)  # see iar_sharded: no truncation spam
    rdt = np.dtype(dt)
    if tol is None:
        tol = 1e4 * float(jnp.finfo(dt).eps)
    ndev = int(mesh.shape[axis])

    bank = make_mixed_bank(mats, dtype=rdt, fmt="dia")  # halo needs DIA
    sbank = ShardedMixedBank(bank, ndev, mesh, axis)
    blk = sbank.blk

    # ---- distributed shifted factorization: SPIKE + SMW ------------------
    t0 = time.perf_counter()
    cstrips, coffs, Lc, Uc = _assemble_sigma(mats, fv, sigma)
    if cstrips.shape[1] < ndev * blk:
        padc = np.zeros((cstrips.shape[0], ndev * blk), dtype=cstrips.dtype)
        padc[:, : cstrips.shape[1]] = cstrips
        padc[coffs.index(0), cstrips.shape[1]:] = 1.0
        cstrips = padc
    rstrips, roffs = interleave_complex_banded(cstrips, coffs)
    spike = SpikeBandedSolver(rstrips, roffs, mesh, axis=axis, dtype=rdt)
    has_lowrank = Lc is not None
    if has_lowrank:
        Ltil, Util = complex_lowrank_to_interleaved(Lc, Uc)
        Ltil_s = _shard2(Ltil.astype(rdt), ndev, 2 * blk, mesh, axis)
        Util_s = _shard2(Util.astype(rdt), ndev, 2 * blk, mesh, axis)
        X_s = spike.solve_sharded(Ltil_s)  # (ndev, 2blk, 2R) sharded
        # K = I + Util^T X — replicated small; computed via the global view
        Xg = X_s.reshape(ndev * 2 * blk, -1)
        Ug = Util_s.reshape(ndev * 2 * blk, -1)
        K = jnp.eye(Ug.shape[1], dtype=rdt) + Ug.T @ Xg
        Kinv = jnp.linalg.inv(K)
        Kinv = jax.device_put(Kinv, NamedSharding(mesh, P()))
    else:
        zero = jnp.zeros((), dtype=rdt)
        X_s = Util_s = Kinv = zero
    jax.block_until_ready(spike.lu)
    t_fact = time.perf_counter() - t0

    # ---- coefficient table: the sharded scan runs in the theta-scaled
    # Taylor space only (constant block shift), theta fitted to the
    # per-factorial table envelope (see solvers/iar_real._step_fn)
    Cre, Cim = spmf_coeff_table(fv, sigma, gamma, m, scaled=True)
    theta = auto_theta(Cre, Cim, m, dt)
    Cre, Cim = apply_theta(Cre, Cim, theta)
    m_fin = finite_table_prefix(Cre, Cim, dt)
    if m_fin < m:
        m = m_fin
        Cre, Cim = Cre[:, : m + 1], Cim[:, : m + 1]

    if v is None:
        v = np.ones(n)
    v = np.asarray(v, dtype=complex)
    sh = NamedSharding(mesh, P(axis))
    v0re = jax.device_put(shard_vector(v.real.astype(rdt), ndev, blk), sh)
    v0im = jax.device_put(shard_vector(v.imag.astype(rdt), ndev, blk), sh)

    sb_cfg = (sbank.sdia.offsets, sbank.sdia.halo_lo, sbank.sdia.halo_hi,
              ndev, sbank.main_idx, sbank.tidx_r, sbank.tidx_i)
    spk_cfg = (spike.b, ndev)
    run = _build_mixed_scan(mesh, axis, sb_cfg, spk_cfg, m, bank.nterms,
                            sbank.Lr is not None, sbank.Li is not None,
                            has_lowrank)
    zero = jnp.zeros((), dtype=rdt)
    args = (
        sbank.sdia.data.astype(dt),
        sbank.Lr if sbank.Lr is not None else zero,
        sbank.Ur if sbank.Ur is not None else zero,
        sbank.Li if sbank.Li is not None else zero,
        sbank.Ui if sbank.Ui is not None else zero,
        jnp.asarray(Cre, dt), jnp.asarray(Cim, dt),
        jnp.asarray(1.0 / theta, dt),
        spike.lu, spike.piv, spike.V, spike.W,
        spike.r_lu[0], spike.r_lu[1],
        X_s, Util_s, Kinv,
        v0re, v0im)
    if cost_only:
        # compile (don't run) and report MEASURED flops/bytes plus the
        # exact per-step communication byte counts implied by the program's
        # own static config — the grounding for the multi-chip scaling
        # model (virtual CPU meshes cannot measure ICI).
        compiled = jax.jit(run).lower(*args).compile()
        ca = compiled.cost_analysis() or {}
        isz = np.dtype(dt).itemsize
        n_main = len(sbank.main_idx)
        halo_b = (sbank.sdia.halo_lo + sbank.sdia.halo_hi) * n_main * isz * 2
        Rr = 0 if sbank.Ur is None else int(np.asarray(sbank.Ur).shape[-1])
        Ri = 0 if sbank.Ui is None else int(np.asarray(sbank.Ui).shape[-1])
        psum_lr_b = 2 * (2 * Rr + 2 * Ri) * isz
        R2 = 0 if not has_lowrank else int(np.asarray(Util_s).shape[-1])
        spike_b = (2 * spike.b * ndev + R2) * isz
        dgks_b = 2 * (4 * (m + 1) + 1) * isz
        return {
            "flops_total": float(ca.get("flops", 0.0)),
            "bytes_total": float(ca.get("bytes accessed", 0.0)),
            "steps": m,
            "comm_per_step_per_dev_bytes": {
                "halo": halo_b, "lowrank_psum": psum_lr_b,
                "spike_gather": spike_b, "dgks_psum": dgks_b,
            },
            "ndev": ndev, "n": n, "blk": blk, "b": int(spike.b),
            "t_factorize": t_fact,
        }
    t0 = time.perf_counter()
    Vre, Vim, Hre, Him = run(*args)
    Hre_h = np.asarray(Hre, dtype=np.float64)
    Him_h = np.asarray(Him, dtype=np.float64)
    t_scan = time.perf_counter() - t0

    # ---- host Ritz extraction (identical to the serial path) -------------
    H = Hre_h[:m, :m] + 1j * Him_h[:m, :m]
    D, Z = np.linalg.eig(H)
    lams = complex(sigma) + complex(gamma) / D
    V0re = np.asarray(Vre[:, :, 0, :], dtype=np.float64)
    V0im = np.asarray(Vim[:, :, 0, :], dtype=np.float64)
    V0 = (V0re + 1j * V0im).transpose(1, 0, 2).reshape(m + 1, -1)[:, :n].T
    Q = V0[:, :m] @ Z
    Q = Q / np.linalg.norm(Q, axis=0, keepdims=True)

    rn = errmeasure if errmeasure is not None else _spmf_host_resnorm(mats, fv)
    errs = np.array([rn(lams[s], Q[:, s]) for s in range(len(lams))])
    idx = np.argsort(errs)
    nconv = int(np.sum(errs < tol))
    take = idx[: min(neigs, nconv)]
    info = {"t_factorize": t_fact, "t_scan": t_scan, "nconv": nconv,
            "errs": errs[idx], "theta": theta, "ndev": ndev}
    if return_info:
        return lams[take], Q[:, take], info
    return lams[take], Q[:, take]
