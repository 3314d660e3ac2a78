"""Complex-as-real compiled IAR — the flagship single-chip TPU solver path.

This TPU generation exposes real f32/bf16 arithmetic only (no complex
dtype), so the infinite-Arnoldi iteration (reference ``src/method_iar.jl:
46-184``) is carried in split re/im channels:

* the DEP fast-path Mlincomb (reference ``NEPTypes.jl:940-968``) becomes a
  small complex coefficient table ``C[i, j] = gamma^j (-tau_i)^j e^{-tau_i
  sigma}`` applied as four real GEMMs + two real fused DIA/term-bank applies
  (which auto-select the Pallas streaming kernel on TPU);
* the shifted solve ``M(sigma)^{-1}`` becomes one real block LU of the
  ``2n x 2n`` matrix ``[[Re M, -Im M], [Im M, Re M]]`` — factored once and
  reused every step, the reference's ``FactorizeLinSolver`` role
  (``LinSolvers.jl:109-137``);
* DGKS orthogonalization against the stacked basis becomes paired real
  GEMMs (re/im parts of the conjugated inner products).

The m-step run compiles to ONE ``lax.scan`` program (static shapes, padded
basis); Ritz extraction happens once on the host.  The same kernel runs in
f64 pairs on CPU, where it must agree with the complex ``iar_scan_kernel``
to machine precision (tests/test_iar_real.py).
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.nep import compute_resnorm

__all__ = ["iar_real", "iar_real_scan", "run_iar_real", "dep_shift_block_lu",
           "dep_coeff_table"]


def _dep_host_resnorm(nep):
    """Host-side (numpy/scipy) DEP residual ||M(lam) q|| / ||q||.

    On TPU the default backend has no complex dtype, so the (off-hot-path)
    residual checks run on the host against scipy mirrors of the bank terms.
    """
    tau = np.asarray(nep.tauv, dtype=float)
    terms = [A.astype(np.float64) for A in nep.bank.host_csr_terms()]

    def resnorm(lam, q):
        # ||M(lam) q|| exactly like compute_resnorm (NEPCore.jl:275-279)
        y = -lam * q
        for t, A in zip(tau, terms):
            y = y + np.exp(-t * lam) * (A @ q)
        return float(np.linalg.norm(y))

    return resnorm


def dep_coeff_table(nep, sigma, gamma, m, scaled=False):
    """C[i, j] = gamma^j (-tau_i)^j e^{-tau_i sigma} (j = 0..m, column 0
    zeroed: the IAR linear combination starts at the first derivative).
    ``scaled`` divides column j by j! (for the Taylor-normalized kernels),
    built by a progressive row recurrence so no intermediate over/underflows.
    Returns (Cre, Cim) numpy float64."""
    tau = np.asarray(nep.tauv, dtype=float)
    C = np.zeros((len(tau), m + 1), dtype=complex)
    C[:, 0] = np.exp(-tau * complex(sigma))
    r = -complex(gamma) * tau  # per-row column ratio
    for j in range(1, m + 1):
        C[:, j] = C[:, j - 1] * (r / j if scaled else r)
    C[:, 0] = 0.0
    return np.ascontiguousarray(C.real), np.ascontiguousarray(C.imag)


def dep_shift_block_lu(nep, sigma, dtype=jnp.float32):
    """Real 2n x 2n block form of M(sigma), LU-factored on device.

    [[Re M, -Im M], [Im M, Re M]] @ [re; im] == re/im parts of M @ (re+i*im).
    M(sigma) is assembled on the HOST in complex128 (the TPU backend has no
    complex dtype and tunneled runtimes cannot fetch complex device arrays).
    """
    import scipy.sparse as sp

    sigma = complex(sigma)
    n = nep.n
    M0 = sp.coo_matrix((np.full(n, -sigma), (np.arange(n), np.arange(n))),
                       shape=(n, n)).tocsr()
    for t, A in zip(np.asarray(nep.tauv, dtype=float), nep.bank.host_csr_terms()):
        M0 = M0 + np.exp(-t * sigma) * A
    M0 = M0.tocoo()
    rdt = np.dtype(dtype)
    from .spmf_real import _block_assemble_lu

    return _block_assemble_lu(
        jnp.asarray(M0.row.astype(np.int32)),
        jnp.asarray(M0.col.astype(np.int32)),
        jnp.asarray(M0.data.real.astype(rdt)),
        jnp.asarray(M0.data.imag.astype(rdt)),
        2 * n)


@jax.tree_util.register_pytree_node_class
class DenseBlockLU:
    """Pytree wrapper of the dense real 2n x 2n block LU exposing the
    ``solve_pair`` contract the scan kernels use (block ordering
    ``[re; im]``); see also :class:`neptpu.ops.partitioned.InterleavedSMW`
    for the structure-exploiting alternative."""

    def __init__(self, lu, piv):
        self.lu, self.piv = lu, piv

    @property
    def n(self):
        return self.lu.shape[0] // 2

    def astype(self, dt):
        return DenseBlockLU(self.lu.astype(dt), self.piv)

    def solve_pair(self, zre, zim):
        n = zre.shape[0]
        sol = jax.scipy.linalg.lu_solve(
            (self.lu, self.piv), jnp.concatenate([zre, zim]))
        return sol[:n], sol[n:]

    def tree_flatten(self):
        return ((self.lu, self.piv), None)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


def as_pair_solver(lu_piv):
    """(lu, piv) tuple -> DenseBlockLU; solver objects pass through."""
    if hasattr(lu_piv, "solve_pair"):
        return lu_piv
    return DenseBlockLU(*lu_piv)


@jax.tree_util.register_pytree_node_class
class DeflationOps:
    """Compiled-kernel operands of an Effenberger invariant pair (X, S)
    (reference ``nep_deflation.jl``; Effenberger 2013) for the
    theta-scaled complex-as-real IAR.

    The extended problem Mtil(lam)[v; w] = [M v + M X (lam I - S)^{-1} w;
    X^H v] enters the scan through three precomputed pieces (all split
    re/im, complex128 on the host):

    * ``T``: block-Toeplitz ((m+1)p, (m+1)p) mapping the stacked w-blocks
      to t_l = sum_k (-gamma theta)^k R^{k+1} w_{l+k}, R = (sigma I - S)^-1
      — then the top Mlincomb is the ORDINARY bank contraction on
      v'_l = v_l + X t_l (derivatives of M X R fold into the same table);
    * ``X``: the invariant-pair basis (n, p), orthonormal;
    * ``P0 = (X^H X)^{-1} X^H`` and ``G0 = (sigma I - S) P0``: the bordered
      solve reduces to  g = M(sigma)^{-1} z,  v0 = g - X (P0 g),
      w0 = G0 g  (no extra factorization — converged pairs never
      reconverge at the cost of O(np) GEMMs per step).
    """

    def __init__(self, Tre, Tim, Xre, Xim, Pre, Pim, Gre, Gim, p):
        self.Tre, self.Tim = Tre, Tim
        self.Xre, self.Xim = Xre, Xim
        self.Pre, self.Pim = Pre, Pim
        self.Gre, self.Gim = Gre, Gim
        self.p = int(p)

    def tree_flatten(self):
        return ((self.Tre, self.Tim, self.Xre, self.Xim, self.Pre, self.Pim,
                 self.Gre, self.Gim), (self.p,))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, aux[0])

    @classmethod
    def build(cls, X, S, sigma, gamma_theta, m, dt):
        """Host-side assembly from the complex invariant pair."""
        X = np.asarray(X, dtype=complex)
        S = np.asarray(S, dtype=complex)
        p = X.shape[1]
        A = complex(sigma) * np.eye(p) - S
        R = np.linalg.inv(A)
        # P[k] = (-gamma theta)^k R^{k+1}
        T = np.zeros(((m + 1) * p, (m + 1) * p), dtype=complex)
        Pk = R.copy()
        for k in range(m + 1):
            for l in range(m + 1 - k):
                T[l * p:(l + 1) * p, (l + k) * p:(l + k + 1) * p] = Pk
            Pk = (-complex(gamma_theta)) * (R @ Pk)
        P0 = np.linalg.solve(X.conj().T @ X, X.conj().T)
        G0 = A @ P0
        as_ = lambda a: jnp.asarray(a, dt)  # noqa: E731
        return cls(as_(T.real), as_(T.imag), as_(X.real), as_(X.imag),
                   as_(P0.real), as_(P0.imag), as_(G0.real), as_(G0.imag), p)


def _step_fn(bank, m, Cre, Cim, gre, gim, solver, dt, scaled=False,
             inv_theta=1.0, defl=None):
    """One complex-as-real IAR step (shared by the full-run and chunked
    scans); ``k`` is the 1-based dynamic step index.

    ``scaled``: run in the Taylor-normalized space ``u_j = (j!/theta^j) y_j``
    — the block shift carries a constant ``1/theta`` factor instead of
    ``1/(j+1)`` and the coefficient table must be the SCALED table
    ``C[i, j] = gamma^j theta^j f_i^{(j)}(sigma) / j!`` (and the virtual
    identity coefficient gains a ``theta``).  The companion operator is
    diagonally similar to the unscaled one (same spectrum;
    ``lam = sigma + gamma / ritz`` unchanged; Ritz-vector block 0 unchanged
    since the j=0 scaling is 1).  With ``theta`` matched to the table's
    geometric envelope (``~R/gamma``, R = distance from sigma to the nearest
    singularity), the table entries stay O(1) instead of growing like
    ``j! (gamma/R)^j`` — float32 stops overflowing around order ~40 and the
    basis blocks stop under/overflowing, so the Krylov degree is no longer
    capped by the dtype (VERDICT r2 'f32 degree ceiling')."""
    jblk = jnp.arange(m + 1)

    def step(carry, k):
        Vre, Vim, Hre, Him = carry
        sj = inv_theta if scaled else 1.0 / (jblk + 1.0)
        scale = jnp.where(jblk < k, sj, 0.0).astype(dt)
        ytre = jnp.roll(Vre[k - 1] * scale[:, None], 1, axis=0)  # (m+1, n)
        ytim = jnp.roll(Vim[k - 1] * scale[:, None], 1, axis=0)

        if defl is not None:
            # Effenberger extension: fold the invariant-pair coupling into
            # the SAME bank contraction via v'_l = v_l + X t_l (DeflationOps)
            p = defl.p
            wre_f = ytre[:, -p:].reshape(-1)
            wim_f = ytim[:, -p:].reshape(-1)
            tre = (defl.Tre @ wre_f - defl.Tim @ wim_f).reshape(m + 1, p)
            tim = (defl.Tre @ wim_f + defl.Tim @ wre_f).reshape(m + 1, p)
            vpre = ytre[:, :-p] + tre @ defl.Xre.T - tim @ defl.Xim.T
            vpim = ytim[:, :-p] + tre @ defl.Xim.T + tim @ defl.Xre.T
        else:
            vpre, vpim = ytre, ytim
        # delay terms: W = Y @ C^T, complex split into four small GEMMs
        WreT = Cre @ vpre - Cim @ vpim  # (terms, n)
        WimT = Cre @ vpim + Cim @ vpre
        if hasattr(bank, "lincomb_apply_split"):  # complex-operand aware
            zre, zim = bank.lincomb_apply_split(WreT.T, WimT.T)
            zre, zim = zre.astype(dt), zim.astype(dt)
        else:
            zre = bank.lincomb_apply(WreT.T).astype(dt)  # bank may be wider
            zim = bank.lincomb_apply(WimT.T).astype(dt)
        # identity term: -gamma * y_1 (acting on the extended v'_1)
        zre = zre - gre * vpre[1] + gim * vpim[1]
        zim = zim - gre * vpim[1] - gim * vpre[1]

        xre, xim = solver.solve_pair(zre, zim)
        if defl is not None:
            # bordered solve: v0 = g - X (P0 g), w0 = (sigma I - S) P0 g
            pgre = defl.Pre @ xre - defl.Pim @ xim
            pgim = defl.Pre @ xim + defl.Pim @ xre
            w0re = defl.Gre @ xre - defl.Gim @ xim
            w0im = defl.Gre @ xim + defl.Gim @ xre
            xre = jnp.concatenate(
                [xre - (defl.Xre @ pgre - defl.Xim @ pgim), w0re])
            xim = jnp.concatenate(
                [xim - (defl.Xre @ pgim + defl.Xim @ pgre), w0im])
        yre = ytre.at[0].set(-xre)
        yim = ytim.at[0].set(-xim)

        # DGKS (two-pass CGS) in paired-real arithmetic
        wre, wim = yre.reshape(-1), yim.reshape(-1)
        VreM = Vre.reshape(m + 1, -1)
        VimM = Vim.reshape(m + 1, -1)

        def cgs(wre, wim):
            hre = VreM @ wre + VimM @ wim  # Re(conj(V) @ w)
            him = VreM @ wim - VimM @ wre  # Im(conj(V) @ w)
            wre = wre - (VreM.T @ hre - VimM.T @ him)
            wim = wim - (VreM.T @ him + VimM.T @ hre)
            return wre, wim, hre, him

        wre, wim, h1re, h1im = cgs(wre, wim)
        wre, wim, h2re, h2im = cgs(wre, wim)
        hre, him = h1re + h2re, h1im + h2im
        beta = jnp.sqrt(jnp.sum(wre**2) + jnp.sum(wim**2))
        wre, wim = wre / beta, wim / beta

        Vre = Vre.at[k].set(wre.reshape(m + 1, -1))
        Vim = Vim.at[k].set(wim.reshape(m + 1, -1))
        Hre = Hre.at[:, k - 1].set(jnp.where(jblk == k, beta, hre))
        Him = Him.at[:, k - 1].set(jnp.where(jblk == k, 0.0, him))
        return (Vre, Vim, Hre, Him), beta

    return step


def _init_carry(m, v0re, v0im, dt):
    n = v0re.shape[0]
    nrm0 = jnp.sqrt(jnp.sum(v0re**2) + jnp.sum(v0im**2))
    Vre = jnp.zeros((m + 1, m + 1, n), dtype=dt).at[0, 0].set(v0re / nrm0)
    Vim = jnp.zeros((m + 1, m + 1, n), dtype=dt).at[0, 0].set(v0im / nrm0)
    H0 = jnp.zeros((m + 1, m), dtype=dt)
    return (Vre, Vim, H0, H0)


@partial(jax.jit, static_argnames=("m", "nsteps", "scaled"))
def _scan_chunk(bank, m, nsteps, k0, carry, Cre, Cim, gre, gim, solver,
                scaled=False, inv_theta=1.0, defl=None):
    """Advance ``nsteps`` IAR steps starting at (1-based) step ``k0``."""
    dt = carry[0].dtype
    step = _step_fn(bank, m, Cre, Cim, gre, gim, solver, dt, scaled=scaled,
                    inv_theta=inv_theta, defl=defl)
    return jax.lax.scan(step, carry, k0 + jnp.arange(nsteps))[0]


@partial(jax.jit, static_argnames=("m", "scaled"))
def iar_real_scan(bank, m, Cre, Cim, gre, gim, v0re, v0im, lu, piv=None,
                  scaled=False, inv_theta=1.0):
    """Run m complex-as-real IAR steps.

    bank: term bank pytree (offsets ride in static aux data, the diagonal
    values are traced operands); its ``lincomb_apply`` drives the fused
    multi-term SpMV.  Returns (Vre, Vim, Hre, Him): padded basis
    (m+1 cols, m+1 blocks, n) pairs and the (m+1, m) Hessenberg pair.
    """
    dt = jnp.result_type(v0re.dtype, Cre.dtype)
    carry = _init_carry(m, v0re.astype(dt), v0im.astype(dt), dt)
    solver = lu if piv is None else DenseBlockLU(lu, piv)
    step = _step_fn(bank, m, Cre, Cim, gre, gim, solver, dt, scaled=scaled,
                    inv_theta=inv_theta)
    return jax.lax.scan(step, carry, jnp.arange(1, m + 1))[0]


@jax.jit
def _ravel1d(x):
    return jnp.ravel(x)


def fetch_host(x, shape=None):
    """Device -> host through a jitted ravel: 1-D outputs carry the default
    layout, which is the only one some tunneled TPU runtimes can transfer
    (scan outputs may come back tiled and hit UNIMPLEMENTED on fetch)."""
    h = np.asarray(_ravel1d(x), dtype=np.float64)
    return h if shape is None else h.reshape(shape)


def _extract_ritz(carry, k_done, m, n, sigma, gamma):
    """Host Ritz extraction from the first k_done Krylov steps:
    lam = sigma + gamma / theta, Q = V0[:, :k] @ Z (unit columns).
    Also returns the Arnoldi residual estimates
    ``|H[k, k-1]| |Z[k-1, s]|`` — a cheap RANKING of which Ritz pairs are
    worth an exact (host SpMV) residual check."""
    Vre, Vim, Hre, Him = carry
    Hre_h = fetch_host(Hre, (m + 1, m))
    Him_h = fetch_host(Him, (m + 1, m))
    H = Hre_h[:k_done, :k_done] + 1j * Him_h[:k_done, :k_done]
    D, Z = np.linalg.eig(H)
    lams = complex(sigma) + complex(gamma) / D
    beta_k = abs(Hre_h[k_done, k_done - 1] + 1j * Him_h[k_done, k_done - 1])
    ests = beta_k * np.abs(Z[k_done - 1, :])
    nv = Vre.shape[2]
    V0 = (fetch_host(Vre[:, 0, :], (m + 1, nv))
          + 1j * fetch_host(Vim[:, 0, :], (m + 1, nv))).T  # (nv, m+1)
    Q = V0[:n, :k_done] @ Z
    qn = np.linalg.norm(Q, axis=0, keepdims=True)
    Q = Q / qn
    # estimate per unit of RECOVERED eigvector norm: in the theta-scaled
    # space the diagonal similarity scales Ritz-vector components
    # non-uniformly, so the raw coordinate-space estimate can misrank a
    # converged pair; dividing by ||V0 Z_s|| makes the ranking
    # similarity-invariant
    ests = ests / np.maximum(qn[0], np.finfo(float).tiny)
    return lams, Q, ests


def _filtered_errs(lams, Q, ests, resnorm, neigs):
    """Exact residuals for the most promising pairs only: the top
    ``max(4 neigs, 16)`` by (similarity-invariant) Arnoldi estimate get a
    real ``resnorm`` call; the rest are marked inf (they sort last and
    never count as converged).  Cuts the per-peek host cost from O(k) to
    O(neigs) SpMV sweeps."""
    cap = max(4 * int(neigs), 16)
    errs = np.full(len(lams), np.inf)
    idx = np.argsort(ests)[:cap] if len(lams) > cap else range(len(lams))
    for s in idx:
        errs[s] = resnorm(lams[s], Q[:, s])
    return errs


def auto_theta(Sre, Sim, m, dt):
    """Fit the Taylor-space scale ``theta`` to a per-factorial table
    ``S[i, j] = gamma^j f_i^{(j)}(sigma) / j!``.

    The envelope ``g_j = max_i |S_ij|`` behaves like ``(gamma/R)^j`` (R =
    distance from sigma to the nearest singularity); choosing ``theta =
    exp(-slope of log g_j)`` makes the scaled table ``S_j theta^j`` O(1)
    across columns.  theta is clamped so that both ``theta^m`` (table) and
    ``theta^-m`` (basis blocks) stay well inside ``dt``'s range."""
    g = np.maximum(np.abs(Sre), np.abs(Sim)).max(axis=0)[1:]
    jj = np.arange(1, len(g) + 1, dtype=float)
    ok = np.isfinite(g) & (g > 0)
    if ok.sum() < 2:
        return 1.0
    slope = np.polyfit(jj[ok], np.log(g[ok]), 1)[0]
    theta = float(np.exp(-slope))
    # representability bound: theta^{+-m} must keep ~1e6 headroom inside
    # dt's range.  The headroom divides the POWER, not the base — the old
    # ``max**(1/m) / 4`` clamp turns degenerate once max**(1/m) < 4
    # (m >~ 64 in f32), silently forcing a distorted theta that loses the
    # whole scan's convergence at deep Krylov degrees.
    lim = (float(jnp.finfo(jnp.dtype(dt)).max) / 1e6) ** (1.0 / max(m, 1))
    if lim <= 1.0:
        return 1.0
    return float(np.clip(theta, 1.0 / lim, lim))


def apply_theta(Sre, Sim, theta):
    """Multiply column j of a table by theta^j (progressive product)."""
    Sre = np.array(Sre, dtype=np.float64, copy=True)
    Sim = np.array(Sim, dtype=np.float64, copy=True)
    acc = 1.0
    for j in range(1, Sre.shape[1]):
        acc *= theta
        Sre[:, j] *= acc
        Sim[:, j] *= acc
    return Sre, Sim


def run_iar_real(bank, m, Cre, Cim, id_coeff, v, lu_piv, dt, *, sigma, gamma,
                 neigs, tol, resnorm, n=None, check_error_every=None,
                 scaled=False, theta=1.0, defl=None, precision=None):
    """Shared complex-as-real IAR driver (DEP and SPMF front ends).

    ``id_coeff``: coefficient of the virtual ``-coeff * y_1`` identity term
    (the DEP's ``-lam I`` contributes ``gamma`` here; pure-bank SPMFs pass 0).
    ``check_error_every``: if set (and ``tol`` is finite), the m-step scan is
    split into chunks of that many steps; after each chunk the small
    Hessenberg + first-block basis rows are pulled to the host, Ritz pairs
    extracted, and residuals measured with ``resnorm`` — the run stops as
    soon as ``neigs`` pairs are below ``tol`` (the reference's
    ``check_error_every`` contract, ``method_iar.jl:110-135``), so
    time-to-tolerance pays only for the steps it needs.  Returns
    ``(lams, Q, info)`` over the converged pairs, residual-sorted.
    """
    if jnp.dtype(dt) == np.float64 and not jax.config.jax_enable_x64:
        # key constant dtypes off the x64 config: JAX would truncate each
        # f64 request to f32 with a UserWarning per constant
        dt = jnp.dtype(jnp.float32)
    solver = as_pair_solver(lu_piv)
    if hasattr(solver, "astype"):
        solver = solver.astype(dt)
    if n is None:
        n = int(solver.n)
    # precision='highest': run the scan's GEMMs at true-f32 precision — the
    # TPU default demotes f32 matmuls to single-pass bf16, which raises the
    # Krylov noise floor and costs converged pairs on hard spectra (WEP);
    # ~1.5-2x scan time for CPU-class f32 convergence
    from contextlib import nullcontext

    def _prec_ctx():
        return (jax.default_matmul_precision(precision) if precision
                else nullcontext())
    v = np.asarray(v, dtype=complex)
    id_coeff = complex(id_coeff)
    inv_theta = jnp.asarray(1.0 / float(theta), dt)
    args = (jnp.asarray(Cre, dt), jnp.asarray(Cim, dt),
            jnp.asarray(id_coeff.real, dt),
            jnp.asarray(id_coeff.imag, dt),
            solver)

    t0 = time.perf_counter()
    t_check = 0.0
    if check_error_every and np.isfinite(tol):
        chunk = int(check_error_every)
        carry = _init_carry(m, jnp.asarray(v.real, dt), jnp.asarray(v.imag, dt),
                            dt)
        k_done = 0
        lams = Q = None
        best = None  # keep the BEST peek: at deep Krylov degree the f32
        # basis can degrade, and the final extraction must not lose pairs
        # that an earlier peek had already certified
        while k_done < m:
            steps = min(chunk, m - k_done)
            with _prec_ctx():
                carry = _scan_chunk(bank, m, steps, jnp.asarray(k_done + 1),
                                    carry, *args, scaled=scaled,
                                    inv_theta=inv_theta, defl=defl)
            k_done += steps
            tc = time.perf_counter()
            lams, Q, ests = _extract_ritz(carry, k_done, m, n, sigma, gamma)
            errs = _filtered_errs(lams, Q, ests, resnorm, neigs)
            t_check += time.perf_counter() - tc
            ncv = int(np.sum(errs < tol))
            top = np.sort(errs)[: int(neigs)]
            score = (ncv, -float(np.sum(np.log10(np.maximum(top, 1e-300)))))
            if best is None or score > best[0]:
                best = (score, lams, Q, errs)
            if ncv >= neigs:
                break
        if best is not None:
            _, lams, Q, errs = best
    else:
        carry = _init_carry(m, jnp.asarray(v.real, dt),
                            jnp.asarray(v.imag, dt), dt)
        with _prec_ctx():
            carry = _scan_chunk(bank, m, m, jnp.asarray(1), carry, *args,
                                scaled=scaled, inv_theta=inv_theta,
                                defl=defl)
        k_done = m
        lams, Q, ests = _extract_ritz(carry, k_done, m, n, sigma, gamma)
        errs = _filtered_errs(lams, Q, ests, resnorm, neigs)
    t_scan = time.perf_counter() - t0

    idx = np.argsort(errs)
    nconv = int(np.sum(errs < tol)) if np.isfinite(tol) else len(errs)
    take = idx[: min(neigs, nconv)]
    info = {"t_scan": t_scan, "t_check": t_check, "nconv": nconv,
            "k_done": k_done, "errs": errs[idx]}
    return lams[take], Q[:, take], info


def iar_real(nep, sigma=0.0, gamma=1.0, maxit=30, neigs=6, tol=None, v=None,
             dtype=jnp.float32, lu_piv=None, check_error_every=None,
             errmeasure=None, return_info=False, scaled="auto"):
    """Complex-as-real IAR on a DEP (reference ``iar`` contract: returns
    converged ``(lams, Q)``, sorted by residual).

    ``lu_piv``: optionally a prefactored result of
    :func:`dep_shift_block_lu` (the factorization-reuse path).
    ``check_error_every``: stop as soon as ``neigs`` Ritz pairs pass
    ``tol``, checking every that many scan steps (host peek of the small
    Hessenberg + first-block rows); default runs all ``maxit`` steps.
    ``errmeasure``: optional ``(lam, q) -> float`` replacing the residual
    norm in convergence counting (e.g. a backward-error measure).
    """
    n = nep.n
    m = int(maxit)
    dt = jnp.dtype(dtype)
    if tol is None:
        tol = 1e4 * float(jnp.finfo(dt).eps)

    t0 = time.perf_counter()
    if lu_piv is None:
        lu_piv = dep_shift_block_lu(nep, sigma, dtype=dt)
        jax.block_until_ready(lu_piv)
    t_fact = time.perf_counter() - t0

    from .spmf_real import finite_table_prefix

    # 'auto': the classic (factorial-growth) Taylor space converges best
    # when its table is representable; fall back to the theta-scaled space
    # only when the classic table would overflow ``dt`` before ``maxit``
    # (the f32 gun/WEP regime — VERDICT r2 'f32 degree ceiling').
    if scaled == "auto":
        Cre, Cim = dep_coeff_table(nep, sigma, gamma, m, scaled=False)
        scaled = finite_table_prefix(Cre, Cim, dt) < m
    else:
        scaled = bool(scaled)
    Cre, Cim = dep_coeff_table(nep, sigma, gamma, m, scaled=scaled)
    theta = 1.0
    if scaled:
        theta = auto_theta(Cre, Cim, m, dt)
        Cre, Cim = apply_theta(Cre, Cim, theta)

    m_fin = finite_table_prefix(Cre, Cim, dt)
    if m_fin < m:
        import warnings

        warnings.warn(
            f"DEP coefficient table overflows {np.dtype(dt)} past derivative "
            f"order {m_fin}; truncating maxit {m} -> {m_fin}")
        m = m_fin
        Cre, Cim = Cre[:, : m + 1], Cim[:, : m + 1]
    if v is None:
        v = np.ones(n)

    if errmeasure is not None:
        rn = errmeasure
    else:
        try:  # backend with complex support: residuals through the protocol
            compute_resnorm(nep, complex(sigma) + 0.1j, jnp.ones(n) + 0j)

            def rn(lam, q):
                return float(compute_resnorm(nep, lam, jnp.asarray(q)))
        except Exception:  # TPU without complex: host-side scipy residuals
            rn = _dep_host_resnorm(nep)

    lams, Q, info = run_iar_real(
        nep.bank, m, Cre, Cim, gamma * theta, v, lu_piv, dt,
        sigma=sigma, gamma=gamma, neigs=neigs, tol=tol, resnorm=rn, n=n,
        check_error_every=check_error_every, scaled=scaled, theta=theta)
    info["t_factorize"] = t_fact
    if return_info:
        return lams, Q, info
    return lams, Q
