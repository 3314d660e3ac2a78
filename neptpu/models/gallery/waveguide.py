"""Waveguide eigenvalue problem (WEP) — FD discretization of the waveguide
Helmholtz equation with DtN boundary conditions (reference
``src/gallery_extra/GalleryWaveguide.jl`` + ``waveguide/``; Jarlebring/Mele/
Runborg SISC 2017, Ringh/Mele/Karlsson/Jarlebring LAA 2018).

Two formats, matching the reference:

* ``neptype="SPMF"``: 3 + 2 nz terms — Q0/Q1/Q2 polynomial part plus rank-one
  boundary terms with the branch-cut functions
  ``s_j(lam) = i sqrt(lam^2 + b_j lam + c_j) + d0``.
* ``neptype="WEP"``: the native ``WEP_FD`` with a Sylvester-form
  compute_Mlincomb (A(lam) X + X B + K .* X — pure dense GEMMs, the
  TPU-friendly layout), FFT-based R/Rinv boundary transforms, the Gegenbauer
  ``sqrt_derivative`` recurrence for arbitrary-order derivatives, and
  Schur-complement linear solvers (assembled/splu/GMRES with the
  Sylvester-SMW preconditioner).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ...core.nep import NEP
from ...ops import matfun
from ...ops.linsolve import LinSolver, LinSolverCreator
from ..spmf import SPMF_NEP

__all__ = [
    "wep_gallery",
    "wep_generate_preconditioner",
    "WEPPreconditioner",
    "SchurMatVec",
    "solve_wg_sylvester_fft",
    "WEP_FD",
    "WEPLinSolverCreator",
    "sqrt_derivative",
    "sqrt_pos_imag",
]


# -- FD discretization (reference ``waveguide_FD.jl``) ----------------------


def generate_fd_interior_mat(nx, nz, hx, hz):
    import scipy.sparse as sp

    Dxx = sp.diags([np.ones(nx - 1), -2 * np.ones(nx), np.ones(nx - 1)], [-1, 0, 1]).tolil()
    Dzz = sp.diags([np.ones(nz - 1), -2 * np.ones(nz), np.ones(nz - 1)], [-1, 0, 1]).tolil()
    Dzz[0, -1] = 1
    Dzz[-1, 0] = 1
    Dxx = (Dxx / hx**2).tocsr()
    Dzz = (Dzz / hz**2).tocsr()
    Dz = sp.diags([-np.ones(nz - 1), np.ones(nz - 1)], [-1, 1]).tolil()
    Dz[0, -1] = -1
    Dz[-1, 0] = 1
    Dz = (Dz / (2 * hz)).tocsr()
    return Dxx, Dzz, Dz


def generate_fd_boundary_mat(nx, nz, hx, hz):
    import scipy.sparse as sp

    e1 = sp.lil_matrix((nx, 1))
    e1[0, 0] = 1
    en = sp.lil_matrix((nx, 1))
    en[-1, 0] = 1
    Iz = sp.eye(nz)
    C1 = sp.hstack([sp.kron(e1, Iz), sp.kron(en, Iz)]).tocsr() / hx**2
    d1 = 2 / hx
    d2 = -1 / (2 * hx)
    vm = sp.lil_matrix((1, nx))
    vm[0, 0] = d1
    vm[0, 1] = d2
    vp = sp.lil_matrix((1, nx))
    vp[0, -1] = d1
    vp[0, -2] = d2
    C2T = sp.vstack([sp.kron(vm, Iz), sp.kron(vp, Iz)]).tocsr()
    return C1, C2T


def _wavenumber(nx, nz, wg, delta):
    if wg == "TAUSCH":
        xm, xp = 0.0 - delta, (2 / np.pi) + 0.4 + delta
        k1, k2, k3 = np.sqrt(2.3) * np.pi, np.sqrt(3) * np.pi, np.pi

        def k(x, z):
            return (
                k1 * (x <= 0)
                + k2 * (x > 0) * (x <= 2 / np.pi)
                + k2 * (x > 2 / np.pi) * (x <= 2 / np.pi + 0.4) * (z > 0.5)
                + k3 * (x > 2 / np.pi) * (z <= 0.5) * (x <= 2 / np.pi + 0.4)
                + k3 * (x > 2 / np.pi + 0.4)
            )

    elif wg == "JARLEBRING":
        xm, xp = -1.0 - delta, 1.0 + delta
        k1 = np.sqrt(2.3) * np.pi
        k2 = 2 * np.sqrt(3) * np.pi
        k3 = 4 * np.sqrt(3) * np.pi
        k4 = np.pi

        def k(x, z):
            return (
                k1 * (x <= -1)
                + k4 * (x > 1)
                + k4 * (x > 0.5) * (x <= 1) * (z <= 0.4)
                + k3 * (x > 0.0) * (x <= 0.5)
                + k3 * (x > 0.5) * (x <= 1) * (z > 0.4)
                + k3 * (x > -1) * (x <= 0.0) * (z > 0.5) * (z - x / 2 <= 1)
                + k2 * (x > -1) * (x <= 0.0) * (z > 0.5) * (z - x / 2 > 1)
                + k3 * (x > -1) * (x <= 0.0) * (z <= 0.5) * (z + x / 2 > 0)
                + k2 * (x > -1) * (x <= 0.0) * (z <= 0.5) * (z + x / 2 <= 0)
            )

    else:
        raise ValueError(f"The given Waveguide '{wg}' is not supported in 'FD' discretization.")
    zm, zp = 0.0, 1.0
    X = np.linspace(xm, xp, nx + 2)
    hx = X[1] - X[0]
    X = X[1:-1]
    Z = np.linspace(zm, zp, nz + 1)
    hz = Z[1] - Z[0]
    Z = Z[1:]
    K = k(X[None, :], Z[:, None]) ** 2
    Km = float(k(np.array(-np.inf), np.array(0.5)))
    Kp = float(k(np.array(np.inf), np.array(0.5)))
    return K, hx, hz, Km, Kp


# -- branch-cut square roots (reference ``Waveguide.jl:116-165, 580-616``) --


def sqrt_pos_imag(a):
    """Scalar sqrt on the branch with positive imaginary part."""
    a = complex(a)
    s = np.sign(a.imag)
    return np.sqrt(a) if s == 0 else s * np.sqrt(a)


def sqrt_schur_pos_imag(A):
    """Matrix square root on the positive-imaginary-part branch via the Schur
    method (Higham Alg. 6.3; reference ``sqrt_schur_pos_imag``)."""
    A = np.asarray(A)
    if A.ndim == 0 or A.size == 1:
        return np.asarray(sqrt_pos_imag(A.reshape(-1)[0])).reshape(A.shape)
    import scipy.linalg as sla

    T, Q = sla.schur(A.astype(complex), output="complex")
    n = A.shape[0]
    U = np.zeros((n, n), dtype=complex)
    for i in range(n):
        U[i, i] = sqrt_pos_imag(T[i, i])
    for j in range(1, n):
        for i in range(j - 1, -1, -1):
            temp = sum(U[i, k] * U[k, j] for k in range(i + 1, j))
            U[i, j] = (T[i, j] - temp) / (U[i, i] + U[j, j])
    return Q @ U @ Q.conj().T


def sqrt_derivative(a, b, c, d=0, x=0.0):
    """All d derivatives of sqrt(a z^2 + b z + c) at z = x via the Gegenbauer
    recurrence (reference ``sqrt_derivative``, Jarlebring App. C)."""
    if d < 0:
        raise ValueError(f"Cannot take negative derivative. d = {d}")
    aa = a
    bb = b + 2 * a * x
    cc = c + a * x**2 + b * x
    der = np.zeros(d + 1, dtype=complex)
    yi = sqrt_pos_imag(cc)
    der[0] = yi
    if d == 0:
        return der
    yip1 = bb / (2 * sqrt_pos_imag(cc))
    fact = 1.0
    der[1] = yip1 * fact
    if d == 1:
        return der
    for i in range(2, d + 1):
        m = i - 2
        yip2 = -(2 * aa * (m - 1) * yi + bb * (1 + 2 * m) * yip1) / (2 * cc * (2 + m))
        fact *= i
        yi = yip1
        yip1 = yip2
        der[i] = yip2 * fact
    return der


# -- SPMF format (reference ``assemble_waveguide_spmf_fd``) -----------------


def _R_vec(bb, x):
    return (bb * np.fft.fft(np.asarray(x).ravel()))[::-1]


def _Rinv_vec(bbinv, x):
    return np.fft.ifft(bbinv * np.asarray(x).ravel()[::-1])


def assemble_waveguide_spmf_fd(nx, nz, hx, Dxx, Dzz, Dz, C1, C2T, K, Km, Kp):
    import scipy.sparse as sp

    Ix = sp.eye(nx, dtype=complex)
    Iz = sp.eye(nz, dtype=complex)
    Q0 = sp.kron(Ix, Dzz) + sp.kron(Dxx, Iz) + sp.diags(K.ravel(order="F").astype(complex))
    Q1 = sp.kron(Ix, 2 * Dz)
    Q2 = sp.kron(Ix, Iz)
    nzz = nx * nz
    Z_small = sp.csr_matrix((2 * nz, 2 * nz), dtype=complex)
    Zc = sp.csr_matrix((nzz, 2 * nz), dtype=complex)
    ZcT = sp.csr_matrix((2 * nz, nzz), dtype=complex)
    A = [
        sp.bmat([[Q0, C1], [C2T, Z_small]]).tocsr(),
        sp.bmat([[Q1, Zc], [ZcT, Z_small]]).tocsr(),
        sp.bmat([[Q2, Zc], [ZcT, Z_small]]).tocsr(),
    ]
    p = (nz - 1) / 2
    d0 = -3 / (2 * hx)
    bvec = 4 * np.pi * 1j * np.arange(-p, p + 1)
    cM = Km**2 - 4 * np.pi**2 * np.arange(-p, p + 1) ** 2
    cP = Kp**2 - 4 * np.pi**2 * np.arange(-p, p + 1) ** 2
    bb = np.exp(-2j * np.pi * (np.arange(1, nz + 1) - 1) * (-p) / nz)

    def make_s(j, c):
        bj = bvec[j]
        cj = c[j]

        def f(S):
            S = np.asarray(S)
            scalar = S.ndim == 0
            Smat = S.reshape(1, 1) if scalar else S
            I = np.eye(Smat.shape[0], dtype=complex)
            beta = Smat @ Smat + bj * Smat + cj * I
            out = 1j * sqrt_schur_pos_imag(beta) + d0 * I
            return jnp.asarray(out[0, 0] if scalar else out)

        def derivs(lam, k):
            # f = i sqrt(lam^2 + bj lam + cj) + d0: Gegenbauer recurrence
            # (sqrt_derivative) gives all derivatives of the sqrt at lam
            der = 1j * sqrt_derivative(1.0, bj, cj, k - 1, lam)
            der[0] += d0
            return der

        return matfun.with_derivs(f, derivs)

    def _mono_derivs(d):
        def derivs(lam, k):
            import math

            out = np.zeros(k, dtype=complex)
            for j in range(min(k, d + 1)):
                out[j] = math.factorial(d) / math.factorial(d - j) * lam ** (d - j)
            return out

        return derivs

    fv = [matfun.with_derivs(matfun.eye_like, _mono_derivs(0)),
          matfun.with_derivs(lambda S: jnp.asarray(S), _mono_derivs(1)),
          matfun.with_derivs(
              lambda S: jnp.asarray(S) @ jnp.asarray(S)
              if jnp.asarray(S).ndim >= 2 else jnp.asarray(S) ** 2,
              _mono_derivs(2))]
    for j in range(nz):
        e = np.zeros(nz)
        e[j] = 1.0
        Ej = np.concatenate([_R_vec(bb, e), np.zeros(nz, dtype=complex)])
        Ejm = np.outer(Ej, np.conj(Ej) / nz)
        A.append(sp.bmat([[sp.csr_matrix((nzz, nzz), dtype=complex), Zc],
                          [ZcT, sp.csr_matrix(Ejm)]]).tocsr())
        fv.append(make_s(j, cM))
    for j in range(nz):
        e = np.zeros(nz)
        e[j] = 1.0
        Ej = np.concatenate([np.zeros(nz, dtype=complex), _R_vec(bb, e)])
        Ejm = np.outer(Ej, np.conj(Ej) / nz)
        A.append(sp.bmat([[sp.csr_matrix((nzz, nzz), dtype=complex), Zc],
                          [ZcT, sp.csr_matrix(Ejm)]]).tocsr())
        fv.append(make_s(j, cP))
    return SPMF_NEP(A, fv)


# -- native WEP_FD (reference ``Waveguide.jl:200-379``) ---------------------


class WEP(NEP):
    """Abstract marker for waveguide eigenvalue problems (reference
    ``GalleryWaveguide.jl:35``: ``abstract type WEP <: NEP end``)."""


class WEP_FD(WEP):
    def __init__(self, nx, nz, hx, hz, Dxx, Dzz, Dz, C1, C2T, K, Km, Kp):
        self.nx = nx
        self.nz = nz
        self.hx = float(hx)
        self.hz = float(hz)
        self.Dxx = jnp.asarray(Dxx.toarray())
        self.Dzz = jnp.asarray(Dzz.toarray())
        self.Dz = jnp.asarray(Dz.toarray())
        self.C1 = C1.tocsr()
        self.C2T = C2T.tocsr()
        self.k_bar = complex(np.mean(K))
        self.K = jnp.asarray(K.astype(complex) - self.k_bar)  # (nz, nx)
        p = (nz - 1) / 2
        self.p = p
        self.d0 = -3 / (2 * hx)
        self.d1 = 2 / hx
        self.d2 = -1 / (2 * hx)
        self.b = 4 * np.pi * 1j * np.arange(-p, p + 1)
        self.cM = Km**2 - 4 * np.pi**2 * np.arange(-p, p + 1) ** 2 + 0j
        self.cP = Kp**2 - 4 * np.pi**2 * np.arange(-p, p + 1) ** 2 + 0j
        self.bb = np.exp(-2j * np.pi * (np.arange(1, nz + 1) - 1) * (-p) / nz)
        self.bbinv = 1.0 / self.bb
        self.n = nx * nz + 2 * nz

    @property
    def issparse(self):
        return False

    # boundary transforms
    def R(self, x):
        return _R_vec(self.bb, x)

    def Rinv(self, x):
        return _Rinv_vec(self.bbinv, x)

    def A_op(self, lam, d=0):
        if d == 0:
            return self.Dzz + 2 * lam * self.Dz + (lam**2 + self.k_bar) * jnp.eye(self.nz)
        if d == 1:
            return 2 * self.Dz + 2 * lam * jnp.eye(self.nz)
        if d == 2:
            return 2 * jnp.eye(self.nz, dtype=complex)
        return jnp.zeros((self.nz, self.nz), dtype=complex)

    def B_op(self, lam, d=0):
        return self.Dxx if d == 0 else jnp.zeros((self.nx, self.nx), dtype=complex)

    def sM(self, lam):
        beta = lam**2 + self.b * lam + self.cM
        return 1j * np.sign(beta.imag) * np.sqrt(beta) + self.d0

    def sP(self, lam):
        beta = lam**2 + self.b * lam + self.cP
        return 1j * np.sign(beta.imag) * np.sqrt(beta) + self.d0

    def Pinv(self, lam, x):
        """Inverse of the boundary DtN operator (reference ``Pinv``)."""
        x = np.asarray(x)
        nz = self.nz
        return np.concatenate([
            self.R(self.Rinv(x[:nz]) / self.sM(lam)),
            self.R(self.Rinv(x[nz:]) / self.sP(lam)),
        ])

    def Mlincomb(self, lam, V, a=None, startder: int = 0):
        """Sylvester-form Mlincomb (reference ``Waveguide.jl:324-379``)."""
        V = np.asarray(V)
        if V.ndim == 1:
            V = V[:, None]
        na = V.shape[1]
        if a is None:
            a = np.ones(na)
        a = np.asarray(a)
        if startder != 0:
            # pad with zero columns/coefficients (the reference's generic
            # startder fallback shifts the same way)
            Vp = np.concatenate([np.zeros((V.shape[0], startder), dtype=V.dtype), V], axis=1)
            ap = np.concatenate([np.zeros(startder), np.asarray(a)])
            return self.Mlincomb(lam, Vp, ap, startder=0)
        lam = complex(np.asarray(lam))
        nx, nz = self.nx, self.nz
        max_d = na - 1
        V1 = V[: nx * nz, :]
        V1_mat = V1.reshape(nz, nx, na, order="F")
        V2 = V[nx * nz :, :]
        X0 = jnp.asarray(V1_mat[:, :, 0])
        y1_mat = (self.A_op(lam) @ X0 + X0 @ self.B_op(lam) + self.K * X0) * complex(a[0])
        for d in range(1, min(max_d, 3) + 1):
            y1_mat = y1_mat + self.A_op(lam, d) @ jnp.asarray(V1_mat[:, :, d]) * complex(a[d])
        y1 = np.asarray(y1_mat).ravel(order="F")
        y1 = y1 + self.C1 @ V2[:, 0] * a[0]

        D = np.zeros((2 * nz, na), dtype=complex)
        cMP = np.concatenate([self.cM, self.cP])
        for j in range(2 * nz):
            bbj = self.b[j % nz]
            ccj = cMP[j]
            der = 1j * sqrt_derivative(1.0, bbj, ccj, max_d, lam)
            D[j, :] = der[:na]
        y2t = (D[:, 0] + self.d0) * np.concatenate(
            [self.Rinv(V2[:nz, 0]), self.Rinv(V2[nz:, 0])]) * a[0]
        for jj in range(1, na):
            y2t = y2t + D[:, jj] * np.concatenate(
                [self.Rinv(V2[:nz, jj]), self.Rinv(V2[nz:, jj])]) * a[jj]
        y2 = np.concatenate([self.R(y2t[:nz]), self.R(y2t[nz:])])
        y2 = y2 + self.C2T @ V1[:, 0] * a[0]
        return jnp.asarray(np.concatenate([y1, y2]))

    def Mder(self, lam, der: int = 0):
        raise NotImplementedError(
            "WEP_FD exposes no assembled derivative matrices (Mder); its "
            "linear algebra runs matrix-free through the Schur-complement "
            "solvers — build solves via WEPLinSolverCreator instead."
        )


# -- WEP linear solvers (reference ``Waveguide.jl:394-567``) ----------------


class SchurMatVec:
    """v -> (A(lam) X + X B + K.*X) - C1 Pinv(C2T v) (Ringh (2.13)/(3.3))."""

    def __init__(self, nep: WEP_FD, lam):
        self.nep = nep
        self.lam = complex(lam)

    def __call__(self, v):
        nep = self.nep
        lam = self.lam
        v = np.asarray(v)
        X = v.reshape(nep.nz, nep.nx, order="F")
        Xj = jnp.asarray(X)
        top = np.asarray(nep.A_op(lam) @ Xj + Xj @ nep.B_op(lam) + nep.K * Xj).ravel(order="F")
        return top - nep.C1 @ nep.Pinv(lam, nep.C2T @ v)


def construct_WEP_schur_complement(nep: WEP_FD, lam):
    """Assembled Kronecker-form Schur complement (Ringh Prop. 3.1)."""
    import scipy.sparse as sp

    nz, nx = nep.nz, nep.nx
    lam = complex(lam)
    Pinv_minus = np.empty((nz, nz), dtype=complex)
    Pinv_plus = np.empty((nz, nz), dtype=complex)
    sMv = nep.sM(lam)
    sPv = nep.sP(lam)
    for i in range(nz):
        e = np.zeros(nz)
        e[i] = 1.0
        Pinv_minus[:, i] = nep.R(nep.Rinv(e) / sMv)
        Pinv_plus[:, i] = nep.R(nep.Rinv(e) / sPv)
    E = sp.lil_matrix((nx, nx))
    E[0, 0] = nep.d1 / nep.hx**2
    E[0, 1] = nep.d2 / nep.hx**2
    EE = sp.lil_matrix((nx, nx))
    EE[nx - 1, nx - 1] = nep.d1 / nep.hx**2
    EE[nx - 1, nx - 2] = nep.d2 / nep.hx**2
    A_l = np.asarray(nep.A_op(lam))
    B_l = np.asarray(nep.B_op(lam))
    return (sp.kron(sp.csr_matrix(B_l.T), sp.eye(nz))
            + sp.kron(sp.eye(nx), sp.csr_matrix(A_l))
            + sp.diags(np.asarray(nep.K).ravel(order="F"))
            - sp.kron(E.tocsr(), sp.csr_matrix(Pinv_minus))
            - sp.kron(EE.tocsr(), sp.csr_matrix(Pinv_plus))).tocsc()


class _WEPSolverBase(LinSolver):
    def __init__(self, nep: WEP_FD, lam):
        self.nep = nep
        self.lam = complex(lam)

    def _inner(self, rhs, tol):
        raise NotImplementedError

    def solve(self, b, tol=None):
        """Full-system solve through the Schur complement
        (Ringh Prop. 2.1 back-substitution)."""
        nep = self.nep
        lam = self.lam
        b = np.asarray(b)
        if b.ndim == 2:
            return jnp.stack([np.asarray(self.solve(b[:, j], tol=tol)) for j in range(b.shape[1])], axis=1)
        nxz = nep.nx * nep.nz
        x_int = b[:nxz]
        x_ext = b[nxz:]
        rhs = x_int - nep.C1 @ nep.Pinv(lam, x_ext)
        q = self._inner(rhs, tol if tol is not None else 1e-12)
        return jnp.asarray(np.concatenate([q, nep.Pinv(lam, -nep.C2T @ q + x_ext)]))


class WEPFactorizedLinSolver(_WEPSolverBase):
    def __init__(self, nep, lam):
        super().__init__(nep, lam)
        import scipy.sparse.linalg as spla

        self.lu = spla.splu(construct_WEP_schur_complement(nep, lam))

    def _inner(self, rhs, tol):
        return self.lu.solve(rhs.astype(complex))


class WEPBackslashLinSolver(_WEPSolverBase):
    def __init__(self, nep, lam):
        super().__init__(nep, lam)
        self.S = construct_WEP_schur_complement(nep, lam)

    def _inner(self, rhs, tol):
        import scipy.sparse.linalg as spla

        return spla.spsolve(self.S, rhs.astype(complex))


class WEPGMRESLinSolver(_WEPSolverBase):
    def __init__(self, nep, lam, preconditioner=None, reltol=1e-10, maxiter=500):
        super().__init__(nep, lam)
        self.mv = SchurMatVec(nep, lam)
        self.preconditioner = preconditioner
        self.reltol = reltol
        self.maxiter = maxiter

    def _inner(self, rhs, tol):
        import scipy.sparse.linalg as spla

        n = len(rhs)
        op = spla.LinearOperator((n, n), matvec=self.mv, dtype=complex)
        M = None
        if self.preconditioner is not None:
            M = spla.LinearOperator((n, n), matvec=self.preconditioner, dtype=complex)
        q, info = spla.gmres(op, rhs.astype(complex), rtol=self.reltol, M=M,
                             maxiter=self.maxiter)
        return q


class WEPLinSolverCreator(LinSolverCreator):
    """(reference ``WEPLinSolverCreator``): solver_type in
    :factorized (default) / :backslash / :gmres."""

    def __init__(self, solver_type=":factorized", **kwargs):
        self.solver_type = solver_type
        self.kwargs = kwargs

    def create(self, nep, lam):
        if not isinstance(nep, WEP_FD):
            raise ValueError(f"WEPLinSolver can only be used in combination with WEPs: type(nep)={type(nep)}")
        if self.solver_type == ":backslash":
            return WEPBackslashLinSolver(nep, lam)
        if self.solver_type == ":gmres":
            return WEPGMRESLinSolver(nep, lam, **self.kwargs)
        if self.solver_type == ":factorized":
            return WEPFactorizedLinSolver(nep, lam)
        raise ValueError(f"Unknown type of solver_type in linsolvercreator:{self.solver_type}")


def wep_gallery(nx=3 * 5 * 7, nz=3 * 5 * 7, benchmark_problem="TAUSCH",
                neptype="WEP", delta=0.1):
    """(reference ``nep_gallery(WEP; ...)``)."""
    if nz % 2 == 0:
        raise ValueError(f"Variable nz must be odd! You have used nz = {nz}.")
    wg = benchmark_problem.upper()
    neptype = neptype.upper()
    K, hx, hz, Km, Kp = _wavenumber(nx, nz, wg, delta)
    Dxx, Dzz, Dz = generate_fd_interior_mat(nx, nz, hx, hz)
    C1, C2T = generate_fd_boundary_mat(nx, nz, hx, hz)
    if neptype in ("SPMF", "SPMF_PRE"):
        return assemble_waveguide_spmf_fd(nx, nz, hx, Dxx, Dzz, Dz, C1, C2T, K, Km, Kp)
    if neptype == "WEP":
        return WEP_FD(nx, nz, hx, hz, Dxx, Dzz, Dz, C1, C2T, K, Km, Kp)
    raise ValueError(f"The NEP-type '{neptype}' is not supported.")


# -- Sylvester-SMW preconditioner (reference ``waveguide_preconditioner.jl``;
#    Ringh et al. Section 4-5: FFT-diagonalized Sylvester solve + a
#    Sherman-Morrison-Woodbury correction over N z-domains) ----------------


def _F_dst(v):
    """Auxiliary for W/Wh: odd extension + FFT (reference ``F``)."""
    nrow, m = v.shape
    n = nrow + 1
    pad = np.zeros((2 * n, m), dtype=complex)
    pad[1:n, :] = v
    return np.fft.fft(pad, axis=0)[1:n, :]


def _Fh_dst(v):
    nrow, m = v.shape
    n = nrow + 1
    pad = np.zeros((2 * n, m), dtype=complex)
    pad[1:n, :] = v
    return np.fft.ifft(pad, axis=0)[1:n, :] * 2 * n


def _W_dst(X):
    """Eigenvector action of Dxx (DST via FFT; reference ``W``/``Wh``)."""
    nz1 = X.shape[0]
    return (_F_dst(X) - _Fh_dst(X)) * (1j / 2.0) / np.sqrt((nz1 + 1) / 2.0)


def solve_wg_sylvester_fft(C, lam, k_bar, hx, hz):
    """FFT-diagonalized Sylvester solve A X + X B + alpha X = C for the WEP
    (reference ``solve_wg_sylvester_fft!``, Ringh Sec. 5.3)."""
    C = np.array(C, dtype=complex)
    nz, nx = C.shape
    alpha = lam**2 + k_bar
    v = np.zeros(nz, dtype=complex)
    v[0] = -2
    v[1] = 1
    v[nz - 1] = 1
    v = v / hz**2
    w = np.zeros(nz, dtype=complex)
    w[1] = 1
    w[nz - 1] = -1
    w = w * (lam / hz)
    D = np.fft.fft(v + w) + alpha
    S = -(4.0 / hx**2) * np.sin(np.pi * np.arange(1, nx + 1) / (2 * (nx + 1))) ** 2

    # change variables: C = Vh( Wh(C')' )
    C = _W_dst(C.conj().T).conj().T
    C = np.fft.ifft(C, axis=0) * np.sqrt(nx)
    # solve the diagonal matrix equation
    Z = C / (D[:, None] + S[None, :])
    # change back: C = V( W(Z')' )
    C = _W_dst(Z.conj().T).conj().T
    C = np.fft.fft(C, axis=0) / np.sqrt(nx)
    return C


def generate_smw_matrix(nep: WEP_FD, N, sigma):
    """SMW system matrix for N z-domains at shift sigma
    (reference ``generate_smw_matrix``)."""
    if nep.nz + 4 != nep.nx:
        raise ValueError(f"This implementation requires nx = nz + 4. Provided NEP has nz = {nep.nz} and nx = {nep.nx}")
    if nep.nz % N != 0:
        raise ValueError(f"Requires nz/N integer; nz = {nep.nz}, N = {N}.")
    sigma = complex(sigma)
    dd1 = nep.d1 / nep.hx**2
    dd2 = nep.d2 / nep.hx**2
    Linv = lambda rhs: solve_wg_sylvester_fft(rhs, sigma, nep.k_bar, nep.hx, nep.hz)
    sMv = nep.sM(sigma)
    sPv = nep.sP(sigma)
    Pm = lambda v: -nep.R(nep.Rinv(v) / sMv)
    Pp = lambda v: -nep.R(nep.Rinv(v) / sPv)
    K = np.asarray(nep.K)
    return _generate_smw_matrix(nep.nz, N, Linv, dd1, dd2, Pm, Pp, K)


def _smw_indexing(n, N):
    L = n // N

    def II(i):
        return slice((i - 1) * L, i * L)

    def JJ(j):
        return slice((j - 3) * L + 2, (j - 2) * L + 2)

    def JJ2(j):
        return {1: 0, 2: 1, N + 3: n + 2, N + 4: n + 3}[j]

    def k2ij(k):
        j = k % (N + 4) or (N + 4)
        i = (k - j) // (N + 4) + 1
        return i, j

    return L, II, JJ, JJ2, k2ij


def _generate_smw_matrix(n, N, Linv, dd1, dd2, Pm, Pp, K):
    nz, nx = n, n + 4
    L, II, JJ, JJ2, k2ij = _smw_indexing(n, N)
    LL = L * L
    mm = N * N + 4 * N
    M = np.zeros((mm, mm), dtype=complex)
    for k in range(1, mm + 1):
        i, j = k2ij(k)
        EEk = np.zeros((nz, nx), dtype=complex)
        ek = np.zeros(nz, dtype=complex)
        if j == 1:
            EEk[II(i), JJ2(j)] = K[II(i), JJ2(j)]
            ek[II(i)] = dd1
            EEk[:, 0] += Pm(ek)
        elif j == 2:
            EEk[II(i), JJ2(j)] = K[II(i), JJ2(j)]
            ek[II(i)] = dd2
            EEk[:, 0] += Pm(ek)
        elif j == N + 4:
            EEk[II(i), JJ2(j)] = K[II(i), JJ2(j)]
            ek[II(i)] = dd1
            EEk[:, nx - 1] += Pp(ek)
        elif j == N + 3:
            EEk[II(i), JJ2(j)] = K[II(i), JJ2(j)]
            ek[II(i)] = dd2
            EEk[:, nx - 1] += Pp(ek)
        else:
            EEk[II(i), JJ(j)] = K[II(i), JJ(j)]
        Fk = Linv(EEk)
        for kk in range(1, mm + 1):
            ii, jj = k2ij(kk)
            if jj in (1, 2, N + 3, N + 4):
                M[kk - 1, k - 1] = np.sum(Fk[II(ii), JJ2(jj)]) / L
            else:
                M[kk - 1, k - 1] = np.sum(Fk[II(ii), JJ(jj)]) / LL
    M += np.eye(mm)
    import scipy.linalg as sla

    return sla.lu_factor(M)


def solve_smw(nep: WEP_FD, M, C, sigma):
    """Solve the SMW-corrected Sylvester system (reference ``solve_smw``)."""
    sigma = complex(sigma)
    dd1 = nep.d1 / nep.hx**2
    dd2 = nep.d2 / nep.hx**2
    Linv = lambda rhs: solve_wg_sylvester_fft(rhs, sigma, nep.k_bar, nep.hx, nep.hz)
    sMv = nep.sM(sigma)
    sPv = nep.sP(sigma)
    Pm = lambda v: -nep.R(nep.Rinv(v) / sMv)
    Pp = lambda v: -nep.R(nep.Rinv(v) / sPv)
    K = np.asarray(nep.K)
    return _solve_smw(M, np.array(C, dtype=complex), Linv, dd1, dd2, Pm, Pp, K)


def _solve_smw(M, C, Linv, dd1, dd2, Pm, Pp, K):
    import scipy.linalg as sla

    mm = M[0].shape[0]
    N = int(round(np.sqrt(mm + 4) - 2))
    nz, nx = C.shape
    n = nz
    L, II, JJ, JJ2, k2ij = _smw_indexing(n, N)
    LL = L * L
    LinvC = Linv(C)
    b = np.zeros(mm, dtype=complex)
    for k in range(1, mm + 1):
        i, j = k2ij(k)
        if j in (1, 2, N + 3, N + 4):
            b[k - 1] = np.sum(LinvC[II(i), JJ2(j)]) / L
        else:
            b[k - 1] = np.sum(LinvC[II(i), JJ(j)]) / LL
    alpha = sla.lu_solve(M, b)
    Y = np.zeros((nz, nx), dtype=complex)
    for k in range(1, mm + 1):
        i, j = k2ij(k)
        ek = np.zeros(nz, dtype=complex)
        if j == 1:
            Y[II(i), 0] += alpha[k - 1] * K[II(i), 0]
            ek[II(i)] = dd1
            Y[:, 0] += alpha[k - 1] * Pm(ek)
        elif j == 2:
            Y[II(i), 1] += alpha[k - 1] * K[II(i), 1]
            ek[II(i)] = dd2
            Y[:, 0] += alpha[k - 1] * Pm(ek)
        elif j == N + 4:
            Y[II(i), nx - 1] += alpha[k - 1] * K[II(i), nx - 1]
            ek[II(i)] = dd1
            Y[:, nx - 1] += alpha[k - 1] * Pp(ek)
        elif j == N + 3:
            Y[II(i), nx - 2] += alpha[k - 1] * K[II(i), nx - 2]
            ek[II(i)] = dd2
            Y[:, nx - 1] += alpha[k - 1] * Pp(ek)
        else:
            Y[II(i), JJ(j)] += alpha[k - 1] * K[II(i), JJ(j)]
    LinvY = Linv(Y)
    return LinvC - LinvY


class WEPPreconditioner:
    """Functor preconditioner for the WEP Schur complement
    (reference ``WEP_preconditioner``/``wep_generate_preconditioner``)."""

    def __init__(self, nep: WEP_FD, N, sigma):
        self.nep = nep
        self.sigma = complex(sigma)
        self.M = generate_smw_matrix(nep, N, sigma)

    def __call__(self, v):
        nep = self.nep
        C = np.asarray(v).reshape(nep.nz, nep.nx, order="F")
        return solve_smw(nep, self.M, C, self.sigma).ravel(order="F")


def wep_generate_preconditioner(nep: WEP_FD, N, sigma):
    return WEPPreconditioner(nep, N, sigma)
