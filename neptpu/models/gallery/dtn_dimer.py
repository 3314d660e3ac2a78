"""DtN Helmholtz resonances with Bessel-quotient functions (reference
``src/gallery_extra/load_dtn_dimer.jl`` + ``petsc_naive_bin_read.jl``;
Araujo-Cabarcas/Engström/Jarlebring JCAM 2018).  The FEM matrices must be
downloaded externally (as in the reference); includes the naive PETSc binary
reader."""
from __future__ import annotations

import os

import numpy as np

import jax.numpy as jnp

from ...core.nep import NEP, mlincomb_from_mder
from ...ops import matfun
from ..spmf import SPMF_NEP
from ..sumnep import SumNEP

__all__ = ["naive_petsc_read", "BesselNEP", "load_dtn_dimer"]

_MAT_CLASSID = 1211216
_VEC_CLASSID = 1211214


def naive_petsc_read(filename, int_dtype=">i4", float_dtype=">c16"):
    """Load a PETSc binary sparse matrix or vector
    (reference ``naive_petsc_read``)."""
    import scipy.sparse as sp

    with open(filename, "rb") as f:
        class_id = int(np.fromfile(f, dtype=int_dtype, count=1)[0])
        if class_id == _MAT_CLASSID:
            rows, cols, nnz = (int(x) for x in np.fromfile(f, dtype=int_dtype, count=3))
            row_lens = np.fromfile(f, dtype=int_dtype, count=rows).astype(np.int64)
            indptr = np.concatenate([[0], np.cumsum(row_lens)])
            indices = np.fromfile(f, dtype=int_dtype, count=nnz).astype(np.int64)
            vals = np.fromfile(f, dtype=float_dtype, count=nnz).astype(complex)
            return sp.csr_matrix((vals, indices, indptr), shape=(rows, cols))
        if class_id == _VEC_CLASSID:
            rows = int(np.fromfile(f, dtype=int_dtype, count=1)[0])
            return np.fromfile(f, dtype=float_dtype, count=rows).astype(complex)
        raise ValueError(
            "Unsupported class_id. This function can only load sparse arrays and vectors."
        )


def _besselh(nu, z):
    from scipy.special import hankel1

    return hankel1(nu, z)


def besselh_quotient(nu, s):
    """besselh'(nu, s) / besselh(nu, s) (scalar; reference
    ``besselh_quotient``)."""
    Fder = 0.5 * (_besselh(nu - 1, s) - _besselh(nu + 1, s))
    return Fder / _besselh(nu, s)


def besselh_quotient_der(nu, s):
    Fdd = 0.25 * (_besselh(nu - 2, s) - 2 * _besselh(nu, s) + _besselh(nu + 2, s))
    Fd = 0.5 * (_besselh(nu - 1, s) - _besselh(nu + 1, s))
    F = _besselh(nu, s)
    return (Fdd * F - Fd * Fd) / F**2


class BesselNEP(NEP):
    """DtN part: sum_i P_i * (-s B'_m(s)/B_m(s)) (reference ``BesselNEP``)."""

    def __init__(self, Q, P, ind2, n):
        self.Q = np.asarray(Q)
        self.P = P
        self.ind2 = list(ind2)
        self.n = n

    def Mder(self, lam, der: int = 0):
        lam = complex(lam)
        import scipy.sparse as sp

        A = sp.csr_matrix((self.n, self.n), dtype=complex)
        for i, m in enumerate(self.ind2):
            if der == 0:
                fval = -lam * besselh_quotient(m, lam)
            elif der == 1:
                fval = -besselh_quotient(m, lam) - lam * besselh_quotient_der(m, lam)
            else:
                raise NotImplementedError("Higher derivatives not implemented")
            A = A + fval * self.P[i]
        from ...ops.sparse import CSR

        return CSR.from_scipy(A)

    def Mder_dense(self, lam, der: int = 0):
        return self.Mder(lam, der).to_dense()

    def Mlincomb(self, lam, V, a=None, startder: int = 0):
        V = np.asarray(V)
        if V.ndim == 1:
            V = V[:, None]
        if a is None:
            a = np.ones(V.shape[1])
        lam = complex(lam)
        nq = len(self.ind2)
        v = np.zeros(self.n, dtype=complex)
        for j in range(V.shape[1]):
            d = j + startder
            W = self.Q[:, :nq].conj().T @ V[:, j]
            z = np.empty(nq, dtype=complex)
            for i, m in enumerate(self.ind2):
                if d == 0:
                    z[i] = W[i] * (-lam * besselh_quotient(m, lam))
                elif d == 1:
                    z[i] = W[i] * (-besselh_quotient(m, lam) - lam * besselh_quotient_der(m, lam))
                else:
                    raise NotImplementedError("Higher derivatives not implemented")
            v += a[j] * (self.Q[:, :nq] @ z)
        return jnp.asarray(v)


def load_dtn_dimer(data_dir, l=40):
    """(reference ``load_dtn_dimer``); requires the externally downloaded
    K.bin/M.bin/q*.bin FEM data."""
    import scipy.sparse as sp

    kpath = os.path.join(data_dir, "K.bin")
    if not os.path.exists(kpath):
        raise FileNotFoundError(
            f"dtn_dimer data not found in {data_dir}; download the FEM matrices "
            "as described in the reference (Araujo-Cabarcas et al. 2018)"
        )
    A = naive_petsc_read(kpath)
    M = naive_petsc_read(os.path.join(data_dir, "M.bin"))
    n = A.shape[0]
    q1 = naive_petsc_read(os.path.join(data_dir, "q1.bin"))
    start_dtn = int(np.flatnonzero(np.abs(q1) > 0)[0])
    files = sorted(f for f in os.listdir(data_dir) if f.startswith("q"))
    mid = round((len(files) - 1) / 2 + 1)
    l = min(mid - 1, l)
    ind = np.arange(mid - l, mid + l + 1)
    ind2 = ind - mid
    Q = np.empty((n, len(ind)), dtype=complex)
    P = []
    for i, idx in enumerate(ind):
        q = naive_petsc_read(os.path.join(data_dir, f"q{idx}.bin")) / np.sqrt(2 * np.pi)
        Q[:, i] = q
        qnz = q[start_dtn:]
        Qnz = sp.csr_matrix(np.outer(qnz, np.conj(qnz)))
        I, J = Qnz.nonzero()
        P.append(sp.csr_matrix((Qnz[I, J].A1, (I + start_dtn, J + start_dtn)), shape=(n, n)))
    nep1 = SPMF_NEP([A, M], [matfun.eye_like,
                             lambda S: -(jnp.asarray(S) @ jnp.asarray(S)) if jnp.asarray(S).ndim >= 2 else -jnp.asarray(S) ** 2])
    nep2 = BesselNEP(Q, P, ind2, n)
    return SumNEP(nep1, nep2)
