"""Stacked-diagonal (DIA) term banks — the streaming SpMV format for banded
operators.

Gallery operators are overwhelmingly banded (tridiagonal DEPs, kron-Laplacian
dep_symm_double, the WEP FD stencils, FEM-style gun matrices).  On TPU a
gather-based CSR SpMV is latency-bound at ~4-byte random access granularity;
the DIA layout turns the same contraction into ``ndiag`` fully contiguous
fused multiply-add streams — no gathers at all — which XLA vectorizes to the
HBM bandwidth roofline.  A Pallas kernel version tiles rows into VMEM blocks
and double-buffers the shifted operand slices.

Storage: shared ``offsets (ndiag,)``; stacked ``data (m_terms, ndiag, n)``
where ``data[i, d, r] = A_i[r, r + offsets[d]]`` (zero where out of range).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DiaTermBank"]


@jax.tree_util.register_pytree_node_class
class DiaTermBank:
    is_sparse = True

    def __init__(self, data, offsets, shape, fro_norms=None):
        self.data = data  # (m, ndiag, n)
        self.offsets = tuple(int(o) for o in offsets)  # static
        self.shape = tuple(shape)
        if fro_norms is None:
            fro_norms = jnp.sqrt(jnp.sum(jnp.abs(data) ** 2, axis=(1, 2)))
        self.fro_norms = fro_norms

    @property
    def nterms(self):
        return self.data.shape[0]

    @property
    def n(self):
        return self.shape[0]

    @property
    def ndiag(self):
        return self.data.shape[1]

    @property
    def dtype(self):
        return self.data.dtype

    @classmethod
    def from_matrices(cls, mats, dtype=None):
        import scipy.sparse as sp

        mats = [sp.csr_matrix(A) if not sp.issparse(A) else A.tocsr() for A in mats]
        n = mats[0].shape[0]
        offs = sorted(set().union(*[set(A.todia().offsets.tolist()) for A in mats]))
        if dtype is None:
            dtype = np.result_type(*[A.dtype for A in mats])
        data = np.zeros((len(mats), len(offs), n), dtype=dtype)
        for i, A in enumerate(mats):
            D = A.todia()
            for od, off in enumerate(D.offsets):
                d = offs.index(off)
                # scipy dia stores data[k, j] = A[j - off, j]; we want
                # data[d, r] = A[r, r + off] -> shift by off
                col = D.data[od]
                if col.shape[0] < n:  # scipy >= 1.17 trims empty tail cols
                    col = np.pad(col, (0, n - col.shape[0]))
                if off >= 0:
                    data[i, d, : n - off] = col[off:]
                else:
                    data[i, d, -off :] = col[: n + off]
        obj = cls(jnp.asarray(data), offs, (n, n))
        obj._host_data = data  # host mirror, not part of the pytree
        return obj

    def host_csr_terms(self):
        """scipy CSR mirrors of every term, from host data when available."""
        import scipy.sparse as sp

        n = self.n
        data = (self._host_data if hasattr(self, "_host_data")
                else np.asarray(self.data))
        r = np.arange(n)
        out = []
        for i in range(data.shape[0]):
            rows, cols, vals = [], [], []
            for d, off in enumerate(self.offsets):
                rr = r[: n - off] if off >= 0 else r[-off:]
                rows.append(rr)
                cols.append(rr + off)
                vals.append(data[i, d][rr])
            out.append(sp.csr_matrix(
                (np.concatenate(vals),
                 (np.concatenate(rows), np.concatenate(cols))),
                shape=(n, n)))
        return out

    def _shifted(self, X, off):
        """rows r of result = X[r + off] (zero padded), X (n, k)."""
        n = self.shape[0]
        if off == 0:
            return X
        z = jnp.zeros((abs(off),) + X.shape[1:], dtype=X.dtype)
        if off > 0:
            return jnp.concatenate([X[off:], z], axis=0)
        return jnp.concatenate([z, X[:off]], axis=0)

    def _pallas_ok(self, dt):
        """Use the Pallas streaming kernel: TPU backend, real f32/bf16 data,
        large enough that kernel launch is amortized."""
        import os

        if os.environ.get("NEPTPU_NO_PALLAS"):
            return False
        if dt not in (jnp.float32, jnp.bfloat16):
            return False
        if self.shape[0] < 65536 or not self.offsets:
            return False
        try:
            return jax.default_backend() == "tpu"
        except Exception:
            return False

    def lincomb_apply(self, W):
        """y = sum_i A_i @ W[:, i]: ndiag streaming FMAs, no gathers.

        On TPU with real f32/bf16 operands this dispatches to the Pallas
        double-buffered streaming kernel (``ops/pallas_spmv.py``); the pure
        XLA path below is the portable fallback (CPU tests, complex dtypes).
        """
        dt = jnp.result_type(W, self.data)
        if self._pallas_ok(dt):
            from .pallas_spmv import dia_lincomb_pallas

            return dia_lincomb_pallas(
                self.data.astype(dt), self.offsets, W.astype(dt)
            )
        W = W.astype(dt)
        n = self.shape[0]
        if len(self.offsets) <= 16:
            # stencil-like banks: unrolled shifted FMA streams fuse well
            y = jnp.zeros((n,), dtype=dt)
            for d, off in enumerate(self.offsets):
                Ws = self._shifted(W, off)  # (n, m)
                y = y + jnp.sum(self.data[:, d, :].astype(dt).T * Ws, axis=1)
            return y
        # wide banks (the WEP's block-dense z coupling carries 2nz+1
        # diagonals): one padded gather + a single einsum — unrolling
        # hundreds of shift ops explodes both compile and run time
        offs = np.asarray(self.offsets)
        lo = int(max(-offs.min(), 0))
        hi = int(max(offs.max(), 0))
        Wp = jnp.zeros((n + lo + hi, W.shape[1]), dtype=dt).at[lo:lo + n].set(W)
        idx = jnp.arange(n)[:, None] + jnp.asarray(offs + lo)[None, :]
        G = Wp[idx]  # (n, ndiag, m)
        return jnp.einsum("idr,rdi->r", self.data.astype(dt), G)

    def combine(self, w):
        """sum_i w_i A_i as a new single-term DiaTermBank view (dense diag data)."""
        w = jnp.asarray(w)
        dt = jnp.result_type(w, self.data)
        nz = jnp.tensordot(w.astype(dt), self.data.astype(dt), axes=1)  # (ndiag, n)
        return DiaTermBank(nz[None], self.offsets, self.shape)

    def combine_dense(self, w):
        return self.to_dense_sum(w)

    def to_dense(self):
        """Dense matrix of a single-term bank (combined view)."""
        assert self.nterms == 1
        return self.to_dense_sum(jnp.ones((1,), dtype=self.dtype))

    def __matmul__(self, x):
        x = jnp.asarray(x)
        assert self.nterms == 1
        if x.ndim == 1:
            return self.matvec(x)
        return self.matmat(x)

    def matmat(self, X):
        dt = jnp.result_type(X, self.data)
        X = X.astype(dt)
        Y = jnp.zeros(X.shape, dtype=dt)
        for d, off in enumerate(self.offsets):
            Y = Y + self.data[0, d, :, None].astype(dt) * self._shifted(X, off)
        return Y

    def term_dense(self, i):
        return DiaTermBank(self.data[i][None], self.offsets, self.shape).to_dense()

    def term(self, i):
        """Single-term view supporting matvec/matmat/to_dense/@ (the get_Av
        operand contract)."""
        return DiaTermBank(self.data[i][None], self.offsets, self.shape)

    def lincomb_apply_mat(self, W):
        """sum_i A_i @ W[:, :, i] for W (n, k, m) -> (n, k)."""
        dt = jnp.result_type(W, self.data)
        W = W.astype(dt)
        y = jnp.zeros(W.shape[:2], dtype=dt)
        for d, off in enumerate(self.offsets):
            Ws = self._shifted(W, off)  # (n, k, m)
            y = y + jnp.einsum("in,nki->nk", self.data[:, d, :].astype(dt), Ws)
        return y

    def mm_apply(self, V, F):
        """sum_i A_i @ (V @ F_i) with F stacked (m, k, k)."""
        dt = jnp.result_type(V, F, self.data)
        VF = jnp.einsum("nk,mkl->nlm", V.astype(dt), F.astype(dt))
        return self.lincomb_apply_mat(VF)

    def matvec(self, x):
        """Single combined-matrix matvec (nterms must be 1)."""
        dt = jnp.result_type(x, self.data)
        y = jnp.zeros((self.shape[0],), dtype=dt)
        for d, off in enumerate(self.offsets):
            y = y + self.data[0, d, :].astype(dt) * self._shifted(x.astype(dt), off)
        return y

    def to_dense_sum(self, w):
        n = self.shape[0]
        M = jnp.zeros(self.shape, dtype=jnp.result_type(jnp.asarray(w), self.data))
        nz = jnp.tensordot(jnp.asarray(w), self.data.astype(M.dtype), axes=1)
        r = jnp.arange(n)
        for d, off in enumerate(self.offsets):
            rows = r[: n - off] if off >= 0 else r[-off:]
            M = M.at[rows, rows + off].add(nz[d][rows])
        return M

    def tree_flatten(self):
        return (self.data, self.fro_norms), (self.offsets, self.shape)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        data, fro = leaves
        return cls(data, aux[0], aux[1], fro)
