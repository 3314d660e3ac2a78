"""TPU-native sparse operand storage for SPMF-form problems.

Design (not a port): the reference keeps per-term ``SparseMatrixCSC`` operands
and exploits *aligned sparsity patterns* so that assembling ``M(lambda)`` is a
pure nzval-axpy (reference ``src/NEPTypes.jl:244-274,343-360``).  Here that idea
becomes the *default* storage: all terms of an SPMF bank share ONE index set and
their values live in a stacked ``(m, nnz)`` array.  Everything a solver needs is
then expressible as three fused primitives that XLA maps well to TPU:

* ``combine(w)``        -> nzvals = w @ data           (assembly, a tiny GEMM)
* ``lincomb_apply(W)``  -> y = A_i @ W[:, i] summed    (the compute_Mlincomb hot op:
                           one gather + elementwise + segment-sum)
* ``mm_apply(V, F)``    -> sum_i A_i (V @ F_i)          (block residual compute_MM)

Two interchangeable backends:

* ``DenseTermBank``  — stacked ``(m, n, n)`` dense tensor.  For moderate n this
  is the fastest thing on TPU (pure MXU), and it is what the LU-based linear
  solvers consume anyway.
* ``SparseTermBank`` — aligned CSR (shared indices, stacked data) driving the
  gather/segment-sum kernels; the Pallas row-blocked kernel in
  ``neptpu/ops/pallas_spmv.py`` plugs in underneath for the benchmark path.

Both are registered pytrees so they jit/vmap/shard transparently.
"""
from __future__ import annotations

import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "CSR",
    "DenseTermBank",
    "SparseTermBank",
    "make_term_bank",
    "spmv",
    "spmm",
]


def _to_scipy_csr(A, n=None):
    import scipy.sparse as sp

    if sp.issparse(A):
        return A.tocsr()
    A = np.asarray(A)
    return sp.csr_matrix(A)


@jax.tree_util.register_pytree_node_class
class CSR:
    """A single CSR matrix as a pytree (data, indices, row_ids; indptr aux-free).

    ``row_ids`` (the COO row index per stored entry, in CSR order) is kept
    explicitly because the TPU kernel is gather + segment-sum, not
    pointer-chasing.
    """

    def __init__(self, data, indices, row_ids, indptr, shape):
        self.data = data
        self.indices = indices
        self.row_ids = row_ids
        self.indptr = indptr
        self.shape = tuple(shape)

    @property
    def nnz(self):
        return self.data.shape[-1]

    @property
    def dtype(self):
        return self.data.dtype

    @classmethod
    def from_scipy(cls, A, dtype=None):
        A = _to_scipy_csr(A)
        A.sum_duplicates()
        data = np.asarray(A.data)
        if dtype is not None:
            data = data.astype(dtype)
        indptr = np.asarray(A.indptr, dtype=np.int32)
        row_ids = np.repeat(np.arange(A.shape[0], dtype=np.int32), np.diff(indptr))
        return cls(
            jnp.asarray(data),
            jnp.asarray(A.indices, dtype=jnp.int32),
            jnp.asarray(row_ids),
            jnp.asarray(indptr),
            A.shape,
        )

    def to_dense(self):
        out = jnp.zeros(self.shape, dtype=self.dtype)
        return out.at[self.row_ids, self.indices].add(self.data)

    def matvec(self, x):
        return spmv(self, x)

    def matmat(self, X):
        return spmm(self, X)

    def tree_flatten(self):
        return (self.data, self.indices, self.row_ids, self.indptr), (self.shape,)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, aux[0])


def spmv(A: CSR, x):
    """y = A @ x via gather + segment-sum (XLA fuses this well on TPU)."""
    prod = A.data * x[A.indices]
    return jax.ops.segment_sum(prod, A.row_ids, num_segments=A.shape[0])


def spmm(A: CSR, X):
    """Y = A @ X for X of shape (n, k)."""
    prod = A.data[:, None] * X[A.indices, :]
    return jax.ops.segment_sum(prod, A.row_ids, num_segments=A.shape[0])


# ---------------------------------------------------------------------------
# Term banks: the stacked-operand abstraction behind every SPMF-form NEP type.
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class DenseTermBank:
    """Stacked dense operands ``A`` of shape (m, n, n)."""

    is_sparse = False

    def __init__(self, A, fro_norms=None):
        self.A = A
        if fro_norms is None:
            fro_norms = jnp.sqrt(jnp.sum(jnp.abs(A) ** 2, axis=(1, 2)))
        self.fro_norms = fro_norms

    def host_csr_terms(self):
        """scipy CSR mirrors of every term, from host data when available."""
        import scipy.sparse as sp

        A = self._host_A if hasattr(self, "_host_A") else np.asarray(self.A)
        return [sp.csr_matrix(A[i]) for i in range(A.shape[0])]

    @property
    def nterms(self):
        return self.A.shape[0]

    @property
    def n(self):
        return self.A.shape[1]

    @property
    def dtype(self):
        return self.A.dtype

    def term_dense(self, i):
        return self.A[i]

    def term(self, i):
        return self.A[i]

    def combine(self, w):
        """sum_i w_i A_i as a dense (n, n) matrix."""
        w = jnp.asarray(w)
        return jnp.tensordot(w, self.A.astype(jnp.result_type(w, self.A)), axes=1)

    def lincomb_apply(self, W):
        """sum_i A_i @ W[:, i] for W of shape (n, m)."""
        dt = jnp.result_type(W, self.A)
        return jnp.einsum("mij,jm->i", self.A.astype(dt), W.astype(dt))

    def lincomb_apply_mat(self, W):
        """sum_i A_i @ W[:, :, i] for W of shape (n, k, m) -> (n, k)."""
        dt = jnp.result_type(W, self.A)
        return jnp.einsum("mij,jkm->ik", self.A.astype(dt), W.astype(dt))

    def mm_apply(self, V, F):
        """sum_i A_i @ (V @ F_i) with F stacked (m, k, k)."""
        dt = jnp.result_type(V, F, self.A)
        VF = jnp.einsum("nk,mkl->mnl", V.astype(dt), F.astype(dt))
        return jnp.einsum("mij,mjl->il", self.A.astype(dt), VF)

    def tree_flatten(self):
        return (self.A, self.fro_norms), ()

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


@jax.tree_util.register_pytree_node_class
class SparseTermBank:
    """Aligned-pattern CSR bank: shared indices, stacked data (m, nnz).

    This is the reference's ``form_aligned_sparsity_patterns`` idea
    (``NEPTypes.jl:244-274``) promoted to the primary storage format.
    """

    is_sparse = True

    def __init__(self, data, indices, row_ids, indptr, shape, fro_norms=None):
        self.data = data  # (m, nnz)
        self.indices = indices
        self.row_ids = row_ids
        self.indptr = indptr
        self.shape = tuple(shape)
        if fro_norms is None:
            fro_norms = jnp.sqrt(jnp.sum(jnp.abs(data) ** 2, axis=1))
        self.fro_norms = fro_norms

    @property
    def nterms(self):
        return self.data.shape[0]

    @property
    def n(self):
        return self.shape[0]

    @property
    def nnz(self):
        return self.data.shape[1]

    @property
    def dtype(self):
        return self.data.dtype

    @classmethod
    def from_matrices(cls, mats: Sequence[Any], dtype=None):
        """Align the sparsity patterns of ``mats`` (scipy sparse / ndarray)."""
        import scipy.sparse as sp

        mats = [_to_scipy_csr(A) for A in mats]
        n, m = mats[0].shape
        # Union pattern: sum of |A_i| patterns.
        pattern = sp.csr_matrix((n, m))
        for A in mats:
            P = A.copy()
            P.data = np.ones_like(P.data)
            pattern = pattern + P
        pattern = pattern.tocsr()
        pattern.sum_duplicates()
        pattern.sort_indices()
        nnz = pattern.nnz
        if dtype is None:
            dtype = np.result_type(*[A.dtype for A in mats])
        data = np.zeros((len(mats), nnz), dtype=dtype)
        # Scatter each matrix's values into the union slot positions
        # (vectorized: CSR entries sorted by (row, col) <=> sorted global keys).
        indptr = pattern.indptr
        prow = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
        pkeys = prow * m + pattern.indices.astype(np.int64)
        for i, A in enumerate(mats):
            A = A.tocsr()
            A.sum_duplicates()
            A.sort_indices()
            arow = np.repeat(np.arange(n, dtype=np.int64), np.diff(A.indptr))
            akeys = arow * m + A.indices.astype(np.int64)
            pos = np.searchsorted(pkeys, akeys)
            np.add.at(data[i], pos, A.data)
        row_ids = np.repeat(np.arange(n, dtype=np.int32), np.diff(indptr))
        obj = cls(
            jnp.asarray(data),
            jnp.asarray(pattern.indices, dtype=jnp.int32),
            jnp.asarray(row_ids),
            jnp.asarray(indptr, dtype=jnp.int32),
            (n, m),
        )
        # host mirror (NOT part of the pytree): lets off-hot-path consumers
        # (residual oracles, 2n x 2n shift assembly) avoid a device->host
        # round trip, which a tunneled TPU runtime may not even support
        obj._host = (data, np.asarray(pattern.indices, dtype=np.int64),
                     np.asarray(indptr, dtype=np.int64))
        return obj

    def host_csr_terms(self):
        """scipy CSR mirrors of every term, from host data when available."""
        import scipy.sparse as sp

        if hasattr(self, "_host"):
            data, indices, indptr = self._host
        else:  # reconstructed pytree: fall back to a device fetch
            data = np.asarray(self.data)
            indices = np.asarray(self.indices)
            indptr = np.asarray(self.indptr)
        # copies: consumers may mutate (eliminate_zeros etc.) and all terms
        # share one pattern — aliasing would corrupt the bank's host mirror
        return [sp.csr_matrix(
                    (data[i].copy(), indices.copy(), indptr.copy()),
                    shape=self.shape)
                for i in range(data.shape[0])]

    def term_csr(self, i):
        return CSR(self.data[i], self.indices, self.row_ids, self.indptr, self.shape)

    def term(self, i):
        return self.term_csr(i)

    def term_dense(self, i):
        return self.term_csr(i).to_dense()

    def combine(self, w):
        """sum_i w_i A_i as a CSR with the shared pattern (nzval contraction)."""
        w = jnp.asarray(w)
        dt = jnp.result_type(w, self.data)
        nz = jnp.tensordot(w, self.data.astype(dt), axes=1)
        return CSR(nz, self.indices, self.row_ids, self.indptr, self.shape)

    def combine_dense(self, w):
        return self.combine(w).to_dense()

    def lincomb_apply(self, W):
        """sum_i A_i @ W[:, i]: ONE gather + elementwise + segment-sum."""
        dt = jnp.result_type(W, self.data)
        G = W.astype(dt)[self.indices, :]  # (nnz, m)
        prod = jnp.sum(G * self.data.astype(dt).T, axis=1)  # (nnz,)
        return jax.ops.segment_sum(prod, self.row_ids, num_segments=self.shape[0])

    def lincomb_apply_mat(self, W):
        """sum_i A_i @ W[:, :, i] for W (n, k, m) -> (n, k)."""
        dt = jnp.result_type(W, self.data)
        G = W.astype(dt)[self.indices, :, :]  # (nnz, k, m)
        prod = jnp.einsum("nkm,mn->nk", G, self.data.astype(dt))
        return jax.ops.segment_sum(prod, self.row_ids, num_segments=self.shape[0])

    def mm_apply(self, V, F):
        """sum_i A_i @ (V @ F_i) with F stacked (m, k, k)."""
        dt = jnp.result_type(V, F, self.data)
        VF = jnp.einsum("nk,mkl->nlm", V.astype(dt), F.astype(dt))  # (n, k, m)
        return self.lincomb_apply_mat(VF)

    def to_dense_bank(self):
        n = self.shape[0]
        A = jnp.zeros((self.nterms,) + self.shape, dtype=self.dtype)
        A = A.at[:, self.row_ids, self.indices].add(self.data)
        return DenseTermBank(A, self.fro_norms)

    def tree_flatten(self):
        return (
            (self.data, self.indices, self.row_ids, self.indptr, self.fro_norms),
            (self.shape,),
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        data, indices, row_ids, indptr, fro = leaves
        return cls(data, indices, row_ids, indptr, aux[0], fro)


def make_term_bank(mats: Sequence[Any], dtype=None, prefer_sparse=None,
                   fmt=None):
    """Build the right TermBank for a list of operands.

    ``prefer_sparse=None`` auto-selects: sparse storage iff all operands are
    scipy-sparse (mirrors the reference, where SPMF types follow the operand
    storage; ``NEPTypes.jl:178-241``).  Among sparse formats, banded operand
    sets with few shared diagonals get the stacked-DIA layout (streaming
    SpMV, no gathers — ~100x the gather-CSR path on TPU); ``fmt`` forces
    "dia"/"csr"/"dense".
    """
    import scipy.sparse as sp

    seq = list(mats)
    if len(seq) == 0:
        raise ValueError("term bank needs at least one operand")
    all_sparse = all(sp.issparse(A) for A in seq)
    if prefer_sparse is None:
        prefer_sparse = all_sparse
    if fmt == "dense":
        prefer_sparse = False
    if prefer_sparse:
        from .dia import DiaTermBank

        if fmt == "dia":
            return DiaTermBank.from_matrices(seq, dtype=dtype)
        if fmt is None:
            # auto: banded with few diagonals -> DIA
            n = seq[0].shape[0]
            offs = set()
            banded = True
            for A in seq:
                Ac = A.tocoo()
                d = np.unique(Ac.col.astype(np.int64) - Ac.row.astype(np.int64))
                if len(d) > 48:
                    banded = False
                    break
                offs.update(d.tolist())
            if banded and len(offs) <= 48 and n >= 512:
                return DiaTermBank.from_matrices(seq, dtype=dtype)
        return SparseTermBank.from_matrices(seq, dtype=dtype)
    dense = []
    for A in seq:
        if sp.issparse(A):
            A = A.toarray()
        dense.append(np.asarray(A))
    if dtype is None:
        dtype = np.result_type(*[A.dtype for A in dense])
    A_host = np.stack([A.astype(dtype) for A in dense])
    bank = DenseTermBank(jnp.asarray(A_host))
    bank._host_A = A_host  # host mirror, not part of the pytree
    return bank
