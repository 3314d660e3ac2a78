"""Row-partitioned sparse term banks + sharded compute_Mlincomb.

Design (BASELINE.json / SURVEY.md §2.9): the aligned-pattern stacked-CSR bank
is partitioned into contiguous row blocks, one per device along the ``rows``
mesh axis; each block's entries are padded to a common nnz so the shard_map
body is shape-static.  The input vector block-matrix V is replicated (it is
tall-skinny, k small); each device produces its row slice of
``sum_i A_i V C_i`` locally — zero communication in the matvec itself, one
psum only in the Gram/orthogonalization reductions that follow.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.sparse import SparseTermBank

__all__ = ["RowShardedBank", "sharded_lincomb_apply", "sharded_gram"]


class RowShardedBank:
    """SparseTermBank partitioned into ``ndev`` contiguous row blocks.

    data:    (ndev, m, nnz_pad)   — term values per row block
    indices: (ndev, nnz_pad)      — column indices (global)
    rows:    (ndev, nnz_pad)      — LOCAL row ids within the block
    pad entries carry data 0 and point at row 0 / col 0 (harmless adds).
    """

    def __init__(self, bank: SparseTermBank, ndev: int):
        n = bank.n
        m = bank.nterms
        self.n = n
        self.ndev = ndev
        self.nterms = m
        self.block = (n + ndev - 1) // ndev
        indptr = np.asarray(bank.indptr)
        data = np.asarray(bank.data)
        indices = np.asarray(bank.indices)
        row_ids = np.asarray(bank.row_ids)
        # split entries at row-block boundaries
        bounds = [min(d * self.block, n) for d in range(ndev + 1)]
        starts = [indptr[b] for b in bounds]
        nnz_pad = max(starts[d + 1] - starts[d] for d in range(ndev))
        nnz_pad = max(nnz_pad, 1)
        D = np.zeros((ndev, m, nnz_pad), dtype=data.dtype)
        I = np.zeros((ndev, nnz_pad), dtype=np.int32)
        R = np.zeros((ndev, nnz_pad), dtype=np.int32)
        for d in range(ndev):
            s, e = starts[d], starts[d + 1]
            ln = e - s
            D[d, :, :ln] = data[:, s:e]
            I[d, :ln] = indices[s:e]
            R[d, :ln] = row_ids[s:e] - bounds[d]
        self.data = jnp.asarray(D)
        self.indices = jnp.asarray(I)
        self.rows = jnp.asarray(R)
        self.n_padded = self.block * ndev

    def device_put(self, mesh, axis: str = "rows"):
        """Place the leading (device) axis on the mesh's row axis."""
        sh = NamedSharding(mesh, P(axis))
        self.data = jax.device_put(self.data, sh)
        self.indices = jax.device_put(self.indices, sh)
        self.rows = jax.device_put(self.rows, sh)
        return self


def _local_lincomb(data, indices, rows, W, block):
    """One device's row-block of sum_i A_i W[:, i].

    data (m, nnz), indices (nnz,), rows (nnz,), W (n, m) replicated.
    """
    G = W[indices, :]  # (nnz, m) gather from the replicated W
    prod = jnp.sum(G * data.T, axis=1)
    return jax.ops.segment_sum(prod, rows, num_segments=block)


def sharded_lincomb_apply(sbank: RowShardedBank, W, mesh):
    """y = sum_i A_i W[:, i], row-sharded over the mesh.  Returns the full
    (gathered) vector of length n."""
    block = sbank.block

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("rows"), P("rows"), P("rows"), P()),
        out_specs=P("rows"),
        check_vma=False,
    )
    def body(data, indices, rows, Wrep):
        y_local = _local_lincomb(data[0], indices[0], rows[0], Wrep, block)
        return y_local[None, :]

    y = body(sbank.data, sbank.indices, sbank.rows, jnp.asarray(W))
    return y.reshape(-1)[: sbank.n]


def sharded_gram(Vblocks, wblock, mesh):
    """h = V^H w with V, w row-sharded: local dots + psum over 'rows'
    (the orthogonalization reduction kernel)."""

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("rows"), P("rows")),
        out_specs=P(),
        check_vma=False,
    )
    def body(Vl, wl):
        return jax.lax.psum(Vl.conj().T @ wl, "rows")

    return body(Vblocks, wblock)
