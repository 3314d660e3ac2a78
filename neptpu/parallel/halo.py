"""Halo-exchange row-sharded DIA term banks.

This is the real distributed ``compute_Mlincomb`` layer (BASELINE north star;
the reference has no analogue — its only parallel facility is the pluggable
quadrature of ``method_contour_common.jl:7-46``).  Design:

* the stacked-DIA bank (``ops/dia.py``) is partitioned into ``ndev``
  contiguous row blocks along the ``rows`` mesh axis — operand *and* vectors:
  every length-n object a solver touches (Krylov blocks, RHS, results) lives
  as a ``(ndev, blk)`` row-sharded array, so per-device memory shrinks
  linearly with the mesh;
* a banded operator with offsets in ``[-halo_lo, +halo_hi]`` needs only the
  ``halo_hi`` rows *after* and ``halo_lo`` rows *before* its block: those
  strips are exchanged with the two neighbours via ``jax.lax.ppermute``
  (zero-filled at the chain ends — exactly the matrix boundary);
* the contraction is split into a pure-local part (no dependency on the
  permuted strips) plus boundary-strip corrections, so XLA's latency-hiding
  scheduler overlaps the ICI transfer with the bulk of the FMA streams.

All functions here are meant to be called INSIDE a ``shard_map`` body whose
mesh has a ``rows`` axis; :func:`sharded_dia_lincomb` is the standalone
entry that wraps one call.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.dia import DiaTermBank

__all__ = [
    "ShardedDiaBank",
    "halo_exchange",
    "local_halo_lincomb",
    "sharded_dia_lincomb",
    "shard_vector",
    "unshard_vector",
]


class ShardedDiaBank:
    """DiaTermBank split into ``ndev`` contiguous row blocks.

    data:    (ndev, m, ndiag, blk) — diagonal strips per row block, where
             ``data[d, i, j, r] = A_i[s_d + r, s_d + r + offsets[j]]``
             (s_d = d * blk; zero where out of range / in the padded tail).
    offsets: static tuple shared by all terms.
    """

    def __init__(self, bank: DiaTermBank, ndev: int):
        if not hasattr(bank, "offsets"):
            raise TypeError(
                "ShardedDiaBank requires a DiaTermBank (banded operands); "
                f"got {type(bank).__name__}. Build the NEP with fmt='dia' "
                "or use RowShardedBank for general sparsity."
            )
        n = bank.n
        m = bank.nterms
        offs = bank.offsets
        blk = -(-n // ndev)
        max_off = max((abs(o) for o in offs), default=0)
        if max_off > blk:
            raise ValueError(
                f"bandwidth {max_off} exceeds row block {blk}; use fewer "
                "devices or a wider block"
            )
        data = np.zeros((m, len(offs), ndev * blk), dtype=bank.data.dtype)
        data[:, :, :n] = np.asarray(bank.data)
        # (m, ndiag, ndev, blk) -> (ndev, m, ndiag, blk)
        data = data.reshape(m, len(offs), ndev, blk).transpose(2, 0, 1, 3)
        self.data = jnp.asarray(data)
        self.offsets = tuple(int(o) for o in offs)
        self.n = n
        self.ndev = ndev
        self.blk = blk
        self.nterms = m
        self.halo_hi = max((o for o in self.offsets if o > 0), default=0)
        self.halo_lo = max((-o for o in self.offsets if o < 0), default=0)

    def device_put(self, mesh, axis: str = "rows"):
        self.data = jax.device_put(self.data, NamedSharding(mesh, P(axis)))
        return self


def shard_vector(x, ndev: int, blk: int):
    """(n,) or (n, k) -> zero-padded (ndev, blk[, k]) ready for P('rows')."""
    x = np.asarray(x)
    pad = ndev * blk - x.shape[0]
    x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], dtype=x.dtype)])
    return jnp.asarray(x.reshape((ndev, blk) + x.shape[1:]))


def unshard_vector(xs, n: int):
    """(ndev, blk[, k]) -> (n[, k])."""
    xs = np.asarray(xs)
    return xs.reshape((-1,) + xs.shape[2:])[:n]


def halo_exchange(W_d, halo_lo: int, halo_hi: int, ndev: int,
                  axis: str = "rows"):
    """Exchange boundary strips with the two chain neighbours.

    W_d: this device's (blk, ...) block.  Returns
    ``(halo_prev, halo_next)``: the last ``halo_lo`` rows of the previous
    block and the first ``halo_hi`` rows of the next block (zeros at the
    chain ends — ppermute zero-fills missing sources).
    """
    halo_prev = halo_next = None
    if halo_hi > 0:
        # every device sends its TOP strip to the previous device
        halo_next = jax.lax.ppermute(
            W_d[:halo_hi], axis, perm=[(i, i - 1) for i in range(1, ndev)]
        )
    if halo_lo > 0:
        # every device sends its BOTTOM strip to the next device
        halo_prev = jax.lax.ppermute(
            W_d[-halo_lo:], axis, perm=[(i, i + 1) for i in range(ndev - 1)]
        )
    return halo_prev, halo_next


def local_halo_lincomb(data_d, offsets, W_d, halo_prev, halo_next,
                       halo_lo: int, halo_hi: int):
    """One device's rows of ``y = sum_i A_i W[:, i]``.

    data_d (m, ndiag, blk), W_d (blk, m).  The local contraction carries no
    dependency on the halo strips, so the two ppermutes overlap with it.
    """
    blk = W_d.shape[0]
    dt = jnp.result_type(data_d.dtype, W_d.dtype)
    Wl = W_d.astype(dt)
    y = jnp.zeros((blk,), dtype=dt)
    # -- bulk: local rows only (overlaps with the ppermutes) ---------------
    for j, off in enumerate(offsets):
        Dj = data_d[:, j, :].astype(dt)  # (m, blk)
        if off == 0:
            y = y + jnp.sum(Dj.T * Wl, axis=1)
        elif off > 0:
            y = y.at[: blk - off].add(
                jnp.sum(Dj[:, : blk - off].T * Wl[off:], axis=1)
            )
        else:
            y = y.at[-off:].add(jnp.sum(Dj[:, -off:].T * Wl[:off], axis=1))
    # -- boundary corrections from the halo strips -------------------------
    for j, off in enumerate(offsets):
        Dj = data_d[:, j, :].astype(dt)
        if off > 0 and halo_next is not None:
            # rows blk-off..blk-1 read rows 0..off-1 of the next block
            y = y.at[blk - off:].add(
                jnp.sum(Dj[:, blk - off:].T * halo_next[:off].astype(dt), axis=1)
            )
        elif off < 0 and halo_prev is not None:
            # rows 0..-off-1 read the tail of the previous block
            y = y.at[: -off].add(
                jnp.sum(Dj[:, : -off].T
                        * halo_prev[halo_lo + off:].astype(dt), axis=1)
            )
    return y


from functools import lru_cache


@lru_cache(maxsize=64)
def _lincomb_fn(mesh, axis, offsets, halo_lo, halo_hi, ndev):
    """Build (and cache) the jitted shard_map body for one static config —
    repeated calls reuse the compiled executable instead of re-tracing."""

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    def body(data, W):
        W_d = W[0]  # (blk, m)
        halo_prev, halo_next = halo_exchange(W_d, halo_lo, halo_hi, ndev, axis)
        y = local_halo_lincomb(data[0], offsets, W_d, halo_prev, halo_next,
                               halo_lo, halo_hi)
        return y[None]

    return jax.jit(body)


def sharded_dia_lincomb(sbank: ShardedDiaBank, Ws, mesh, axis: str = "rows"):
    """y = sum_i A_i W[:, i] with BOTH operand and vectors row-sharded.

    Ws: (ndev, blk, m) sharded along ``axis``.  Returns (ndev, blk) sharded
    along ``axis`` — the result never leaves the mesh.
    """
    fn = _lincomb_fn(mesh, axis, sbank.offsets, sbank.halo_lo, sbank.halo_hi,
                     sbank.ndev)
    return fn(sbank.data, Ws)
