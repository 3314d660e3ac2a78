"""Pallas TPU kernel for the DIA-format fused multi-term SpMV.

The hot ``compute_Mlincomb`` contraction ``y = sum_i A_i W[:, i]`` over a
stacked-diagonal bank (reference hot op: the per-term SpMV loop behind
``compute_Mlincomb``, ``NEPTypes.jl:972-1011``) becomes, per row block:

    y[r] = sum_d sum_i data[i, d, r] * W[r + off_d, i]

Design (measured on TPU v5e):

* the diagonal bank is streamed through VMEM in ``(ndiag, m, BR)`` blocks by
  the Pallas pipeline (automatic double buffering) — this is the compulsory
  HBM traffic, ``m * ndiag * n`` words;
* the operand ``W`` lives transposed-and-padded as ``(m, npad + 2*Ppad)`` in
  HBM and each row block's window (with halo ``Ppad`` on both sides) is
  DMA'd into a manually double-buffered VMEM scratch, so the copy for block
  ``i+1`` overlaps block ``i``'s compute;
* each diagonal is a static in-VMEM lane slice of the scratch — contiguous
  streams, no gathers.

This reaches ~70-85% of the HBM roofline for gun/WEP-scale banded operators
(9 stencil diagonals, 4 terms, n = 1e6: ~125 Gnnz/s per chip in f32 vs a
~171 Gnnz/s compulsory-traffic bound), ~2x over the best pure-XLA
formulation and ~6x over a gather+segment-sum CSR kernel.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "dia_lincomb_pallas",
    "dia_lincomb_pallas_padded",
    "pad_dia_data",
    "pad_dia_operand",
]

_DEFAULT_BLOCK_ROWS = 16384


def _round_up(x, m):
    return (x + m - 1) // m * m


def _geometry(offsets, n, block_rows):
    P = int(max(abs(o) for o in offsets)) if offsets else 0
    Ppad = _round_up(max(P, 1), 128)  # lane-aligned halo
    BR = int(block_rows)
    npad = _round_up(n, BR)
    return P, Ppad, BR, npad


def pad_dia_data(data, offsets, block_rows: int = _DEFAULT_BLOCK_ROWS):
    """Re-lay out stacked-DIA ``data (m, ndiag, n)`` into the kernel layout
    ``(ndiag, m, npad)`` (row dim padded to a block multiple).  Do this once
    at bank-construction time; the result streams with zero per-call prep."""
    m, ndiag, n = data.shape
    _, _, BR, npad = _geometry(offsets, n, block_rows)
    D = jnp.zeros((ndiag, m, npad), dtype=data.dtype)
    return D.at[:, :, :n].set(jnp.transpose(data, (1, 0, 2)))


def pad_dia_operand(W, offsets, block_rows: int = _DEFAULT_BLOCK_ROWS):
    """Transpose-and-pad the operand ``W (n, m)`` to the kernel's
    ``(m, npad + 2*Ppad)`` halo layout.  Solvers that keep their iterate in
    this layout pay zero per-call prep."""
    n, m = W.shape
    _, Ppad, _, npad = _geometry(offsets, n, block_rows)
    WT = jnp.zeros((m, npad + 2 * Ppad), dtype=W.dtype)
    return WT.at[:, Ppad : Ppad + n].set(W.T)


def _dia_kernel(offsets, BR, Ppad, nblk, acc_dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(d_ref, w_hbm, y_ref, w_scr, sems):
        # every index expression pinned to int32: under jax_enable_x64 a
        # python-int constant traces as i64 and Mosaic's tpu.memref_slice
        # rejects 64-bit dynamic starts
        i = jnp.int32(pl.program_id(0))
        nb = jnp.int32(pl.num_programs(0))
        one = jnp.int32(1)
        two = jnp.int32(2)
        zero = jnp.int32(0)
        brw = jnp.int32(BR)
        slot = jax.lax.rem(i, two)

        # manual double buffering of the operand window (halo on both sides)
        @pl.when(i == zero)
        def _():
            pltpu.make_async_copy(
                w_hbm.at[:, pl.ds(zero, BR + 2 * Ppad)], w_scr.at[0],
                sems.at[0]
            ).start()

        @pl.when(i + one < nb)
        def _():
            nxt = jax.lax.rem(i + one, two)
            pltpu.make_async_copy(
                w_hbm.at[:, pl.ds((i + one) * brw, BR + 2 * Ppad)],
                w_scr.at[nxt],
                sems.at[nxt],
            ).start()

        pltpu.make_async_copy(
            w_hbm.at[:, pl.ds(i * brw, BR + 2 * Ppad)], w_scr.at[slot],
            sems.at[slot]
        ).wait()

        acc = jnp.zeros((1, BR), dtype=acc_dtype)
        for di, off in enumerate(offsets):
            s = Ppad + off
            ws = w_scr[slot, :, s : s + BR]  # (m, BR) static lane slice
            acc = acc + jnp.sum((d_ref[di] * ws).astype(acc_dtype), axis=0,
                                keepdims=True)
        y_ref[...] = acc

    return kernel


@partial(jax.jit,
         static_argnames=("offsets", "block_rows", "out_rows", "interpret"))
def dia_lincomb_pallas_padded(D, offsets, WT, block_rows: int = _DEFAULT_BLOCK_ROWS,
                              out_rows: int | None = None,
                              interpret: bool = False):
    """y = sum_i A_i @ W[:, i] with pre-padded operands (zero per-call prep).

    D:  (ndiag, m, npad) from :func:`pad_dia_data`;
    WT: (m, npad + 2*Ppad) from :func:`pad_dia_operand`.
    Returns y (out_rows,) (defaults to npad).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ndiag, m, npad = D.shape
    _, Ppad, BR, _ = _geometry(offsets, npad, block_rows)
    nblk = npad // BR
    dt = jnp.result_type(D.dtype, WT.dtype)
    acc_dtype = jnp.float32 if dt == jnp.bfloat16 else dt

    kernel = _dia_kernel(offsets, BR, Ppad, nblk, acc_dtype)
    # trace the kernel with x64 OFF: under jax_enable_x64, python-int index
    # constants trace as i64 and Mosaic's tpu.memref_slice rejects 64-bit
    # dynamic starts (operands are f32/bf16 — value semantics unaffected)
    with jax.enable_x64(False):
        y = pl.pallas_call(
            kernel,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((ndiag, m, BR), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, BR), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, npad), acc_dtype),
            scratch_shapes=[
                pltpu.VMEM((2, m, BR + 2 * Ppad), dt),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(D.astype(dt), WT.astype(dt))
    nout = npad if out_rows is None else out_rows
    return y[0, :nout]


@partial(jax.jit, static_argnames=("offsets", "block_rows", "interpret"))
def dia_lincomb_pallas(data, offsets, W, block_rows: int = _DEFAULT_BLOCK_ROWS,
                       interpret: bool = False):
    """y = sum_i A_i @ W[:, i] with A in stacked-DIA form.

    data: (m, ndiag, n) float32/bf16; offsets: static tuple; W: (n, m).
    Convenience wrapper over :func:`dia_lincomb_pallas_padded`; the operand
    re-layout (a transpose+pad of the small ``W``) happens per call — XLA
    folds the ``data`` transpose into the kernel's operand layout so the big
    stream is not copied.
    """
    m, ndiag, n = data.shape
    D = pad_dia_data(data, offsets, block_rows)
    WT = pad_dia_operand(W, offsets, block_rows)
    return dia_lincomb_pallas_padded(D, offsets, WT, block_rows, out_rows=n,
                                     interpret=interpret)
