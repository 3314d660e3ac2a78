"""Pallas TPU kernel for the DIA-format fused multi-term SpMV.

The hot ``compute_Mlincomb`` contraction ``y = sum_i A_i W[:, i]`` over a
stacked-diagonal bank becomes, per row block:

    y[r] = sum_d sum_i data[i, d, r] * W[r + off_d, i]

The kernel tiles rows into VMEM blocks; the operand W (transposed to (m, n))
is DMA'd once per block *with halo* (max |offset| on each side), and each
diagonal is a static in-VMEM slice — contiguous lane-aligned streams, no
gathers.  This is the speed-of-light layout for banded operators (FD stencils,
kron-Laplacians, FEM bands) on TPU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["dia_lincomb_pallas"]


def _round_up(x, m):
    return (x + m - 1) // m * m


@partial(jax.jit, static_argnames=("offsets", "block_rows"))
def dia_lincomb_pallas(data, offsets, W, block_rows: int = 2048):
    """y = sum_i A_i @ W[:, i] with A in stacked-DIA form.

    data: (m, ndiag, n) float32/bf16; offsets: static tuple; W: (n, m).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, ndiag, n = data.shape
    P = int(max(abs(o) for o in offsets)) if offsets else 0
    Ppad = _round_up(max(P, 1), 128)  # keep DMA slices lane-aligned
    BR = block_rows
    npad = _round_up(n, BR)
    nblk = npad // BR
    dt = jnp.result_type(data.dtype, W.dtype)

    # operand transposed to (m, n), zero-padded with aligned halo on both sides
    WT = jnp.zeros((m, npad + 2 * Ppad), dtype=dt)
    WT = WT.at[:, Ppad : Ppad + n].set(W.T.astype(dt))
    # data laid out (ndiag, m, n) and padded along n
    D = jnp.zeros((ndiag, m, npad), dtype=dt)
    D = D.at[:, :, :n].set(jnp.transpose(data.astype(dt), (1, 0, 2)))

    def kernel(d_ref, w_hbm, y_ref, w_scr, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            w_hbm.at[:, pl.ds(i * BR, BR + 2 * Ppad)], w_scr, sem
        )
        cp.start()
        cp.wait()
        acc = jnp.zeros((1, BR), dtype=dt)
        for di, off in enumerate(offsets):
            s = Ppad + off
            ws = w_scr[:, s : s + BR]  # (m, BR) static slice
            acc = acc + jnp.sum(d_ref[di] * ws, axis=0, keepdims=True)
        y_ref[...] = acc

    y = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((ndiag, m, BR), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, BR), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, npad), dt),
        scratch_shapes=[
            pltpu.VMEM((m, BR + 2 * Ppad), dt),
            pltpu.SemaphoreType.DMA,
        ],
    )(D, WT)
    return y[0, :n]
