"""Distributed layer: mesh, halo-exchange sharded SpMV, SPIKE banded solves,
node-sharded quadrature.

The reference has no distributed machinery (SURVEY.md §2.9; its only
parallel facility is the pluggable quadrature of
``method_contour_common.jl:7-46``); this layer is the TPU-native design
BASELINE.json mandates:

* ``halo``  — row-partitioned DIA term banks with ``ppermute`` halo
  exchange: operand AND vectors sharded, per-device memory shrinks with the
  mesh (``ShardedDiaBank``, ``sharded_dia_lincomb``);
* ``spike`` — distributed banded direct solve (SPIKE), the sharded
  replacement for the reference's cached UMFPACK factorization;
* ``spmv``  — replicated-operand row-sharded bank (tall-skinny W fallback)
  and psum Gram reductions;
* ``quadrature`` — contour/Leja node batching over the ``nodes`` axis;
* ``mesh``  — mesh construction + ``jax.distributed`` multi-host wiring.

End-to-end consumer: ``neptpu.solvers.iar_sharded.iar_real_sharded`` — the
fully sharded IAR whose spectra match the serial solver on a virtual
8-device mesh (tests/test_parallel.py).
"""
from .mesh import Mesh, NamedSharding, P, initialize_distributed, make_mesh
from .halo import (
    ShardedDiaBank,
    halo_exchange,
    local_halo_lincomb,
    shard_vector,
    sharded_dia_lincomb,
    unshard_vector,
)
from .spike import (
    SpikeBandedSolver,
    dia_strips_from_dense,
    interleave_complex_banded,
    spike_solve_local,
)
from .spmv import RowShardedBank, sharded_gram, sharded_lincomb_apply
from .quadrature import sharded_contour_moments

__all__ = [
    "make_mesh",
    "initialize_distributed",
    "Mesh",
    "P",
    "NamedSharding",
    "ShardedDiaBank",
    "sharded_dia_lincomb",
    "halo_exchange",
    "local_halo_lincomb",
    "shard_vector",
    "unshard_vector",
    "SpikeBandedSolver",
    "spike_solve_local",
    "dia_strips_from_dense",
    "interleave_complex_banded",
    "RowShardedBank",
    "sharded_lincomb_apply",
    "sharded_gram",
    "sharded_contour_moments",
]
