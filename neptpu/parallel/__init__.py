"""Distributed layer: mesh, row-sharded SpMV banks, node-sharded quadrature.

The reference has no distributed machinery (SURVEY.md §2.9); these are the
TPU-native primitives required by BASELINE.json: row/block-partitioned
operands over a device mesh, psum Gram reductions, and quadrature-node
parallelism for contour/Leja shift batching.
"""
from .mesh import Mesh, NamedSharding, P, make_mesh
from .spmv import RowShardedBank, sharded_gram, sharded_lincomb_apply
from .quadrature import sharded_contour_moments

__all__ = [
    "make_mesh",
    "Mesh",
    "P",
    "NamedSharding",
    "RowShardedBank",
    "sharded_lincomb_apply",
    "sharded_gram",
    "sharded_contour_moments",
]
