"""Device-mesh helpers.  The framework's two parallel axes (SURVEY.md §2.9):

* ``rows``  — row-partitioned operands for SpMV/SpMM (data parallel over the
  matrix rows; Gram reductions psum over this axis)
* ``nodes`` — quadrature/Leja/shift batching (embarrassing parallelism over
  contour nodes and shifted factorizations)
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "P", "NamedSharding", "Mesh"]


def make_mesh(rows: int = None, nodes: int = 1, devices=None):
    """Create a (rows, nodes) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    ndev = len(devices)
    if rows is None:
        rows = ndev // nodes
    assert rows * nodes == ndev, f"mesh {rows}x{nodes} != {ndev} devices"
    dev = np.array(devices).reshape(rows, nodes)
    return Mesh(dev, axis_names=("rows", "nodes"))
