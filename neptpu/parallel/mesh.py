"""Device-mesh helpers.  The framework's two parallel axes (SURVEY.md §2.9):

* ``rows``  — row-partitioned operands for SpMV/SpMM (data parallel over the
  matrix rows; Gram reductions psum over this axis)
* ``nodes`` — quadrature/Leja/shift batching (embarrassing parallelism over
  contour nodes and shifted factorizations)

Multi-host: :func:`initialize_distributed` wires ``jax.distributed`` so
``jax.devices()`` spans every host's chips; lay the ``rows`` axis along ICI
within a host/slice and the ``nodes`` axis across DCN (quadrature nodes are
independent — one psum of small moments is the only cross-host traffic).
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "initialize_distributed", "P", "NamedSharding", "Mesh"]

_DIST_INITIALIZED = False


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None):
    """Initialize ``jax.distributed`` for multi-host meshes.

    With no arguments, reads the standard env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``; on Cloud TPU pods ``jax.distributed.initialize()``
    auto-discovers all three).  Safe to call more than once, and a no-op in
    single-process runs with no coordinator configured.
    """
    global _DIST_INITIALIZED
    if _DIST_INITIALIZED:
        return True
    if jax.distributed.is_initialized():  # launcher/program already wired it
        _DIST_INITIALIZED = True
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # no explicit cluster config: auto-init only on TPU pod runtimes.
        # NOTE: probe via env, NOT jax.default_backend() — touching the
        # backend initializes it and jax.distributed.initialize must run
        # BEFORE backend initialization (the round-2 wiring silently
        # degraded to single-process because of exactly that).
        platforms = os.environ.get("JAX_PLATFORMS", "").lower()
        if not platforms:
            # platform may have been selected through
            # jax.config.update('jax_platforms', ...) instead of the env var
            # (this repo's own conftest/bench pattern); the config value is
            # readable without initializing the backend
            platforms = (getattr(jax.config, "jax_platforms", None)
                         or "").lower()
        if "tpu" not in platforms and not os.environ.get("TPU_WORKER_ID"):
            return False  # single-process CPU/GPU run: nothing to do
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _DIST_INITIALIZED = True
        return True
    except RuntimeError as e:
        if "already" in str(e).lower():  # launcher beat us to it — fine
            _DIST_INITIALIZED = True
            return True
        raise


def make_mesh(rows: int = None, nodes: int = 1, devices=None,
              multihost: bool = False):
    """Create a (rows, nodes) mesh over the available devices.

    ``multihost=True`` first wires ``jax.distributed`` (env-var driven) so
    ``jax.devices()`` is the GLOBAL device list; each process then holds the
    same mesh over all hosts' chips.  The ``rows`` axis should map to the
    fast (ICI) dimension — pass ``devices`` ordered accordingly, or rely on
    JAX's default device order which keeps same-host chips contiguous.
    """
    if multihost:
        initialize_distributed()
    if devices is None:
        devices = jax.devices()
    ndev = len(devices)
    if rows is None:
        rows = ndev // nodes
    assert rows * nodes == ndev, f"mesh {rows}x{nodes} != {ndev} devices"
    dev = np.array(devices).reshape(rows, nodes)
    return Mesh(dev, axis_names=("rows", "nodes"))
