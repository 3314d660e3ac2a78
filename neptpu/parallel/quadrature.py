"""Quadrature-node parallelism over the device mesh.

The reference's extension point is a user-pluggable ``@distributed``
trapezoid (``docs/src/tutorial_contour.md:199-231``); here node parallelism is
first-class: contour nodes are sharded over the ``nodes`` mesh axis, each
device runs the batched assemble+LU+solve pipeline on its local nodes, and
the quadrature moments are reduced with one psum.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

__all__ = ["sharded_contour_moments"]


def sharded_contour_moments(nep, sigma, radius, Vh, N, n_moments, mesh,
                            axis: str = "nodes"):
    """Moments A_j = 1/(2 pi i) int T(g(t)) g'(t) g(t)^j dt computed with the
    node axis sharded over ``mesh.axis_names`` entry ``axis``.

    Requires a NEP with traceable Mder (SPMF-form).  Returns a stacked
    (n_moments, n, k) array, replicated on all devices.
    """
    ndev = mesh.shape[axis]
    N = int(np.ceil(N / ndev) * ndev)  # round up so shards are equal
    r1, r2 = (radius, radius) if np.isscalar(radius) else tuple(radius)
    h = 2 * np.pi / N
    t = h * np.arange(N)
    gs = r1 * np.cos(t) + 1j * r2 * np.sin(t)
    gps = -r1 * np.sin(t) + 1j * r2 * np.cos(t)
    from jax.sharding import NamedSharding

    shifts = jnp.asarray(complex(sigma) + gs)
    # per-node weights for each moment: w[j, i] = h/(2 pi i) * gp_i * g_i^j
    gj = np.stack([gs**j for j in range(n_moments)])
    wts = jnp.asarray(gj * gps[None, :] * (h / (2j * np.pi)))
    Vh = jnp.asarray(Vh, dtype=jnp.result_type(shifts.dtype, jnp.complex64))
    # lay the inputs out on THIS mesh (callers may hand arrays committed to a
    # single device, which shard_map cannot consume)
    shifts = jax.device_put(shifts, NamedSharding(mesh, P(axis)))
    wts = jax.device_put(wts, NamedSharding(mesh, P(None, axis)))
    Vh = jax.device_put(Vh, NamedSharding(mesh, P()))

    spec_nodes = P(axis) if len(mesh.axis_names) == 1 else P(axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(None, axis), P(None, None)),
        out_specs=P(None, None, None),
        check_vma=False,
    )
    def body(shifts_local, wts_local, Vrep):
        def solve_one(lam):
            M = nep.Mder_dense(lam).astype(Vrep.dtype)
            lu_piv = jax.scipy.linalg.lu_factor(M)
            return jax.scipy.linalg.lu_solve(lu_piv, Vrep)

        Y = jax.lax.map(solve_one, shifts_local)  # (N_local, n, k)
        partial_moments = jnp.einsum("mN,Nnk->mnk", wts_local, Y)
        return jax.lax.psum(partial_moments, axis)

    return body(shifts, wts, Vh)
