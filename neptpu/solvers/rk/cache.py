"""Per-shift factorization cache (reference ``src/rk_helper/linsolvercache.jl``):
NLEIGS's "reusefact" — batched shifted solves reuse factorizations keyed by
the shift value."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...ops.linsolve import create_linsolver, lin_solve

__all__ = ["LinSolverCache"]


class LinSolverCache:
    def __init__(self, nep, creator=None):
        self.nep = nep
        self.creator = creator
        self.cache = {}

    def solve(self, shift, b, add_to_cache=True):
        key = complex(shift)
        solver = self.cache.get(key)
        if solver is None:
            solver = create_linsolver(self.creator, self.nep, jnp.asarray(key))
            if add_to_cache:
                self.cache[key] = solver
        return lin_solve(solver, jnp.asarray(b))
