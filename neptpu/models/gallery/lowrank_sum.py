"""Gallery problems combining SumNEP + LowRankFactorizedNEP
(reference ``gallery_examples.jl:164-204``)."""
from __future__ import annotations

import numpy as np

from ...ops import matfun
from ..lowrank import LowRankFactorizedNEP
from ..pep import PEP
from ..spmf import SPMF_NEP
from ..sumnep import SPMFSumNEP, SumNEP

__all__ = ["make_sine_nep", "schrodinger_movebc"]


def make_sine_nep(load):
    """PEP + rank-2 matrix-sine term (reference ``sine_nep``)."""
    import scipy.sparse as sp

    A0 = load("converted_sine/sine_A0.txt")
    A1 = load("converted_sine/sine_A1.txt")
    A2 = load("converted_sine/sine_A2.txt")
    V = load("converted_sine/sine_V.txt").toarray()
    Q = load("converted_sine/sine_Q.txt").toarray()
    n = A0.shape[0]
    Z = sp.csr_matrix((n, n))
    pep = PEP([A0, A1, Z, Z, A2])
    sin_nep = SPMF_NEP([V @ Q.T], [matfun.sinm])
    return SPMFSumNEP(pep, sin_nep)


def schrodinger_movebc(n=1000, L0=1.0, L1=8.0, alpha=25 * np.pi / 2, V0=10.0):
    """Schrodinger equation with moving boundary condition (reference
    ``gallery_examples.jl:185-204``): SPMF + low-rank sinh/cosh/sqrt terms."""
    import jax.numpy as jnp
    import scipy.sparse as sp

    xv = np.linspace(0, L0, n)
    h = xv[1] - xv[0]
    Vfun = lambda x: 1 + np.sin(alpha * x)
    # julia spdiagm pads short diagonals with zeros to the common size n
    Dn = sp.diags(
        [np.concatenate([np.ones(n - 2), [0.0]]) / h**2,
         np.concatenate([-2 * np.ones(n - 1), [0.0]]) / h**2,
         np.ones(n - 1) / h**2],
        [-1, 0, 1], shape=(n, n),
    ).tocsr()
    Vn = sp.diags(np.concatenate([Vfun(xv[:-1]), [0.0]])).tocsr()
    In = sp.diags(np.concatenate([np.ones(n - 1), [0.0]])).tocsr()

    f1 = matfun.eye_like
    f2 = lambda S: -jnp.asarray(S)

    def hh(S):
        return matfun.sqrtm(jnp.asarray(S) + V0 * matfun.eye_like(S))

    def g(S):
        return matfun.coshm((L1 - L0) * hh(S))

    def f(S):
        H = hh(S)
        return jnp.linalg.solve(H, matfun.sinhm((L1 - L0) * H)) if jnp.asarray(S).ndim >= 2 else matfun.sinhm((L1 - L0) * H) / H

    nep1 = SPMF_NEP([Dn - Vn, In], [f1, f2])
    Lv1 = np.zeros((n, 1)); Lv1[-1, 0] = 1.0
    Lv2 = np.zeros((n, 1)); Lv2[-1, 0] = 1.0
    Uv1 = np.zeros((n, 1)); Uv1[-1, 0] = 1.0
    Uv2 = np.zeros((n, 1)); Uv2[-3:, 0] = [1 / (2 * h), -2 / h, 3 / (2 * h)]
    nep2 = LowRankFactorizedNEP([Lv1, Lv2], [Uv1, Uv2], [g, f])
    return SumNEP(nep1, nep2)
