"""SPMF: sum of products of matrices and functions, M(lam) = sum_i A_i f_i(lam).

TPU-first design: the operands live in a *TermBank* (aligned-pattern stacked
CSR or stacked dense tensor; see ``neptpu/ops/sparse.py``), so

* assembly ``compute_Mder`` is a weight-vector contraction over nzvals
  (reference "aligned sparsity patterns", ``NEPTypes.jl:244-274,343-360``),
* ``compute_Mlincomb`` is ONE fused  (derivative-table GEMM) + (gather /
  segment-sum) kernel (reference fast path ``NEPTypes.jl:972-1011``),
* ``compute_MM`` evaluates each ``f_i`` on the small dense S and does a
  batched SpMM (reference ``NEPTypes.jl:276-319``).

Term functions follow the matrix-function contract of
``neptpu/ops/matfun.py`` (valid on scalars-as-1x1 and small dense matrices,
including defective Jordan-chain inputs).
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp

from ..core.nep import NEP
from ..ops import matfun
from ..ops.sparse import make_term_bank

__all__ = ["AbstractSPMF", "SPMF_NEP", "fun_scalar"]


def fun_scalar(f, lam):
    """Evaluate a matrix-function term at a scalar via a 1x1 matrix."""
    lam = jnp.asarray(lam)
    return f(lam.reshape(1, 1))[0, 0]


def _check_fv_consistency(fv):
    """Construction-time sanity check of term functions: each ``f_i`` must map
    a small dense matrix to a matrix of the same shape (the matrix-function
    contract every compute path relies on).  Mirrors the reference's
    ``@code_typed`` return-type inspection (``NEPTypes.jl:190-204``) — a
    wrong-shaped ``f_i`` fails here with a clear error instead of deep inside
    a jit trace."""
    S = jnp.asarray([[0.31 + 0.11j, 0.02], [0.0, 0.37 + 0.13j]])
    for i, f in enumerate(fv):
        try:
            out = f(S)
        except Exception:
            continue  # cannot probe (e.g. dtype-restricted backend); trust it
        shape = getattr(out, "shape", None)
        if shape != S.shape:
            raise ValueError(
                f"SPMF term function fv[{i}] is not a matrix function: "
                f"f(2x2 matrix) returned shape {shape}, expected {S.shape}. "
                "Term functions must map k x k matrices to k x k matrices "
                "(use neptpu.matfun primitives)."
            )


class AbstractSPMF(NEP):
    """Interface: get_Av() operand list, get_fv() matrix-function list
    (reference ``NEPTypes.jl:86-113``)."""

    def get_Av(self):
        raise NotImplementedError

    def get_fv(self):
        raise NotImplementedError

    def fv_scalar(self, lam):
        """Vector [f_i(lam)] of scalar term values (for backward-error
        measures and projections)."""
        return jnp.stack([fun_scalar(f, lam) for f in self.get_fv()])


class SPMF_NEP(AbstractSPMF):
    """Concrete SPMF over a TermBank (reference ``SPMF_NEP``,
    ``NEPTypes.jl:178-241``).

    Parameters
    ----------
    Av : matrices (scipy-sparse or array-like), all n x n
    fv : matrix functions built from ``neptpu.matfun`` primitives
    align_sparsity_patterns : kept for API parity; alignment is the default
        storage whenever all operands are sparse.
    """

    def __init__(self, Av: Sequence, fv: Sequence[Callable], dtype=None,
                 align_sparsity_patterns: bool = True, bank=None,
                 check_consistency: bool = True):
        if bank is None:
            bank = make_term_bank(Av, dtype=dtype)
        self.bank = bank
        self.fv = list(fv)
        if len(self.fv) != bank.nterms:
            raise ValueError(
                f"got {bank.nterms} matrices but {len(self.fv)} functions"
            )
        if check_consistency:
            _check_fv_consistency(self.fv)
        self.n = bank.n

    @property
    def issparse(self):
        return self.bank.is_sparse

    def get_Av(self):
        b = self.bank
        if b.is_sparse:
            return [b.term(i) for i in range(b.nterms)]
        return [b.A[i] for i in range(b.nterms)]

    def get_fv(self):
        return self.fv

    # -- compute functions -------------------------------------------------
    def Mder(self, lam, der: int = 0):
        w = jnp.stack(
            [matfun.fun_derivatives(f, lam, der + 1)[der] for f in self.fv]
        )
        return self.bank.combine(w)

    def Mder_dense(self, lam, der: int = 0):
        M = self.Mder(lam, der)
        return M if isinstance(M, jnp.ndarray) else M.to_dense()

    def Mlincomb(self, lam, V, a=None, startder: int = 0):
        V = jnp.asarray(V)
        if V.ndim == 1:
            V = V[:, None]
        k = V.shape[1]
        if a is None:
            a = jnp.ones((k,))
        D = matfun.deriv_table(self.fv, lam, a, startder=startder)  # (m, k)
        W = V @ D.T  # (n, m): one small GEMM
        return self.bank.lincomb_apply(W)

    def MM(self, S, V):
        S = jnp.asarray(S)
        V = jnp.asarray(V)
        F = jnp.stack([f(S.astype(jnp.result_type(S, jnp.float32))) for f in self.fv])
        return self.bank.mm_apply(V, F)
