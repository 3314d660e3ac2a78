"""Mixed term bank: banded/dense real main part + stacked low-rank terms
(complex allowed), with a split re/im apply for the complex-as-real kernels.

The gun-class SPMF (reference ``NLEVP_native.jl:4-18``) couples large
banded/FEM operands (K, M) with boundary matrices (W1, W2) whose nonzeros
live in a tiny row/column box; the WEP SPMF form (reference
``GalleryWaveguide.jl`` ``assemble_waveguide_spmf_fd``) adds 2 nz COMPLEX
rank-one boundary terms.  On TPU the right decomposition is

* a streaming DIA (or dense) bank for the real main terms,
* ALL low-rank factors stacked into four matrices (re/im x left/right) so
  every boundary term is applied inside two fused GEMM pairs — no
  union-pattern gather-CSR, no per-term op chains:
  ``y += L @ einsum('nr,nr->r', U, W[:, tidx])`` per group.

Complex operands never touch the device as complex: ``A = Ar + i Ai`` rides
as real factor pairs and the split apply carries the cross terms
(``yre = Ar wre - Ai wim``, ``yim = Ar wim + Ai wre``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MixedTermBank", "make_mixed_bank"]


def _group_apply(L, U, tidx, W):
    """y += L @ u with u_r = sum_n U[n, r] W[n, tidx[r]] (one gather + one
    elementwise-reduce + one GEMV — covers any number of terms/ranks)."""
    Wsel = W[:, list(tidx)]  # (n, R), static column gather
    u = jnp.sum(U * Wsel, axis=0)
    return L @ u


@jax.tree_util.register_pytree_node_class
class MixedTermBank:
    """Terms split into a real main bank (original indices ``main_idx``) and
    stacked low-rank factors: real parts ``(Lr, Ur, tidx_r)``, imaginary
    parts ``(Li, Ui, tidx_i)`` with term j's real part = Lr[:, sel] Ur[:,
    sel]^T etc.  ``lincomb_apply(W)`` computes ``sum_i A_i W[:, i]`` over
    the ORIGINAL term ordering; ``lincomb_apply_split`` is the re/im pair
    form used by the complex-as-real scan kernels.
    """

    is_sparse = True

    def __init__(self, inner, Lr, Ur, Li, Ui, main_idx, tidx_r, tidx_i,
                 shape, nterms, fro_norms=None):
        self.inner = inner
        self.Lr, self.Ur = Lr, Ur
        self.Li, self.Ui = Li, Ui
        self.main_idx = tuple(int(i) for i in main_idx)
        self.tidx_r = tuple(int(i) for i in tidx_r)
        self.tidx_i = tuple(int(i) for i in tidx_i)
        self.shape = tuple(shape)
        self._nterms = int(nterms)
        if fro_norms is None:
            fro = np.zeros(self._nterms)
            inner_fro = np.asarray(inner.fro_norms)
            for j, i in enumerate(self.main_idx):
                fro[i] = inner_fro[j]
            fro = np.sqrt(fro**2 + self._lr_fro()**2)
            fro_norms = jnp.asarray(fro)
        self.fro_norms = fro_norms

    def _lr_fro(self):
        fro2 = np.zeros(self._nterms)
        for L, U, tidx in ((self.Lr, self.Ur, self.tidx_r),
                           (self.Li, self.Ui, self.tidx_i)):
            if L is None:
                continue
            Lh, Uh = np.asarray(L), np.asarray(U)
            for i in set(tidx):
                sel = [r for r, t in enumerate(tidx) if t == i]
                fro2[i] += np.linalg.norm(Lh[:, sel] @ Uh[:, sel].T) ** 2
        return np.sqrt(fro2)

    @property
    def n(self):
        return self.shape[0]

    @property
    def nterms(self):
        return self._nterms

    @property
    def dtype(self):
        return self.inner.dtype

    def lincomb_apply_split(self, Wre, Wim):
        """(yre, yim) = re/im of sum_i A_i (Wre + i Wim)[:, i]."""
        Wre = jnp.asarray(Wre)
        Wim = jnp.asarray(Wim)
        sel = list(self.main_idx)
        identity = self.main_idx == tuple(range(self.nterms))
        yre = self.inner.lincomb_apply(Wre if identity else Wre[:, sel])
        yim = self.inner.lincomb_apply(Wim if identity else Wim[:, sel])
        if self.Lr is not None:
            yre = yre + _group_apply(self.Lr, self.Ur, self.tidx_r, Wre)
            yim = yim + _group_apply(self.Lr, self.Ur, self.tidx_r, Wim)
        if self.Li is not None:
            yre = yre - _group_apply(self.Li, self.Ui, self.tidx_i, Wim)
            yim = yim + _group_apply(self.Li, self.Ui, self.tidx_i, Wre)
        return yre, yim

    def lincomb_apply(self, W):
        """y = sum_i A_i W[:, i] (W in original term order; complex aware)."""
        W = jnp.asarray(W)
        if jnp.iscomplexobj(W) or self.Li is not None:
            # complex path (CPU tests / serial oracles only)
            Wre = jnp.real(W)
            Wim = jnp.imag(W) if jnp.iscomplexobj(W) else jnp.zeros_like(Wre)
            yre, yim = self.lincomb_apply_split(Wre, Wim)
            return yre + 1j * yim
        sel = list(self.main_idx)
        identity = self.main_idx == tuple(range(self.nterms))
        y = self.inner.lincomb_apply(W if identity else W[:, sel])
        if self.Lr is not None:
            y = y + _group_apply(self.Lr, self.Ur, self.tidx_r, W)
        return y

    def host_csr_terms(self):
        import scipy.sparse as sp

        inner_terms = self.inner.host_csr_terms()
        out = [None] * self.nterms
        for j, i in enumerate(self.main_idx):
            out[i] = inner_terms[j]
        for L, U, tidx, fac in ((self.Lr, self.Ur, self.tidx_r, 1.0),
                                (self.Li, self.Ui, self.tidx_i, 1j)):
            if L is None:
                continue
            Lh, Uh = np.asarray(L), np.asarray(U)
            for i in set(tidx):
                sel = [r for r, t in enumerate(tidx) if t == i]
                T = sp.csr_matrix(fac * (Lh[:, sel] @ Uh[:, sel].T))
                out[i] = T if out[i] is None else out[i] + T
        return out

    def tree_flatten(self):
        return ((self.inner, self.Lr, self.Ur, self.Li, self.Ui,
                 self.fro_norms),
                (self.main_idx, self.tidx_r, self.tidx_i, self.shape,
                 self._nterms))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        inner, Lr, Ur, Li, Ui, fro = leaves
        main_idx, tidx_r, tidx_i, shape, nterms = aux
        obj = cls.__new__(cls)
        obj.inner = inner
        obj.Lr, obj.Ur = Lr, Ur
        obj.Li, obj.Ui = Li, Ui
        obj.main_idx = main_idx
        obj.tidx_r = tidx_r
        obj.tidx_i = tidx_i
        obj.shape = shape
        obj._nterms = nterms
        obj.fro_norms = fro
        return obj


def make_mixed_bank(mats, dtype=None, max_rank=None, fmt=None):
    """Partition ``mats`` (real or complex scipy/dense) into real main-bank
    terms and stacked low-rank terms by nonzero support.

    A term's real part goes low-rank when min(#nonzero rows, #nonzero cols)
    is at most ``max_rank`` (default ``max(32, n // 64)``) — the reference's
    bounding-box criterion (``rk_nep.jl:43-98``); imaginary parts MUST be
    low-rank (the main bank is real — complex bulk operands have no
    complex-as-real streaming form)."""
    import scipy.sparse as sp

    from ..models.lowrank import low_rank_factors
    from .sparse import make_term_bank

    seq = [sp.csr_matrix(A) if not sp.issparse(A) else A.tocsr() for A in mats]
    n = seq[0].shape[0]
    if max_rank is None:
        max_rank = max(32, n // 64)
    rdt = np.dtype(dtype) if dtype is not None else np.float64
    if np.issubdtype(rdt, np.complexfloating):
        rdt = np.float64 if rdt == np.complex128 else np.float32

    def support(A):
        coo = A.tocoo()
        if coo.nnz == 0:
            return 0
        return min(len(np.unique(coo.row)), len(np.unique(coo.col)))

    main_idx = []
    Lr_, Ur_, tidx_r = [], [], []
    Li_, Ui_, tidx_i = [], [], []
    for i, A in enumerate(seq):
        if np.iscomplexobj(A.data):
            # copy the index arrays: eliminate_zeros mutates in place and the
            # terms of an aligned-pattern bank SHARE indices/indptr buffers
            Are = sp.csr_matrix(
                (A.data.real.copy(), A.indices.copy(), A.indptr.copy()),
                shape=A.shape)
            Aim = sp.csr_matrix(
                (A.data.imag.copy(), A.indices.copy(), A.indptr.copy()),
                shape=A.shape)
            Are.eliminate_zeros()
            Aim.eliminate_zeros()
        else:
            Are, Aim = A, None
        if Aim is not None and Aim.nnz:
            si = support(Aim)
            if si > max_rank:
                raise ValueError(
                    f"operand {i}: imaginary part has support {si} > "
                    f"max_rank {max_rank}; the complex-as-real mixed bank "
                    "needs low-rank imaginary parts")
            L, U = low_rank_factors(Aim)
            Li_.append(L)
            Ui_.append(U)
            tidx_i.extend([i] * L.shape[1])
        if Are.nnz and support(Are) <= max_rank:
            L, U = low_rank_factors(Are)
            Lr_.append(L)
            Ur_.append(U)
            tidx_r.extend([i] * L.shape[1])
        else:
            # bulk term: arrow-split so the main bank stays genuinely banded
            # (streamable DIA on chip, halo-shardable on a mesh) — the WEP's
            # [[Q, E], [F, P]] terms carry their border rows/cols as exact
            # low-rank factors instead of widening the band to the matrix
            from .partitioned import arrow_split

            seq[i] = Are  # real, explicit zeros eliminated (DIA detection
            # sees true offsets, not the complex pattern's stored zeros)
            split = arrow_split(Are, max_rank) if Are.nnz else None
            if split is not None and split[1]:
                band, factors = split
                seq[i] = band  # main-bank part (same original term index)
                for L, U in factors:
                    Lr_.append(L.real)
                    Ur_.append(U.real)
                    tidx_r.extend([i] * L.shape[1])
            main_idx.append(i)  # zero/real-band part rides the main bank

    if not main_idx:  # the inner bank needs at least one term
        i = tidx_r[0] if tidx_r else 0
        keep = [r for r, t in enumerate(tidx_r) if t != i]
        # rebuild without term i's real factors; put it in the main bank
        flat = []
        off = 0
        for L in Lr_:
            flat.extend(range(off, off + L.shape[1]))
            off += L.shape[1]
        Lr_cat = np.hstack(Lr_) if Lr_ else None
        Ur_cat = np.hstack(Ur_) if Ur_ else None
        if Lr_cat is not None:
            Lr_ = [Lr_cat[:, keep]] if keep else []
            Ur_ = [Ur_cat[:, keep]] if keep else []
        tidx_r = [t for t in tidx_r if t != i]
        main_idx = [i]

    def cat(parts):
        if not parts:
            return None
        h = np.hstack(parts)
        return jnp.asarray(np.ascontiguousarray(h.real), dtype=rdt)

    inner = make_term_bank(
        [seq[i].real if np.iscomplexobj(seq[i].data) else seq[i]
         for i in main_idx],
        dtype=rdt, fmt=fmt)
    # Frobenius norms on the HOST from the scipy/numpy factors: fetching the
    # freshly-built device arrays back (as the ctor's fallback would) costs
    # ~50 s per array over a tunneled TPU runtime.
    fro = np.zeros(len(seq))
    inner_fro = np.asarray(inner.fro_norms)
    for j, i in enumerate(main_idx):
        fro[i] = inner_fro[j]
    fro2 = fro**2
    for parts_L, parts_U, tidx in ((Lr_, Ur_, tidx_r), (Li_, Ui_, tidx_i)):
        if not parts_L:
            continue
        Lh, Uh = np.hstack(parts_L), np.hstack(parts_U)
        for i in set(tidx):
            sel = [r for r, t in enumerate(tidx) if t == i]
            # ||L U^T||_F^2 = trace((U^T U)(L^T L)) without the n x n product
            G = (Uh[:, sel].T @ Uh[:, sel]) * (Lh[:, sel].T @ Lh[:, sel]).T
            fro2[i] += float(G.sum())
    return MixedTermBank(inner, cat(Lr_), cat(Ur_), cat(Li_), cat(Ui_),
                         main_idx, tidx_r, tidx_i, (n, n), len(seq),
                         fro_norms=jnp.asarray(np.sqrt(fro2)))
