"""NEP transformations (reference ``src/NEPTransformations.jl``):
``shift_and_scale`` / ``mobius_transform`` (type-preserving specializations),
``taylor_expansion_pep``, and the CORK pencil builders (``cork.py``)."""
from .shift_scale import (
    MobiusTransformedNEP,
    ShiftScaledNEP,
    mobius_transform,
    shift_and_scale,
    taylor_expansion_pep,
)
from .cork import (
    CORKPencil,
    CORKPencilLR,
    CorkLinearization,
    DefaultCorkLinearization,
    IarCorkLinearization,
    NleigsCorkLinearization,
    build_pencil,
    low_rank_compress,
)

__all__ = [
    "shift_and_scale",
    "mobius_transform",
    "taylor_expansion_pep",
    "ShiftScaledNEP",
    "MobiusTransformedNEP",
    "CORKPencil",
    "CORKPencilLR",
    "build_pencil",
    "low_rank_compress",
    "CorkLinearization",
    "DefaultCorkLinearization",
    "IarCorkLinearization",
    "NleigsCorkLinearization",
]
