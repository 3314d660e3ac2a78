"""Gallery registry: ``nep_gallery(name, *params, **kwargs)``
(reference ``src/Gallery.jl:183-221``)."""
from __future__ import annotations

from . import basic, examples
from .distributed import dep_distributed
from .lowrank_sum import schrodinger_movebc
from .waveguide import WEP_FD, WEPLinSolverCreator, wep_gallery
from .periodic_dde import periodic_dde_gallery
from .bem import bem_fichera
from .chebdiff import cheb4c, chebdif, orr_sommerfeld
from .dtn_dimer import load_dtn_dimer
from .nlevp_bridge import nlevp_gallery_import
from .nlevp import (
    gun_like,
    nlevp_native_cd_player,
    nlevp_native_fiber,
    nlevp_native_gun,
    nlevp_native_hadeler,
    nlevp_native_loaded_string,
    nlevp_native_pdde_stability,
)

__all__ = ["nep_gallery", "GALLERY"]

GALLERY = {
    "dep0": basic.dep0,
    "dep0_sparse": basic.dep0_sparse,
    "dep0_tridiag": basic.dep0_tridiag,
    "pep0": basic.pep0,
    "pep0_sym": basic.pep0_sym,
    "pep0_sparse": basic.pep0_sparse,
    "qep_fixed_eig": basic.qep_fixed_eig,
    "dep1": examples.dep1,
    "dep_symm_double": examples.dep_symm_double,
    "dep_double": examples.dep_double,
    "real_quadratic": examples.real_quadratic,
    "qdep0": examples.qdep0,
    "qdep1": examples.qdep1,
    "neuron0": examples.neuron0,
    "beam": examples.beam,
    "sine": examples.sine_nep,
    "dep_distributed": dep_distributed,
    "schrodinger_movebc": schrodinger_movebc,
    "nlevp_native_gun": nlevp_native_gun,
    "gun_like": gun_like,
    "nlevp_native_cd_player": nlevp_native_cd_player,
    "nlevp_native_fiber": nlevp_native_fiber,
    "nlevp_native_hadeler": nlevp_native_hadeler,
    "nlevp_native_pdde_stability": nlevp_native_pdde_stability,
    "nlevp_native_loaded_string": nlevp_native_loaded_string,
    "waveguide": wep_gallery,
    "periodicdde": periodic_dde_gallery,
    "bem_fichera": bem_fichera,
    "dtn_dimer": load_dtn_dimer,
    "orr_sommerfeld": orr_sommerfeld,
}


def register(name, fn):
    GALLERY[name] = fn


def nep_gallery(problem, *params, **kwargs):
    """Look up and construct a gallery problem (reference ``Gallery.jl``).
    The first argument is the registry key; remaining args are forwarded
    (so e.g. ``nep_gallery("periodicdde", name="mathieu")`` works)."""
    if problem not in GALLERY:
        raise ValueError(
            f"unknown gallery problem '{problem}'; available: {sorted(GALLERY)}"
        )
    return GALLERY[problem](*params, **kwargs)
