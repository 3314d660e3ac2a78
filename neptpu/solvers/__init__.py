"""Solver algorithms (reference layer L4, ``src/NEPSolver.jl``)."""
from .common import NoConvergenceException, closest_to
from .newton import augnewton, implicitdet, newton, newtonqr, quasinewton, resinv
from .mslp import mslp
from .rfi import rfi, rfi_b
from .sgiter import sgiter
from .rf import compute_rf
from .iar import iar
from .tiar import tiar
from .companion import companion, polyeig
from .contour import (
    MatrixGaussLegendre,
    MatrixIntegrator,
    MatrixTrapezoidal,
    batched_shifted_solves,
    contour_beyn,
    contour_block_SS,
    integrate_interval,
)
from .nleigs import nleigs, NleigsSolutionDetails
from .jd import jd_betcke, jd_effenberger
from .broyden import broyden
from .infbilanczos import infbilanczos
from .ilan import ilan
from .iar_chebyshev import iar_chebyshev
from .iar_jit import iar_jitted, iar_scan_kernel
from .iar_real import iar_real, iar_real_scan, dep_shift_block_lu
from .refine import newton_refine, resinv_refine
from .spmf_real import (iar_real_spmf, iar_real_spmf_deflated,
                        iar_real_spmf_multishift)
from .tiar_jit import tiar_jitted, tiar_jitted_spmf
from .aaa import AAAeigs, svAAA, get_prz
from .blocknewton import blocknewton
from .nlar import nlar, default_eigval_sorter, residual_eigval_sorter, threshold_eigval_sorter
from .inner import (
    ContourBeynInnerSolver,
    DefaultInnerSolver,
    IARChebInnerSolver,
    IARInnerSolver,
    InnerSolver,
    NewtonInnerSolver,
    NleigsInnerSolver,
    PolyeigInnerSolver,
    SGIterInnerSolver,
    inner_solve,
)

__all__ = [
    "iar_real",
    "iar_real_scan",
    "iar_real_spmf",
    "iar_real_spmf_deflated",
    "iar_real_spmf_multishift",
    "newton_refine",
    "resinv_refine",
    "tiar_jitted",
    "tiar_jitted_spmf",
    "dep_shift_block_lu",
    "iar_jitted",
    "iar_scan_kernel",
    "AAAeigs",
    "svAAA",
    "get_prz",
    "infbilanczos",
    "ilan",
    "iar_chebyshev",
    "broyden",
    "blocknewton",
    "jd_betcke",
    "jd_effenberger",
    "nlar",
    "default_eigval_sorter",
    "residual_eigval_sorter",
    "threshold_eigval_sorter",
    "nleigs",
    "NleigsSolutionDetails",
    "contour_beyn",
    "contour_block_SS",
    "MatrixIntegrator",
    "MatrixTrapezoidal",
    "MatrixGaussLegendre",
    "integrate_interval",
    "batched_shifted_solves",
    "iar",
    "tiar",
    "companion",
    "polyeig",
    "inner_solve",
    "InnerSolver",
    "DefaultInnerSolver",
    "NewtonInnerSolver",
    "PolyeigInnerSolver",
    "IARInnerSolver",
    "IARChebInnerSolver",
    "SGIterInnerSolver",
    "ContourBeynInnerSolver",
    "NleigsInnerSolver",
    "newton",
    "augnewton",
    "resinv",
    "quasinewton",
    "newtonqr",
    "implicitdet",
    "mslp",
    "rfi",
    "rfi_b",
    "sgiter",
    "compute_rf",
    "NoConvergenceException",
    "closest_to",
]
