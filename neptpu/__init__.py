"""neptpu — a TPU-native nonlinear-eigenproblem framework (JAX/XLA/Pallas).

Brand-new implementation of the capabilities of NEP-PACK /
NonlinearEigenproblems.jl (surveyed in SURVEY.md), designed TPU-first:
aligned-sparsity stacked operands, fused Mlincomb kernels, batched shifted
solves, host-callback small dense eigensolves, and sharded quadrature /
SpMV over device meshes.
"""
from . import config  # noqa: F401  (enables x64 on import)
from .core.nep import (
    NEP,
    compute_Mder,
    compute_Mlincomb,
    compute_MM,
    compute_resnorm,
)
from .core.exceptions import NoConvergenceException, LostOrthogonalityException
from .core.logger import Logger, PrintLogger, ErrorLogger
from .core.errmeasure import (
    Errmeasure,
    ResidualErrmeasure,
    StandardSPMFErrmeasure,
    EigvalReferenceErrmeasure,
    DefaultErrmeasure,
    estimate_error,
)
from .models.spmf import AbstractSPMF, SPMF_NEP
from .models.dep import DEP
from .models.pep import PEP, interpolate_pep
interpolate = interpolate_pep  # reference-name alias
from .models.gallery import nep_gallery
from .models.gallery.waveguide import WEP_FD, WEPLinSolverCreator
from .models.cheb import ChebPEP
from .models.sumnep import GenericSumNEP, SPMFSumNEP, SumNEP
from .models.lowrank import LowRankFactorizedNEP
from .models.derspmf import DerSPMF
from .models.helpers import Mder_NEP, Mder_Mlincomb_NEP, REP
from .models.projection import Proj_NEP, Proj_SPMF_NEP, create_proj_NEP
from .models.deflation import (
    DeflatedGenericNEP,
    DeflatedNEPMM,
    DeflatedSPMF,
    deflate_eigpair,
    get_deflated_eigpairs,
)
from .ops.linsolve import DeflatedNEPLinSolver, DeflatedNEPLinSolverCreator
from .ops import matfun
from .ops import sparse
from .ops.linsolve import (
    BackslashLinSolver,
    BackslashLinSolverCreator,
    DefaultLinSolverCreator,
    FactorizeLinSolver,
    FactorizeLinSolverCreator,
    GMRESLinSolver,
    GMRESLinSolverCreator,
    LinSolver,
    LinSolverCreator,
    SparseFactorizeLinSolver,
    SparseFactorizeLinSolverCreator,
    create_linsolver,
    lin_solve,
)
from .ops.eigsolve import (
    ArnoldiEigSolver,
    DefaultEigSolver,
    EigenEigSolver,
    EigSolver,
    eig_solve,
)
from .transforms import (
    CORKPencil,
    CORKPencilLR,
    IarCorkLinearization,
    NleigsCorkLinearization,
    build_pencil,
    low_rank_compress,
    mobius_transform,
    shift_and_scale,
    taylor_expansion_pep,
)
from .solvers.rk import (
    LinSolverCache,
    discretizepolygon,
    inpolygon,
    lejabagby,
    nleigs_coefficients,
    ratnewtoncoeffs,
    ratnewtoncoeffsm,
    scgendivdiffs,
)
from .ops.orth import DGKS, ClassicalGS, ModifiedGS, orthogonalize_and_normalize
from .solvers import (
    AAAeigs,
    svAAA,
    broyden,
    infbilanczos,
    ilan,
    iar_chebyshev,
    iar_jitted,
    iar_real,
    blocknewton,
    jd_betcke,
    jd_effenberger,
    nlar,
    nleigs,
    contour_beyn,
    contour_block_SS,
    MatrixIntegrator,
    MatrixTrapezoidal,
    MatrixGaussLegendre,
    integrate_interval,
    batched_shifted_solves,
    iar,
    tiar,
    companion,
    polyeig,
    inner_solve,
    InnerSolver,
    DefaultInnerSolver,
    NewtonInnerSolver,
    PolyeigInnerSolver,
    IARInnerSolver,
    IARChebInnerSolver,
    SGIterInnerSolver,
    ContourBeynInnerSolver,
    NleigsInnerSolver,
    augnewton,
    compute_rf,
    implicitdet,
    mslp,
    newton,
    newtonqr,
    quasinewton,
    resinv,
    rfi,
    rfi_b,
    sgiter,
)

# ---- reference-name parity layer -----------------------------------------
# The reference exports these exact names (grep `export` over
# /root/reference/src); expose them here so a NEP-PACK user finds everything
# at the top level under the name they know.
from .core.nep import (
    mder_from_mm as compute_Mder_from_MM,
    mlincomb_from_mm as compute_Mlincomb_from_MM,
    mlincomb_from_mder as compute_Mlincomb_from_Mder,
)
from .core.logger import push_info, push_iteration_info
from .models.deflation import DeflatedNEP
from .models.lowrank import LowRankMatrixAndFunction
from .models.gallery.waveguide import WEP, wep_gallery, wep_generate_preconditioner
from .models.gallery.distributed import (
    gauss_legendre_weights,
    distributed_kernel_gauss_legendre,
    distributed_kernel_trapezoidal,
)
from .transforms import CorkLinearization, DefaultCorkLinearization
from .solvers import (
    NleigsSolutionDetails,
    default_eigval_sorter,
    residual_eigval_sorter,
    threshold_eigval_sorter,
)
from .solvers.rk.rknep import RKNEP, get_rk_nep
from .utils.serialization import read_sparse_matrix, write_sparse_matrix

buildPencil = build_pencil
lowRankCompress = low_rank_compress
jd = jd_betcke


def get_Av(nep):
    """SPMF term matrices (reference ``NEPTypes.jl:95-104``)."""
    return nep.get_Av()


def get_fv(nep):
    """SPMF term functions (reference ``NEPTypes.jl:106-113``)."""
    return nep.get_fv()


def set_projectmatrices(proj_nep, W, V):
    """Module-level form of the reference's ``set_projectmatrices!``."""
    return proj_nep.set_projectmatrices(W, V)


def expand_projectmatrices(proj_nep, Wnew, Vnew):
    """Module-level form of the reference's ``expand_projectmatrices!``."""
    return proj_nep.expand_projectmatrices(Wnew, Vnew)


__version__ = "0.1.0"
