"""Solver algorithms (reference layer L4, ``src/NEPSolver.jl``)."""
from .common import NoConvergenceException, closest_to
from .newton import augnewton, implicitdet, newton, newtonqr, quasinewton, resinv
from .mslp import mslp
from .rfi import rfi, rfi_b
from .sgiter import sgiter
from .rf import compute_rf

__all__ = [
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
