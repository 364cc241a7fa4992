from light_loam_tpu.solver.residuals import (
    EdgeFactors,
    PlaneFactors,
    PlaneNormFactors,
    edge_residuals,
    plane_residuals,
    plane_norm_residuals,
    make_plane_factors,
)
from light_loam_tpu.solver.gauss_newton import lm_solve, FactorSet

__all__ = [
    "EdgeFactors",
    "PlaneFactors",
    "PlaneNormFactors",
    "edge_residuals",
    "plane_residuals",
    "plane_norm_residuals",
    "make_plane_factors",
    "lm_solve",
    "FactorSet",
]
