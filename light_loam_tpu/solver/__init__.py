from light_loam_tpu.solver.residuals import (
    DistanceFactors,
    EdgeFactors,
    EdgeScalarFactors,
    PlaneComponentFactors,
    PlaneFactors,
    PlaneNormFactors,
    distance_residuals,
    edge_residuals,
    edge_scalar_residuals,
    make_plane_factors,
    plane_component_residuals,
    plane_norm_residuals,
    plane_residuals,
)
from light_loam_tpu.solver.gauss_newton import lm_solve, FactorSet

__all__ = [
    "DistanceFactors",
    "EdgeFactors",
    "EdgeScalarFactors",
    "PlaneComponentFactors",
    "PlaneFactors",
    "PlaneNormFactors",
    "distance_residuals",
    "edge_residuals",
    "edge_scalar_residuals",
    "make_plane_factors",
    "plane_component_residuals",
    "plane_norm_residuals",
    "plane_residuals",
    "lm_solve",
    "FactorSet",
]
