"""light_loam_tpu — a TPU-native LiDAR odometry & mapping (SLAM) engine.

A brand-new JAX/XLA/Pallas implementation of the Light-LOAM pipeline
(RA-L 2024, arXiv 2310.04162; reference C++/ROS implementation surveyed in
/root/repo/SURVEY.md):

  * curvature-based edge/planar feature extraction over ring-organized
    point clouds (reference: src/scanRegistration.cpp),
  * scan-to-scan odometry with graph-matching correspondence-consistency
    voting (reference: src/laserOdometry.cpp),
  * scan-to-map refinement against a sliding voxel-cube world map
    (reference: src/laserMapping.cpp),
  * a batched Gauss-Newton/Levenberg-Marquardt solver on SE(3) with
    analytic Jacobians replacing Ceres (reference: src/lidarFactor.hpp).

Everything on the compute path is pure-functional JAX with static shapes
(padded tensors + validity masks); the pipeline around it is a thin host
runtime.  Multi-device scaling uses jax.sharding Meshes (see
light_loam_tpu.parallel).
"""

import jax as _jax

# Geometry demands real f32 matmuls: TPU XLA otherwise lowers f32 matmuls
# to bf16×bf16+f32 accumulation, and with world coordinates up to hundreds
# of metres the rounding error exceeds correspondence gates, plane-fit
# normal equations, and compatibility length scales (measured: identical
# programs track on CPU and diverge on TPU at default precision).  The
# distance-critical kernels also pin precision=HIGHEST explicitly; this
# default protects every remaining einsum (Jacobian accumulation, plane
# fits, Schur reduction).  Users may override after import if they accept
# the accuracy consequences for their own ops.
_jax.config.update("jax_default_matmul_precision", "highest")

from light_loam_tpu.config import (
    ScanConfig,
    OdometryConfig,
    MappingConfig,
    PipelineConfig,
    HDL64_KITTI,
    HDL64_SMALL,
    VLP16,
    HDL32,
    M2DGR_VLP32C,
)

__version__ = "0.1.0"

__all__ = [
    "ScanConfig",
    "OdometryConfig",
    "MappingConfig",
    "PipelineConfig",
    "HDL64_KITTI",
    "HDL64_SMALL",
    "VLP16",
    "HDL32",
    "M2DGR_VLP32C",
    "__version__",
]
