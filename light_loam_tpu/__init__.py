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
# of metres the single-pass bf16 rounding (~0.4% rel, tens of m² on the
# 1e4 m² cross terms) exceeds correspondence gates, plane-fit normal
# equations, and compatibility length scales (measured: identical programs
# track on CPU and diverge on TPU at default precision).  The
# distance-critical kernels also pin their precision explicitly; this
# default protects every remaining einsum (Jacobian accumulation, plane
# fits, Schur reduction).
#
# LLT_MATMUL_PRECISION selects the tier (default "highest" = 6-pass bf16,
# exact-f32-equivalent).  "high" (3-pass, ~2.4e-7 rel ≈ 2.4e-3 m² on the
# cross terms — still two orders under the tightest 1 m² gate) doubles the
# MXU ceiling of every distance/vote matmul; see BENCH notes for the
# measured accuracy/thoughput trade.
import os as _os

_PRECISION = _os.environ.get("LLT_MATMUL_PRECISION", "highest")
if _PRECISION not in ("highest", "high", "default"):
    raise ValueError(
        f"LLT_MATMUL_PRECISION={_PRECISION!r}: use highest|high|default"
    )
_jax.config.update("jax_default_matmul_precision", _PRECISION)


def dist_precision() -> "_jax.lax.Precision":
    """Precision for the distance-critical matmuls (kNN tiles, vote
    compatibility).  They follow the package tier rather than hard-coding
    HIGHEST so LLT_MATMUL_PRECISION=high governs the whole compute path."""
    return {
        "highest": _jax.lax.Precision.HIGHEST,
        "high": _jax.lax.Precision.HIGH,
        "default": _jax.lax.Precision.DEFAULT,
    }[_PRECISION]

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
