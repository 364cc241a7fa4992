"""Whole-frame SLAM step as ONE XLA program — the latency mode.

The staged pipeline (models/pipeline.py) dispatches three programs per
frame (features → odometry → mapping) with a host round-trip between
odometry and mapping for divergence containment.  On a single chip the
per-stage device times are dominated by the dispatch floor (see
README "Performance"), so fusing the whole frame into one jitted
program removes two program launches and the mid-frame host sync —
the single-stream analog of models/batch.py's batched program.

Semantics match the staged path exactly, including the divergence
containment that pipeline.py performs on the host
(models/pipeline.py:152-168): a non-finite odometry translation keeps
the previous world pose, resets the warm-start increment to identity,
and feeds the contained pose to mapping.  Here that policy is a
`jnp.where` on device, so no host readback interrupts the frame.

The staged path remains the default and is required for:
  * async mapping (drop policy needs the odometry result while the
    previous mapping step is still in flight);
  * skip_frame_num > 1 (non-mapping frames run features+odometry only).
Reference scope: this fuses scanRegistration.cpp + laserOdometry.cpp +
laserMapping.cpp's per-frame work into one program; their ROS-thread
overlap is the staged path's async mode instead.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from light_loam_tpu.config import PipelineConfig
from light_loam_tpu.core import quaternion as quat
from light_loam_tpu.models.mapping import MappingOutput, MappingState, mapping_step
from light_loam_tpu.models.odometry import (
    OdometryOutput,
    OdometryState,
    odometry_step,
)
from light_loam_tpu.ops.features import extract_features


@partial(jax.jit, static_argnames=("cfg",))
def fused_frame_step(
    odo_state: OdometryState,
    map_state: MappingState,
    xyz: jnp.ndarray,   # (max_points, 3)
    mask: jnp.ndarray,  # (max_points,)
    cfg: PipelineConfig,
) -> Tuple[OdometryState, MappingState, OdometryOutput, MappingOutput,
           jnp.ndarray]:
    """One full SLAM frame; returns (..., diverged) where ``diverged``
    is a bool scalar for the host's failure counter."""
    feats = extract_features(xyz, mask, cfg.scan)
    prev_q, prev_t = odo_state.q_w, odo_state.t_w
    odo_state, odo = odometry_step(
        odo_state, feats, cfg.odometry, cfg.scan.scan_period
    )

    # In-graph divergence containment (pipeline.py:152-168 semantics:
    # the check is on the translation, the warm start resets to
    # identity, the feature-cloud swap is kept).
    finite = jnp.isfinite(odo.t_w).all()
    q_w = jnp.where(finite, odo_state.q_w, prev_q)
    t_w = jnp.where(finite, odo_state.t_w, prev_t)
    odo_state = odo_state._replace(
        q_w=q_w,
        t_w=t_w,
        q_lc=jnp.where(finite, odo_state.q_lc, quat.quat_identity()),
        t_lc=jnp.where(finite, odo_state.t_lc, jnp.zeros(3)),
    )
    odo = odo._replace(q_w=q_w, t_w=t_w)

    map_state, mout = mapping_step(
        map_state,
        odo_state.corner_last,
        odo_state.surf_last,
        q_w,
        t_w,
        cfg.mapping,
    )
    return odo_state, map_state, odo, mout, ~finite
