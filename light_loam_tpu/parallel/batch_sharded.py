"""Data-parallel batched SLAM over a device mesh.

The batched multi-sequence mode (models/batch.py) vmaps B independent
sequences into one program; here those batch lanes are sharded over a
1-D ``data`` mesh axis.  Lanes never interact, so the partitioned program
contains ZERO collectives — pure weak scaling, the throughput-oriented
multi-chip mode (BASELINE.md "frames/s scaling efficiency" target).  The
complementary axis — voxel-hash map sharding with psum'd Gauss-Newton,
which DOES communicate — lives in parallel/sharded.py.

Mechanism: inputs and state are placed with NamedSharding(mesh,
P("data", ...)) on the leading (batch) dim and fed to the SAME jitted
``batched_frame_step``; XLA propagates the sharding through the whole
step (GSPMD), so one code path serves 1..N devices.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from light_loam_tpu.config import PipelineConfig
from light_loam_tpu.models.batch import (
    BatchState,
    batched_frame_step,
    init_batch_state,
)

AXIS = "data"


def make_data_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(devs[:n], (AXIS,))


def _lane_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P(AXIS, *([None] * (ndim - 1))))


def shard_batch_state(state: BatchState, mesh: Mesh) -> BatchState:
    """Place every leaf sharded on its leading (batch) dim."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, _lane_sharding(mesh, x.ndim)), state
    )


def init_sharded_batch_state(
    cfg: PipelineConfig, batch: int, mesh: Mesh
) -> BatchState:
    if batch % mesh.shape[AXIS] != 0:
        raise ValueError(
            f"batch {batch} must divide evenly over {mesh.shape[AXIS]} devices"
        )
    return shard_batch_state(init_batch_state(cfg, batch), mesh)


def put_frames(xyz, mask, mesh: Mesh) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Place (B, P, 3)/(B, P) host frames lane-sharded on the mesh."""
    return (
        jax.device_put(xyz, _lane_sharding(mesh, 3)),
        jax.device_put(mask, _lane_sharding(mesh, 2)),
    )


def sharded_batched_frame_step(state, xyz, mask, cfg: PipelineConfig):
    """One SLAM frame for B lane-sharded sequences — the jitted
    batched_frame_step itself; sharding rides the operands (GSPMD)."""
    return batched_frame_step(state, xyz, mask, cfg)


def put_chunk_frames(xyz, mask, mesh: Mesh) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Place (K, B, P, 3)/(K, B, P) host chunks lane-sharded on dim 1
    (the scan axis K stays unsharded — it is sequential by nature)."""
    return (
        jax.device_put(xyz, NamedSharding(mesh, P(None, AXIS, None, None))),
        jax.device_put(mask, NamedSharding(mesh, P(None, AXIS, None))),
    )


def sharded_batched_chunk_step(state, xyz, mask, cfg: PipelineConfig):
    """K frames × B lane-sharded sequences per dispatch — the jitted
    batched_chunk_step (models/batch.py) with sharding riding the
    operands: the scan carries the lane-sharded state through K
    iterations with zero collectives, so the pod-scale offline replay
    pays ONE dispatch per K frames per however many devices hold lanes."""
    from light_loam_tpu.models.batch import batched_chunk_step

    return batched_chunk_step(state, xyz, mask, cfg)
