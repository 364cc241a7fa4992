"""Multi-process (multi-host) mesh support.

The DCN axis of the SURVEY §2.7 plan: the SAME sharded program
(parallel/sharded.py) runs across multiple processes after
``jax.distributed.initialize`` — each process owns a slice of the global
device mesh, collectives span processes.  The only multihost-specific
work is array CONSTRUCTION: ``jax.device_put`` cannot target
non-addressable devices, so global arrays are assembled with
``jax.make_array_from_callback`` from host data each process computes
(or loads) identically.

Validated by tests/test_multihost.py: two CPU processes × two virtual
devices each must reproduce the single-process 4-device result exactly
(same mesh shape ⇒ same partitioned program).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from light_loam_tpu.config import MappingConfig
from light_loam_tpu.core.frame import PointCloud
from light_loam_tpu.models.mapping import MapStore, MappingState
from light_loam_tpu.parallel.sharded import AXIS, redistribute_state


def global_mesh() -> Mesh:
    """1-D mesh over ALL global devices (every process must call this
    with the same device order — jax.devices() guarantees it)."""
    return Mesh(jax.devices(), (AXIS,))


def to_global(x, spec: P, mesh: Mesh):
    """Assemble a global array from identical host data on every process.

    Each process materializes only its addressable shards (the callback
    slices the full host array), so this works for replicated specs and
    for sharded specs alike, on any number of processes."""
    import numpy as np

    x = np.asarray(x)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def place_state_global(
    state: MappingState, mesh: Mesh, cfg: MappingConfig
) -> MappingState:
    """Multi-process analog of shard_mapping_state: voxel-hash
    redistribution (pure compute, identical on every process) + global
    array assembly."""
    state = redistribute_state(state, mesh.shape[AXIS], cfg)

    def place(store: MapStore) -> MapStore:
        return MapStore(
            xyz=to_global(store.xyz, P(AXIS, None), mesh),
            cell=to_global(store.cell, P(AXIS), mesh),
            mask=to_global(store.mask, P(AXIS), mesh),
        )

    return MappingState(
        corner=place(state.corner),
        surf=place(state.surf),
        cen=to_global(state.cen, P(), mesh),
        q_wm=to_global(state.q_wm, P(), mesh),
        t_wm=to_global(state.t_wm, P(), mesh),
        frame=to_global(state.frame, P(), mesh),
    )


def place_cloud_global(pc: PointCloud, mesh: Mesh) -> PointCloud:
    """Replicate a (host-identical) point cloud onto the global mesh."""
    return PointCloud(
        xyz=to_global(pc.xyz, P(), mesh),
        rel=to_global(pc.rel, P(), mesh),
        mask=to_global(pc.mask, P(), mesh),
    )
