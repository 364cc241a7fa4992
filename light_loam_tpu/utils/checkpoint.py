"""Checkpoint / resume for SLAM state.

The reference has no persistence beyond the append-mode pose file
(SURVEY.md §5) — map state lives in RAM only.  Here the full pipeline
state (odometry "last" clouds + poses, the map point stores, grid center
and odom→map correction) snapshots to a single .npz and restores exactly,
enabling resume and multi-host restart.
"""

from __future__ import annotations

from typing import Any, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from light_loam_tpu.models.mapping import MappingState
from light_loam_tpu.models.odometry import OdometryState


def _flatten(prefix: str, tree: Any, out: dict) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out[f"{prefix}__treedef"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8
    )
    for i, leaf in enumerate(leaves):
        out[f"{prefix}__{i}"] = np.asarray(leaf)


def _unflatten(prefix: str, template: Any, data) -> Any:
    leaves, treedef = jax.tree_util.tree_flatten(template)
    # Leaves are stored positionally; fields appended to a state type
    # since the snapshot show up as missing TRAILING indices and fall
    # back to the template (init) value.  A missing index FOLLOWED by a
    # present one means the field order changed — that cannot be mapped
    # safely, so it stays an error.
    present = [f"{prefix}__{i}" in data for i in range(len(leaves))]
    if any(p and not q for p, q in zip(present[1:], present[:-1])):
        raise ValueError(
            f"checkpoint is missing a non-trailing {prefix} leaf — "
            "state field order changed since the snapshot?"
        )
    new_leaves = []
    for i, leaf in enumerate(leaves):
        key = f"{prefix}__{i}"
        if not present[i]:
            new_leaves.append(jnp.asarray(leaf))  # appended-field default
            continue
        arr = data[key]
        if arr.shape != np.asarray(leaf).shape:
            raise ValueError(
                f"checkpoint shape mismatch at {prefix}[{i}]: "
                f"{arr.shape} vs {np.asarray(leaf).shape} — was the config "
                "changed since the snapshot?"
            )
        new_leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_state(
    path: str,
    odo_state: OdometryState,
    map_state: MappingState,
    frame: int = 0,
    extra: dict | None = None,
) -> None:
    out: dict = {"frame": np.asarray(frame)}
    _flatten("odo", odo_state, out)
    _flatten("map", map_state, out)
    if extra:
        for k, v in extra.items():
            out[f"extra__{k}"] = np.asarray(v)
    np.savez_compressed(path, **out)


def load_state(
    path: str,
    odo_template: OdometryState,
    map_template: MappingState,
) -> Tuple[OdometryState, MappingState, int, dict]:
    data = np.load(path)
    odo = _unflatten("odo", odo_template, data)
    mp = _unflatten("map", map_template, data)
    frame = int(data["frame"])
    extra = {
        k[len("extra__"):]: data[k] for k in data.files if k.startswith("extra__")
    }
    return odo, mp, frame, extra
