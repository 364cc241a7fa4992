"""Checkpoint forward/backward compatibility.

The reference has no persistence at all (SURVEY §5), so the contract here
is ours: snapshots store pytree leaves positionally (utils/checkpoint.py),
which means fields APPENDED to a state type since the snapshot must fall
back to their init value, while a reordered/removed field must fail loudly
rather than silently mis-assign arrays."""

import re

import numpy as np
import pytest

from light_loam_tpu.models.pipeline import Pipeline, PROFILES
from light_loam_tpu.utils.synthetic import World, simulate_scan, pad_cloud

CFG = PROFILES["hdl64-small"]


def _run_and_save(tmp_path, n_frames=2):
    world = World.urban(seed=21)
    pipe = Pipeline(CFG)
    for i in range(n_frames):
        pts = simulate_scan(world, np.array([0.4 * i, 0, 0]), n_azimuth=500,
                            noise=0.01, seed=40 + i)
        pipe.process_frame(*pad_cloud(pts, CFG.scan.max_points))
    ckpt = str(tmp_path / "full.npz")
    pipe.save(ckpt)
    return pipe, ckpt


def _resave_without(src, dst, drop_keys):
    data = np.load(src)
    kept = {k: data[k] for k in data.files if k not in drop_keys}
    np.savez(dst, **kept)


def test_missing_trailing_leaf_falls_back_to_template(tmp_path):
    """A snapshot taken before a field was appended to MappingState loads:
    the missing TRAILING leaf takes the fresh-pipeline (init) value and
    everything else restores exactly."""
    pipe, ckpt = _run_and_save(tmp_path)
    data = np.load(ckpt)
    map_idx = sorted(
        int(m.group(1)) for k in data.files
        if (m := re.fullmatch(r"map__(\d+)", k))
    )
    last = f"map__{map_idx[-1]}"
    legacy = str(tmp_path / "legacy.npz")
    _resave_without(ckpt, legacy, {last})

    fresh = Pipeline(CFG)
    import jax
    template_leaf = np.asarray(
        jax.tree_util.tree_flatten(fresh.map_state)[0][map_idx[-1]]
    )
    fresh.load(legacy)
    leaves = jax.tree_util.tree_flatten(fresh.map_state)[0]
    np.testing.assert_array_equal(np.asarray(leaves[-1]), template_leaf)
    # earlier leaves restored from the snapshot, not the template
    np.testing.assert_array_equal(
        np.asarray(leaves[0]),
        np.asarray(jax.tree_util.tree_flatten(pipe.map_state)[0][0]),
    )
    # and the restored pipeline still steps
    world = World.urban(seed=21)
    pts = simulate_scan(world, np.array([0.8, 0, 0]), n_azimuth=500,
                        noise=0.01, seed=42)
    r = fresh.process_frame(*pad_cloud(pts, CFG.scan.max_points))
    assert np.isfinite(r.odom_t).all()


def test_missing_middle_leaf_fails_loudly(tmp_path):
    """A gap that is NOT a trailing suffix means the field order changed —
    positional assignment would silently scramble state, so it must raise."""
    _, ckpt = _run_and_save(tmp_path)
    broken = str(tmp_path / "broken.npz")
    _resave_without(ckpt, broken, {"map__0"})
    pipe = Pipeline(CFG)
    with pytest.raises(ValueError, match="non-trailing"):
        pipe.load(broken)


def test_legacy_checkpoint_without_map_quats(tmp_path):
    """Snapshots written before map_quats existed restore with identity
    rotations so the quat/position histories stay in lockstep (save(),
    mapped_trajectory() and viz would otherwise crash on np.stack)."""
    pipe, ckpt = _run_and_save(tmp_path)
    legacy = str(tmp_path / "noquats.npz")
    _resave_without(ckpt, legacy, {"extra__map_quats"})

    fresh = Pipeline(CFG)
    fresh.load(legacy)
    qs, ts = fresh.mapped_trajectory()
    assert len(qs) == len(ts) == len(pipe.mapped_positions())
    # xyzw layout: identity is [0,0,0,1] ([1,0,0,0] would be a 180-deg
    # x-rotation written into every pre-upgrade row)
    np.testing.assert_allclose(
        qs, np.tile([0.0, 0, 0, 1.0], (len(ts), 1)), atol=0
    )
    # re-saving the restored pipeline round-trips
    fresh.save(str(tmp_path / "resave.npz"))
