"""Validate the masked-argmin correspondence search against a literal
NumPy port of the reference's ring-sorted array scans
(laserOdometry.cpp:491-737)."""

import numpy as np
import jax.numpy as jnp

from light_loam_tpu.core.frame import PointCloud
from light_loam_tpu.ops import knn

DIST_SQ = 25.0
NEARBY = 2.5


def literal_corner_match(q, ref, ring):
    """The reference's exact up/down scan for the corner 2nd point."""
    d = np.sum((ref - q) ** 2, axis=1)
    a = int(np.argmin(d))
    if d[a] >= DIST_SQ:
        return -1, -1
    ra = ring[a]
    best2, i2 = DIST_SQ, -1
    for j in range(a + 1, len(ref)):
        if ring[j] <= ra:
            continue
        if ring[j] > ra + NEARBY:
            break
        if d[j] < best2:
            best2, i2 = d[j], j
    for j in range(a - 1, -1, -1):
        if ring[j] >= ra:
            continue
        if ring[j] < ra - NEARBY:
            break
        if d[j] < best2:
            best2, i2 = d[j], j
    return a, i2


def literal_surf_match(q, ref, ring):
    d = np.sum((ref - q) ** 2, axis=1)
    a = int(np.argmin(d))
    if d[a] >= DIST_SQ:
        return -1, -1, -1
    ra = ring[a]
    best2, i2 = DIST_SQ, -1
    best3, i3 = DIST_SQ, -1
    for j in range(a + 1, len(ref)):
        if ring[j] > ra + NEARBY:
            break
        if ring[j] <= ra and d[j] < best2:
            best2, i2 = d[j], j
        elif ring[j] > ra and d[j] < best3:
            best3, i3 = d[j], j
    for j in range(a - 1, -1, -1):
        if ring[j] < ra - NEARBY:
            break
        if ring[j] >= ra and d[j] < best2:
            best2, i2 = d[j], j
        elif ring[j] < ra and d[j] < best3:
            best3, i3 = d[j], j
    return a, i2, i3


def make_ring_sorted_cloud(rng, n=400, n_rings=16):
    ring = np.sort(rng.integers(0, n_rings, n))
    xyz = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    # within-ring sorted order not required for correctness of the scans
    rel = ring + 0.05 * rng.random(n)
    return xyz, rel.astype(np.float32), ring


def test_corner_matches_literal_scan():
    rng = np.random.default_rng(0)
    xyz, rel, ring = make_ring_sorted_cloud(rng)
    ref = PointCloud(xyz=jnp.asarray(xyz), rel=jnp.asarray(rel),
                     mask=jnp.ones(len(xyz), bool))
    queries = rng.uniform(-10, 10, (64, 3)).astype(np.float32)
    out = knn.corner_correspondences(
        jnp.asarray(queries), jnp.ones(64, bool), ref
    )
    for i in range(64):
        a, b = literal_corner_match(queries[i], xyz, ring)
        if a < 0 or b < 0:
            assert not bool(out.valid[i])
        else:
            assert bool(out.valid[i])
            assert int(out.a_idx[i]) == a
            # argmin may pick a different index at exactly equal distance;
            # compare distances instead of indices
            db_k = np.sum((xyz[int(out.b_idx[i])] - queries[i]) ** 2)
            db_o = np.sum((xyz[b] - queries[i]) ** 2)
            np.testing.assert_allclose(db_k, db_o, rtol=1e-5)
            assert ring[int(out.b_idx[i])] != ring[a]
            assert abs(ring[int(out.b_idx[i])] - ring[a]) <= NEARBY


def test_surf_matches_literal_scan():
    rng = np.random.default_rng(1)
    xyz, rel, ring = make_ring_sorted_cloud(rng, n=600)
    ref = PointCloud(xyz=jnp.asarray(xyz), rel=jnp.asarray(rel),
                     mask=jnp.ones(len(xyz), bool))
    queries = rng.uniform(-10, 10, (64, 3)).astype(np.float32)
    out = knn.surf_correspondences(
        jnp.asarray(queries), jnp.ones(64, bool), ref, tile=128
    )
    for i in range(64):
        a, b, c = literal_surf_match(queries[i], xyz, ring)
        if a < 0 or b < 0 or c < 0:
            assert not bool(out.valid[i])
        else:
            assert bool(out.valid[i])
            assert int(out.a_idx[i]) == a
            db_k = np.sum((xyz[int(out.b_idx[i])] - queries[i]) ** 2)
            db_o = np.sum((xyz[b] - queries[i]) ** 2)
            np.testing.assert_allclose(db_k, db_o, rtol=1e-5)
            dc_k = np.sum((xyz[int(out.c_idx[i])] - queries[i]) ** 2)
            dc_o = np.sum((xyz[c] - queries[i]) ** 2)
            np.testing.assert_allclose(dc_k, dc_o, rtol=1e-5)
            assert ring[int(out.b_idx[i])] == ring[a]
            assert ring[int(out.c_idx[i])] != ring[a]


def test_knn_tiled_matches_bruteforce():
    rng = np.random.default_rng(2)
    ref = rng.uniform(-5, 5, (1000, 3)).astype(np.float32)
    mask = np.ones(1000, bool)
    mask[900:] = False
    q = rng.uniform(-5, 5, (32, 3)).astype(np.float32)
    d, i = knn.knn_tiled(jnp.asarray(q), jnp.asarray(ref), jnp.asarray(mask),
                         k=5, tile=256)
    d, i = np.asarray(d), np.asarray(i)
    full = np.sum((q[:, None, :] - ref[None, :900, :]) ** 2, axis=-1)
    for r in range(32):
        expect = np.sort(full[r])[:5]
        np.testing.assert_allclose(np.sort(d[r]), expect, rtol=1e-3, atol=1e-4)
        assert (i[r] < 900).all()
    # ascending order within each row
    assert (np.diff(d, axis=1) >= -1e-6).all()


def test_masked_queries_invalid():
    rng = np.random.default_rng(3)
    xyz, rel, ring = make_ring_sorted_cloud(rng)
    ref = PointCloud(xyz=jnp.asarray(xyz), rel=jnp.asarray(rel),
                     mask=jnp.ones(len(xyz), bool))
    q = rng.uniform(-5, 5, (8, 3)).astype(np.float32)
    out = knn.corner_correspondences(jnp.asarray(q), jnp.zeros(8, bool), ref)
    assert not np.asarray(out.valid).any()


def _grid_cloud(rng, R=8, C=64, fill=0.6):
    """Random ring-slotted grid cloud: ring r owns rows [r*C, r*C+C)."""
    xyz = rng.uniform(-6, 6, (R * C, 3)).astype(np.float32)
    mask = np.zeros(R * C, bool)
    rel = np.zeros(R * C, np.float32)
    for r in range(R):
        n = rng.integers(int(fill * C * 0.5), C + 1)
        mask[r * C : r * C + n] = True
        rel[r * C : (r + 1) * C] = r + 0.05
    return xyz, rel, mask


def test_surf_grid_matches_two_pass():
    """surf_correspondences_grid must agree EXACTLY (indices and
    validity) with the layout-agnostic two-pass search on a grid-layout
    cloud — it is the same brute-force mathematics reorganised around the
    ring slots, including tie-break order."""
    rng = np.random.default_rng(7)
    R, C = 8, 64
    xyz, rel, mask = _grid_cloud(rng, R, C)
    ref = PointCloud(xyz=jnp.asarray(xyz), rel=jnp.asarray(rel),
                     mask=jnp.asarray(mask))
    q = rng.uniform(-6, 6, (96, 3)).astype(np.float32)
    qm = np.ones(96, bool)
    qm[90:] = False
    old = knn.surf_correspondences(jnp.asarray(q), jnp.asarray(qm), ref,
                                   tile=128)
    new = knn.surf_correspondences_grid(jnp.asarray(q), jnp.asarray(qm),
                                        ref, R, rings_per_tile=2)
    ov, nv = np.asarray(old.valid), np.asarray(new.valid)
    assert (ov == nv).all()
    assert ov.any()  # non-degenerate fixture
    for name in ("a_idx", "b_idx", "c_idx"):
        o = np.asarray(getattr(old, name))[ov]
        n = np.asarray(getattr(new, name))[ov]
        assert (o == n).all(), name


def test_surf_compacted_count_aware_matches_slotted():
    """Count-aware tiled search on a live-prefix-compacted cloud must
    reproduce the full slotted sweep exactly: compaction preserves the
    live points' relative (ring-major) order, so masked mins pick the
    same winners and the gathered rows are bitwise identical — only the
    index VALUES change (positions in the compacted array)."""
    from light_loam_tpu.ops.voxel import compact_rows

    rng = np.random.default_rng(11)
    R, C = 8, 64
    xyz, rel, mask = _grid_cloud(rng, R, C, fill=0.5)
    ref = PointCloud(xyz=jnp.asarray(xyz), rel=jnp.asarray(rel),
                     mask=jnp.asarray(mask))
    km, kx, kr = compact_rows(ref.mask, ref.capacity, ref.xyz, ref.rel)
    cref = PointCloud(xyz=kx, rel=kr, mask=km)
    n_live = int(np.asarray(km).sum())
    assert n_live == mask.sum() and n_live < R * C

    q = rng.uniform(-6, 6, (96, 3)).astype(np.float32)
    qm = np.ones(96, bool)
    qm[90:] = False
    full = knn.surf_correspondences(jnp.asarray(q), jnp.asarray(qm), ref,
                                    tile=128)
    fast = knn.surf_correspondences(jnp.asarray(q), jnp.asarray(qm), cref,
                                    tile=128, ref_count=n_live)
    fv, cv = np.asarray(full.valid), np.asarray(fast.valid)
    assert (fv == cv).all()
    assert fv.any()
    for name in ("a_idx", "b_idx", "c_idx"):
        fr = np.asarray(ref.xyz)[np.asarray(getattr(full, name))[fv]]
        cr = np.asarray(cref.xyz)[np.asarray(getattr(fast, name))[fv]]
        assert (fr == cr).all(), name

    # count 0: no tiles visited, nothing valid
    empty = knn.surf_correspondences(
        jnp.asarray(q), jnp.asarray(qm),
        PointCloud.zeros(R * C), tile=128, ref_count=0)
    assert not np.asarray(empty.valid).any()


def test_odometry_tiled_compaction_equivalence():
    """odometry_step with the tiled (compacting, count-aware) search
    must match the grid search bitwise at the pose level: identical
    factor rows in identical order -> identical LM trajectory."""
    import dataclasses

    from light_loam_tpu.config import HDL64_SMALL
    from light_loam_tpu.models.odometry import OdometryState, odometry_step
    from light_loam_tpu.ops.features import extract_features
    from light_loam_tpu.utils.synthetic import World, pad_cloud, simulate_scan

    cfg = HDL64_SMALL
    world = World.urban(seed=3)
    states = {}
    for mode in ("tiled", "grid"):
        ocfg = dataclasses.replace(cfg.odometry, surf_knn=mode)
        st = OdometryState.init(cfg.scan.max_less_sharp,
                                cfg.scan.max_less_flat)
        for i in range(3):
            pts = simulate_scan(
                world, np.array([0.8 * i, 0.0, 0.0]),
                n_rings=cfg.scan.n_scans,
                lower_deg=cfg.scan.lower_bound_deg,
                upper_deg=cfg.scan.upper_bound_deg,
                n_azimuth=600, noise=0.01, seed=40 + i)
            xyz, m = pad_cloud(pts, cfg.scan.max_points)
            feats = extract_features(jnp.asarray(xyz), jnp.asarray(m),
                                     cfg.scan)
            st, out = odometry_step(st, feats, ocfg, cfg.scan.scan_period)
        states[mode] = np.concatenate(
            [np.asarray(out.q_w), np.asarray(out.t_w)])
    np.testing.assert_allclose(states["tiled"], states["grid"],
                               rtol=0, atol=1e-5)


def test_surf_grid_empty_ref():
    rng = np.random.default_rng(8)
    R, C = 4, 32
    ref = PointCloud(xyz=jnp.zeros((R * C, 3)), rel=jnp.zeros(R * C),
                     mask=jnp.zeros(R * C, bool))
    q = rng.uniform(-5, 5, (16, 3)).astype(np.float32)
    out = knn.surf_correspondences_grid(jnp.asarray(q),
                                        jnp.ones(16, bool), ref, R)
    assert not np.asarray(out.valid).any()
