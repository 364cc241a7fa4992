import numpy as np
import jax.numpy as jnp
import pytest

from light_loam_tpu.config import ScanConfig
from light_loam_tpu.ops import features as F
from light_loam_tpu.utils.synthetic import World, simulate_scan, pad_cloud

from oracle import oracle_features, oracle_ring_ids, oracle_rel_time


@pytest.fixture(scope="module")
def scan():
    world = World.urban(seed=3)
    pts = simulate_scan(world, np.array([0.0, 0.0, 0.0]), n_rings=64,
                        n_azimuth=900, noise=0.01, seed=7)
    return pts


CFG = ScanConfig(n_scans=64, h_max=1024, max_points=65536)


def run_kernel(pts, cfg=CFG):
    xyz, mask = pad_cloud(pts, cfg.max_points)
    return F.extract_features(jnp.asarray(xyz), jnp.asarray(mask), cfg)


def test_ring_ids_match_oracle(scan):
    cfg = CFG
    r2 = np.sum(scan**2, axis=1)
    pts = scan[r2 >= cfg.minimum_range**2]
    ring_o, ok_o = oracle_ring_ids(pts, 64)

    xyz, mask = pad_cloud(scan, cfg.max_points)
    finite = np.isfinite(xyz).all(axis=1)
    in_mask = mask & finite & (np.sum(xyz * xyz, axis=1) >= cfg.minimum_range**2)
    ring_k, ok_k = F.compute_ring_ids(jnp.asarray(xyz), jnp.asarray(in_mask), cfg)
    ring_k = np.asarray(ring_k)[np.asarray(in_mask)]
    ok_k = np.asarray(ok_k)[np.asarray(in_mask)]
    np.testing.assert_array_equal(ok_k, ok_o)
    np.testing.assert_array_equal(ring_k[ok_k], ring_o[ok_o])


def test_rel_time_matches_oracle(scan):
    cfg = CFG
    r2 = np.sum(scan**2, axis=1)
    pts = scan[r2 >= cfg.minimum_range**2]
    ring_o, ok_o = oracle_ring_ids(pts, 64)
    rel_o = oracle_rel_time(pts, ok_o)

    xyz, mask = pad_cloud(scan, cfg.max_points)
    in_mask = mask & (np.sum(xyz * xyz, axis=1) >= cfg.minimum_range**2)
    ring_k, ok_k = F.compute_ring_ids(jnp.asarray(xyz), jnp.asarray(in_mask), cfg)
    rel_k = F.compute_rel_time(jnp.asarray(xyz), jnp.asarray(in_mask), ok_k)
    # align: kernel arrays live on the padded raw layout; the oracle's on
    # the range-filtered compacted cloud
    sel = np.asarray(in_mask)
    rel_k = np.asarray(rel_k)[sel]
    ok_k_f = np.asarray(ok_k)[sel]
    np.testing.assert_array_equal(ok_k_f, ok_o)
    np.testing.assert_allclose(rel_k[ok_o], rel_o[ok_o], atol=1e-4)


def test_grid_matches_oracle_concat(scan):
    out = run_kernel(scan)
    o = oracle_features(scan, 64)
    counts = np.asarray(out.full.counts)
    # oracle ring sizes
    sizes = np.diff(np.concatenate([[0], o["end_ind"] + 6]))
    # end_ind[r]+6 is the cumulative size after ring r
    np.testing.assert_array_equal(counts, sizes)
    # spot-check a few rings' content
    grid = np.asarray(out.full.xyz)
    csum = 0
    for r in [0, 20, 40, 63]:
        n = sizes[r]
        start = (o["end_ind"] + 6)[r] - n
        if n > 0:
            np.testing.assert_allclose(
                grid[r, :n], o["cloud"][start : start + n], atol=1e-6
            )


def test_curvature_matches_oracle(scan):
    out = run_kernel(scan)
    o = oracle_features(scan, 64)
    grid_curv = np.asarray(F.compute_curvature(out.full.xyz))
    sizes = np.diff(np.concatenate([[0], o["end_ind"] + 6]))
    starts = (o["end_ind"] + 6) - sizes
    for r in [5, 30, 60]:
        n = sizes[r]
        if n < 17:
            continue
        seg = o["curvature"][starts[r] : starts[r] + n]
        # only the selection band [5, n-7] is defined in both layouts
        a = grid_curv[r, 5 : n - 6]
        b = seg[5 : n - 6]
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)


def test_selection_matches_oracle(scan):
    out = run_kernel(scan)
    o = oracle_features(scan, 64)

    sizes = np.diff(np.concatenate([[0], o["end_ind"] + 6]))
    starts = (o["end_ind"] + 6) - sizes

    # reconstruct oracle label grid
    lab_o = np.zeros((64, CFG.h_max), np.int8)
    for r in range(64):
        n = sizes[r]
        lab_o[r, :n] = o["label"][starts[r] : starts[r] + n]

    grid = out.full
    curv = F.compute_curvature(grid.xyz)
    lab_k, _ = F.select_features(grid, jnp.asarray(curv), CFG)
    lab_k = np.asarray(lab_k)

    agree = (lab_k == lab_o).mean()
    assert agree > 0.995, f"label agreement too low: {agree}"

    n_sharp_o = len(o["sharp"])
    n_flat_o = len(o["flat"])
    n_sharp_k = int(np.asarray(out.sharp.mask).sum())
    n_flat_k = int(np.asarray(out.flat.mask).sum())
    assert abs(n_sharp_k - n_sharp_o) <= max(3, 0.02 * n_sharp_o)
    assert abs(n_flat_k - n_flat_o) <= max(5, 0.02 * n_flat_o)


def test_feature_cloud_sanity(scan):
    out = run_kernel(scan)
    n_sharp = int(np.asarray(out.sharp.mask).sum())
    n_less_sharp = int(np.asarray(out.less_sharp.mask).sum())
    n_flat = int(np.asarray(out.flat.mask).sum())
    n_less_flat = int(np.asarray(out.less_flat.mask).sum())
    assert 0 < n_sharp <= n_less_sharp
    assert 0 < n_flat < n_less_flat
    # ring channel recoverable
    rel = np.asarray(out.sharp.rel)[np.asarray(out.sharp.mask)]
    rings = np.floor(rel).astype(int)
    assert rings.min() >= 0 and rings.max() < 64


def test_occlusion_filter_branch(scan):
    """[EXT] occlusion filter (ScanConfig.occlusion_filter, default off —
    original LOAM's shadow-boundary/parallel-beam suppression): the ON
    branch must actually suppress points at range discontinuities and
    still produce a healthy feature set."""
    import dataclasses

    cfg_on = dataclasses.replace(CFG, occlusion_filter=True)
    out_on = run_kernel(scan, cfg_on)
    out_off = run_kernel(scan)

    # the mask engages on an urban scene (boxes occlude ground/walls)
    finite = np.isfinite(scan).all(axis=1)
    xyz, mask = pad_cloud(scan[finite], CFG.max_points)
    r2 = np.sum(xyz * xyz, axis=1)
    in_mask = jnp.asarray(mask & (r2 >= CFG.minimum_range**2))
    ring, ring_ok = F.compute_ring_ids(jnp.asarray(xyz), in_mask, CFG)
    rel = ring.astype(jnp.float32)
    grid = F.build_range_image(jnp.asarray(xyz), rel, ring, ring_ok, CFG)
    occ = np.asarray(F.occlusion_mask(grid, cfg_on))
    n_grid = int(np.asarray(grid.mask).sum())
    assert occ.sum() > 0, "no occlusion boundaries found on urban scene"
    assert occ.sum() < 0.3 * n_grid, "filter suppresses implausibly much"

    # suppression only removes candidates: every cloud stays populated,
    # nothing grows
    for name in ("sharp", "less_sharp", "flat"):
        n_on = int(np.asarray(getattr(out_on, name).mask).sum())
        n_off = int(np.asarray(getattr(out_off, name).mask).sum())
        assert 0 < n_on <= n_off, (name, n_on, n_off)
