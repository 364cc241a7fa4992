import numpy as np
import jax.numpy as jnp

from light_loam_tpu.ops.voxel import voxel_downsample


def test_voxel_centroids():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 5, size=(500, 3)).astype(np.float32)
    mask = np.ones(500, bool)
    mask[400:] = False
    leaf = 1.0
    xyz, rel, m, _ = voxel_downsample(
        jnp.asarray(pts), jnp.zeros(500), jnp.asarray(mask), leaf, 1024
    )
    xyz, m = np.asarray(xyz), np.asarray(m)

    # NumPy reference: centroid per occupied voxel
    keys = np.floor(pts[:400] / leaf).astype(int)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    cent = np.zeros((len(uniq), 3))
    cnt = np.zeros(len(uniq))
    np.add.at(cent, inv, pts[:400])
    np.add.at(cnt, inv, 1)
    cent /= cnt[:, None]

    assert m.sum() == len(uniq)
    got = xyz[m]
    # order-insensitive comparison
    got_sorted = got[np.lexsort(got.T)]
    cent_sorted = cent[np.lexsort(cent.T)]
    np.testing.assert_allclose(got_sorted, cent_sorted, atol=1e-5)


def test_voxel_extra_key_separates():
    pts = np.zeros((10, 3), np.float32)  # all in one voxel
    mask = np.ones(10, bool)
    extra = np.array([0] * 5 + [1] * 5, np.int32)
    xyz, rel, m, ex = voxel_downsample(
        jnp.asarray(pts), jnp.arange(10.0), jnp.asarray(mask), 0.5, 16,
        extra_key=jnp.asarray(extra),
    )
    m = np.asarray(m)
    assert m.sum() == 2  # one centroid per extra-key group
    rel = np.asarray(rel)[m]
    np.testing.assert_allclose(sorted(rel), [2.0, 7.0])


def test_voxel_empty():
    pts = np.zeros((8, 3), np.float32)
    mask = np.zeros(8, bool)
    _, _, m, _ = voxel_downsample(
        jnp.asarray(pts), jnp.zeros(8), jnp.asarray(mask), 0.5, 16
    )
    assert not np.asarray(m).any()


def test_voxel_rings_grid_layout():
    """Per-ring downsample: same voxels as per-ring flat calls, slotted
    into the (R, C) grid with a valid prefix per ring."""
    from light_loam_tpu.ops.voxel import voxel_downsample_rings

    rng = np.random.default_rng(11)
    R, H, C = 4, 64, 32
    xyz = rng.uniform(-4, 4, (R, H, 3)).astype(np.float32)
    rel = np.broadcast_to(
        np.arange(R, dtype=np.float32)[:, None], (R, H)
    ).copy()
    mask = rng.random((R, H)) < 0.7
    gx, gr, gm = voxel_downsample_rings(
        jnp.asarray(xyz), jnp.asarray(rel), jnp.asarray(mask), 0.5, C
    )
    gx, gr, gm = np.asarray(gx), np.asarray(gr), np.asarray(gm)
    for r in range(R):
        fx, fr, fm, _ = voxel_downsample(
            jnp.asarray(xyz[r]), jnp.asarray(rel[r]), jnp.asarray(mask[r]),
            0.5, H,
        )
        fx, fm = np.asarray(fx), np.asarray(fm)
        n = fm.sum()
        if n <= C:
            assert gm[r].sum() == n
            np.testing.assert_allclose(gx[r][: n], fx[: n], rtol=1e-6)
        else:
            assert gm[r].sum() == C  # decimated, uniform stride
            kept = fx[(np.arange(C) * n) // C]
            np.testing.assert_allclose(gx[r][:C], kept, rtol=1e-6)
        # valid prefix
        assert not gm[r][gm[r].argmin():].any() or gm[r].all()


def test_voxel_rings_overflow_decimates_uniformly():
    from light_loam_tpu.ops.voxel import voxel_downsample_rings

    R, H, C = 1, 128, 16
    # 128 distinct voxels on a line -> n=128 > C=16
    xyz = np.zeros((R, H, 3), np.float32)
    xyz[0, :, 0] = np.arange(H) * 1.0
    mask = np.ones((R, H), bool)
    gx, _, gm = voxel_downsample_rings(
        jnp.asarray(xyz), jnp.zeros((R, H)), jnp.asarray(mask), 0.5, C
    )
    gm = np.asarray(gm)
    assert gm[0].sum() == C
    xs = np.sort(np.asarray(gx)[0, :, 0])
    gaps = np.diff(xs)
    assert gaps.max() <= 2 * gaps.min() + 1e-6  # uniform coverage
