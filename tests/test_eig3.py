import numpy as np
import jax.numpy as jnp

from light_loam_tpu.ops.eig3 import eigh3x3


def test_eigh3x3_matches_numpy():
    rng = np.random.default_rng(0)
    B = rng.normal(size=(64, 3, 3)).astype(np.float32)
    A = np.einsum("nij,nkj->nik", B, B)  # SPD
    vals, vmax = eigh3x3(jnp.asarray(A))
    vals, vmax = np.asarray(vals), np.asarray(vmax)
    for i in range(64):
        w, V = np.linalg.eigh(A[i])
        np.testing.assert_allclose(vals[i], w, rtol=2e-3, atol=2e-3)
        v_ref = V[:, 2]
        dot = abs(float(np.dot(vmax[i], v_ref)))
        assert dot > 0.999, f"eigvec mismatch at {i}: {dot}"


def test_eigh3x3_line_covariance():
    # points along a line: lambda_max >> others, eigvec = direction
    rng = np.random.default_rng(1)
    d = np.array([1.0, 2.0, -0.5])
    d /= np.linalg.norm(d)
    t = rng.uniform(-1, 1, (5, 1))
    pts = t * d + rng.normal(scale=1e-3, size=(5, 3))
    c = pts.mean(axis=0)
    cov = (pts - c).T @ (pts - c)
    vals, vmax = eigh3x3(jnp.asarray(cov[None].astype(np.float32)))
    assert float(vals[0, 2]) > 3 * float(vals[0, 1])
    assert abs(float(jnp.dot(vmax[0], d))) > 0.999
