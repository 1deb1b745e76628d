"""ICP with real correspondence search (no index alignment) + NN kernel tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from moptimizer_0_tpu.lie import se3
from moptimizer_0_tpu.ops.nn_search import _nn_pallas, _nn_xla, nearest_neighbors
from moptimizer_0_tpu.registration import icp
from moptimizer_0_tpu import GemanMcClure


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(11)
    src = rng.uniform(0, 10, size=(4000, 3))
    x_true = np.array([0.3, -0.2, 0.4, 0.05, -0.04, 0.08])
    T = np.asarray(se3.transform_from_params6(jnp.asarray(x_true)))
    tgt = src @ T[:3, :3].T + T[:3, 3]
    perm = rng.permutation(len(tgt))  # destroy index alignment
    return jnp.asarray(src), jnp.asarray(tgt[perm]), x_true, T


def test_nn_xla_matches_numpy():
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.uniform(0, 10, (500, 3)), jnp.float32)
    p = jnp.asarray(rng.uniform(0, 10, (800, 3)), jnp.float32)
    d2 = ((np.asarray(q)[:, None] - np.asarray(p)[None]) ** 2).sum(-1)
    idx, dist = _nn_xla(q, p)
    np.testing.assert_array_equal(idx, d2.argmin(1))
    np.testing.assert_allclose(dist, d2.min(1), rtol=1e-4, atol=1e-4)


def test_nn_pallas_interpret_matches_numpy():
    """Kernel logic validated in interpreter mode (runs on CPU)."""
    rng = np.random.default_rng(6)
    q = jnp.asarray(rng.uniform(0, 10, (600, 3)), jnp.float32)
    p = jnp.asarray(rng.uniform(0, 10, (1100, 3)), jnp.float32)
    d2 = ((np.asarray(q)[:, None] - np.asarray(p)[None]) ** 2).sum(-1)
    idx, dist = _nn_pallas(q, p, block_q=256, block_p=512, interpret=True)
    np.testing.assert_array_equal(idx, d2.argmin(1))
    np.testing.assert_allclose(dist, d2.min(1), rtol=1e-4, atol=1e-4)


def test_nn_unequal_sizes_and_padding():
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.uniform(0, 10, (33, 3)), jnp.float32)  # not tile-aligned
    p = jnp.asarray(rng.uniform(0, 10, (77, 3)), jnp.float32)
    d2 = ((np.asarray(q)[:, None] - np.asarray(p)[None]) ** 2).sum(-1)
    idx, _ = nearest_neighbors(q, p, backend="xla")
    np.testing.assert_array_equal(idx, d2.argmin(1))
    idx2, _ = _nn_pallas(q, p, block_q=256, block_p=512, interpret=True)
    np.testing.assert_array_equal(idx2, d2.argmin(1))


def test_icp_unknown_correspondences(scene):
    """ICP recovers the transform from a shuffled target cloud — the full
    pipeline the reference never assembled."""
    src, tgt_shuffled, x_true, T_true = scene
    res = icp(src, tgt_shuffled, nn_backend="xla")
    T_est = np.asarray(se3.transform_from_params6(res.x))
    err = np.linalg.inv(T_est) @ T_true
    np.testing.assert_allclose(err[:3, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(err[:3, 3], 0.0, atol=1e-5)


def test_icp_with_outliers_and_robust_loss(scene):
    """Outlier target points + Geman-McClure + max correspondence distance."""
    src, tgt_shuffled, x_true, T_true = scene
    rng = np.random.default_rng(13)
    outliers = jnp.asarray(rng.uniform(50, 60, size=(500, 3)))
    tgt_noisy = jnp.concatenate([tgt_shuffled, outliers])
    res = icp(
        src,
        tgt_noisy,
        nn_backend="xla",
        loss=GemanMcClure(tau=jnp.asarray(1.0)),
        max_corr_dist=2.0,
    )
    T_est = np.asarray(se3.transform_from_params6(res.x))
    err = np.linalg.inv(T_est) @ T_true
    np.testing.assert_allclose(err[:3, :3], np.eye(3), atol=1e-5)
    np.testing.assert_allclose(err[:3, 3], 0.0, atol=1e-4)


def test_gicp_unknown_correspondences(scene):
    """GICP (per-point covariances, state-dependent information) recovers the
    transform from a shuffled target cloud."""
    from moptimizer_0_tpu.registration import gicp

    src, tgt_shuffled, x_true, T_true = scene
    res = gicp(src, tgt_shuffled, nn_backend="xla", k=8)
    T_est = np.asarray(se3.transform_from_params6(res.x))
    err = np.linalg.inv(T_est) @ T_true
    np.testing.assert_allclose(err[:3, :3], np.eye(3), atol=1e-4)
    np.testing.assert_allclose(err[:3, 3], 0.0, atol=1e-3)


def test_surface_normals_and_covariances():
    """PCA normals on a synthetic plane point along its true normal."""
    from moptimizer_0_tpu.ops.surface import estimate_normals, gicp_covariances

    rng = np.random.default_rng(20)
    # plane z = 0.3x + 0.1y with small jitter
    xy = rng.uniform(0, 10, size=(2000, 2))
    z = 0.3 * xy[:, 0] + 0.1 * xy[:, 1] + 0.001 * rng.normal(size=2000)
    cloud = jnp.asarray(np.column_stack([xy, z]))
    n_true = np.array([-0.3, -0.1, 1.0])
    n_true /= np.linalg.norm(n_true)

    normals = np.asarray(estimate_normals(cloud, k=12, orient_to=[0, 0, 100.0]))
    dots = normals @ n_true
    assert np.mean(dots > 0.99) > 0.95

    covs = np.asarray(gicp_covariances(cloud, k=12, epsilon=1e-3))
    # smallest eigen-direction of C should be ~the normal, with eigenvalue ε
    w, v = np.linalg.eigh(covs[0])
    np.testing.assert_allclose(w[0], 1e-3, rtol=1e-3)
    assert abs(v[:, 0] @ n_true) > 0.99
