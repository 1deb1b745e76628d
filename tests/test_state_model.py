"""15-DoF product-state (SO(3)×R¹²) smoke + manifold tests
(reference tst/state_model.cpp:83-112, tst/manifold.cpp)."""

import jax.numpy as jnp
import numpy as np

from moptimizer_0_tpu import LMConfig, levenberg_marquardt
from moptimizer_0_tpu.core import manifold
from moptimizer_0_tpu.core.residual import problem
from moptimizer_0_tpu.lie import so3
from moptimizer_0_tpu.models.state import product_state_block


def test_product_state_converges_to_anchor():
    """r = x ⊟ x₀ → LM drives x to the anchor state."""
    anchor_rot = jnp.array([0.1, 0.2, 0.3])
    anchor_lin = jnp.zeros(12)
    blk = product_state_block(anchor_rot, anchor_lin)
    x0 = jnp.concatenate([jnp.array([0.6, 0.8, 0.3]), jnp.zeros(12).at[0].set(-0.4)])
    res = levenberg_marquardt(
        problem(blk), x0, LMConfig(diff_mode="fd", max_iterations=15)
    )
    # rotation part equal as rotations
    R_est = so3.exp(res.x[:3])
    R_anchor = so3.exp(anchor_rot)
    np.testing.assert_allclose(R_est, R_anchor, atol=1e-6)
    np.testing.assert_allclose(res.x[3:], anchor_lin, atol=1e-6)


def test_euclidean_manifold():
    """⊞/⊟ exact (reference tst/manifold.cpp:5-29)."""
    m = manifold.Euclidean(dim=3)
    x = jnp.array([1.0, -2.0, 3.0])
    d = jnp.array([0.5, 0.25, -1.0])
    np.testing.assert_array_equal(m.retract(x, d), x + d)
    np.testing.assert_array_equal(m.local(x, x + d), d)


def test_so3_manifold_matches_quaternion_construction():
    """SO(3) ⊞ via Exp ≈ unit-quaternion construction for small delta
    (reference tst/manifold.cpp:58-81)."""
    m = manifold.SO3()
    x = jnp.zeros(3)
    delta = jnp.array([0.02, 0.0, 0.0])
    R = so3.exp(m.retract(x, delta))
    q = np.array([0.02 / 2.0, 0.0, 0.0])  # small-angle quaternion vector part ≈ w/2
    w = np.sqrt(1 - q @ q)
    # quaternion to rotation
    x_, y_, z_ = q
    R_q = np.array(
        [
            [1 - 2 * (y_**2 + z_**2), 2 * (x_ * y_ - z_ * w), 2 * (x_ * z_ + y_ * w)],
            [2 * (x_ * y_ + z_ * w), 1 - 2 * (x_**2 + z_**2), 2 * (y_ * z_ - x_ * w)],
            [2 * (x_ * z_ - y_ * w), 2 * (y_ * z_ + x_ * w), 1 - 2 * (x_**2 + y_**2)],
        ]
    )
    np.testing.assert_allclose(R, R_q, atol=5e-6)


def test_se3_manifold_roundtrip():
    m = manifold.SE3()
    x = jnp.array([1.0, 2.0, 3.0, 0.3, -0.2, 0.1])
    d = jnp.array([0.1, -0.1, 0.2, 0.05, 0.02, -0.03])
    y = m.retract(x, d)
    np.testing.assert_allclose(m.local(x, y), d, atol=1e-10)


def test_product_manifold():
    m = manifold.Product(parts=(manifold.SO3(), manifold.Euclidean(dim=12)))
    assert m.dim == 15 and m.tangent_dim == 15
    x = jnp.zeros(15)
    d = jnp.concatenate([jnp.array([0.1, 0.2, 0.3]), jnp.ones(12)])
    y = m.retract(x, d)
    np.testing.assert_allclose(y[3:], jnp.ones(12), atol=0)
    np.testing.assert_allclose(m.local(x, y), d, atol=1e-10)


def test_manifold_lm_on_product_state():
    """Solve the product-state problem with a true manifold retraction —
    the wiring the reference left as TODO (src/levenberg_marquadt_dyn.cpp:82)."""
    anchor_rot = jnp.array([0.1, 0.2, 0.3])
    anchor_lin = jnp.zeros(12)
    blk = product_state_block(anchor_rot, anchor_lin)
    man = manifold.Product(parts=(manifold.SO3(), manifold.Euclidean(dim=12)))
    x0 = jnp.concatenate([jnp.array([0.6, 0.8, 0.3]), jnp.zeros(12)])
    res = levenberg_marquardt(
        problem(blk), x0, LMConfig(diff_mode="auto", max_iterations=20), manifold=man
    )
    np.testing.assert_allclose(so3.exp(res.x[:3]), so3.exp(anchor_rot), atol=1e-6)
    np.testing.assert_allclose(res.x[3:], anchor_lin, atol=1e-6)
