"""SO(3): hat/vee, Rodrigues exp/log, left/right Jacobians.

Functional equivalent of reference so3.cpp:43-155 (`Exp`, `Log`,
`leftJacobian`, `rightJacobian`, `inverseRightJacobian`), re-derived for JAX:

* small-angle handling uses Taylor expansions under `jnp.where` instead of
  hard identity-matrix branches (reference so3.cpp:48,63: returns I when
  θ ≤ 10ε) so every function stays differentiable at θ = 0;
* the reference's left/right "Jacobians" (so3.cpp:128-155) drop the
  (θ−sinθ)/θ³·K² term — we implement the full standard series (and therefore
  agree with AD to machine precision, which the reference does not).
"""

import jax.numpy as jnp

# Taylor switch-over: well inside the region where the 2-term Taylor series
# is accurate to full precision for both f32 and f64.
_SMALL = 1e-5


def hat(w):
    """Skew-symmetric matrix from a 3-vector (reference SKEW_SYMMETRIC_FROM, so3.h:4)."""
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(w0)
    return jnp.stack(
        [
            jnp.stack([z, -w2, w1], axis=-1),
            jnp.stack([w2, z, -w0], axis=-1),
            jnp.stack([-w1, w0, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Inverse of `hat`."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _theta_sq(w):
    return jnp.sum(w * w, axis=-1)


def _safe_theta(t_sq):
    """(small, t_safe): t_safe = √t_sq clamped away from 0 so its gradient is
    finite — `jnp.where` alone does not stop NaN cotangents from the untaken
    branch (sqrt'(0) = ∞)."""
    small = t_sq < _SMALL * _SMALL
    t_safe = jnp.sqrt(jnp.where(small, jnp.ones_like(t_sq), t_sq))
    return small, t_safe


def _sin_t_over_t(t_sq):
    # sin(θ)/θ, Taylor: 1 − θ²/6 + θ⁴/120
    small, t = _safe_theta(t_sq)
    return jnp.where(small, 1.0 - t_sq / 6.0 + t_sq * t_sq / 120.0, jnp.sin(t) / t)


def _one_minus_cos_over_t_sq(t_sq):
    # (1 − cos θ)/θ², Taylor: 1/2 − θ²/24 + θ⁴/720
    small, t = _safe_theta(t_sq)
    return jnp.where(small, 0.5 - t_sq / 24.0 + t_sq * t_sq / 720.0, (1.0 - jnp.cos(t)) / (t * t))


def _t_minus_sin_over_t_cubed(t_sq):
    # (θ − sin θ)/θ³, Taylor: 1/6 − θ²/120 + θ⁴/5040
    small, t = _safe_theta(t_sq)
    return jnp.where(
        small, 1.0 / 6.0 - t_sq / 120.0 + t_sq * t_sq / 5040.0, (t - jnp.sin(t)) / (t * t * t)
    )


def exp(w):
    """Rodrigues: R = I + sin(θ)/θ·K + (1−cos θ)/θ²·K², K = hat(w).

    Matches reference so3::Exp (so3.cpp:43-75) away from θ≈0; at small θ uses
    the Taylor form instead of snapping to identity.
    """
    t_sq = _theta_sq(w)
    K = hat(w)
    K2 = K @ K
    a = _sin_t_over_t(t_sq)[..., None, None]
    b = _one_minus_cos_over_t_sq(t_sq)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a * K + b * K2


def exp_dt(ang_vel, dt):
    """Angular-velocity integration: R = Exp(ω·dt).

    Counterpart of the reference's two-argument overload
    ``so3::Exp(ang_vel, dt)`` (so3.cpp:76-93), which applies Rodrigues at
    angle ‖ω‖·dt about axis ω/‖ω‖ — algebraically exp(ω·dt), the one-step
    rigid-body integrator IMU preintegration builds on. Here the product
    form is exact by construction (no separate axis normalization), and the
    small-angle Taylor branch of :func:`exp` replaces the reference's
    snap-to-identity below ‖ω‖ = 1e-7, keeping the map differentiable in
    both ω and dt.
    """
    dt = jnp.asarray(dt, jnp.asarray(ang_vel).dtype)
    return exp(ang_vel * dt[..., None])


def log(R):
    """Axis-angle from rotation matrix, accurate over the full range [0, π].

    Extracts a unit quaternion via Shepperd's pivot selection (largest of
    {4w², 4x², 4y², 4z²}), then w = θ·axis with θ = 2·atan2(‖q_v‖, q_w) —
    well-conditioned at both θ ≈ 0 and θ ≈ π. The classic
    θ/(2 sin θ)·vee(R − Rᵀ) formula (reference so3::Log, so3.cpp:96-105)
    is 0/0 at θ = π (R becomes symmetric), which silently corrupts any
    trajectory that passes through a half-turn; the quaternion route has no
    singular angle.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    # Four pivot candidates: each equals 4·(that quaternion component)².
    qw2 = 1.0 + m00 + m11 + m22
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22
    cands = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    pivot = jnp.argmax(cands, axis=-1)
    # The largest candidate is ≥ 1 (they sum to 4), so s is safely nonzero.
    s = jnp.sqrt(jnp.maximum(jnp.max(cands, axis=-1), 1.0))  # = 2·|pivot comp|
    d = 0.5 / s  # 1/(2s)
    # Quaternion (w, x, y, z) for each pivot choice; identities used:
    # m21−m12=4wx, m02−m20=4wy, m10−m01=4wz, m10+m01=4xy, m02+m20=4xz,
    # m21+m12=4yz.
    q_by_pivot = jnp.stack(
        [
            jnp.stack([0.5 * s, (m21 - m12) * d, (m02 - m20) * d, (m10 - m01) * d], axis=-1),
            jnp.stack([(m21 - m12) * d, 0.5 * s, (m10 + m01) * d, (m02 + m20) * d], axis=-1),
            jnp.stack([(m02 - m20) * d, (m10 + m01) * d, 0.5 * s, (m21 + m12) * d], axis=-1),
            jnp.stack([(m10 - m01) * d, (m02 + m20) * d, (m21 + m12) * d, 0.5 * s], axis=-1),
        ],
        axis=-2,
    )
    q = jnp.take_along_axis(q_by_pivot, pivot[..., None, None], axis=-2)[..., 0, :]
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)  # hemisphere: θ ∈ [0, π]
    qw = q[..., 0]
    v = q[..., 1:]
    nv_sq = jnp.sum(v * v, axis=-1)
    small, nv = _safe_theta(nv_sq)  # ‖q_v‖ = sin(θ/2)
    # w = θ/‖q_v‖ · q_v; θ/‖q_v‖ = 2·atan2(nv, qw)/nv, Taylor at nv→0
    # (qw→1): 2/qw · (1 − nv²/(3qw²)).
    qw_t = jnp.where(small, jnp.maximum(qw, 0.5), jnp.ones_like(qw))
    factor = jnp.where(
        small,
        (2.0 / qw_t) * (1.0 - nv_sq / (3.0 * qw_t * qw_t)),
        2.0 * jnp.arctan2(nv, qw) / nv,
    )
    return factor[..., None] * v


def left_jacobian(w):
    """Full SO(3) left Jacobian: J_l = I + (1−cosθ)/θ²·K + (θ−sinθ)/θ³·K².

    d/dw [exp(w)·v] = −hat(exp(w)·v) · J_l(w).
    (The reference's leftJacobian, so3.cpp:146-155, truncates after the K
    term; we keep the full series — exact, AD-consistent.)
    """
    t_sq = _theta_sq(w)
    K = hat(w)
    K2 = K @ K
    b = _one_minus_cos_over_t_sq(t_sq)[..., None, None]
    c = _t_minus_sin_over_t_cubed(t_sq)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + b * K + c * K2


def right_jacobian(w):
    """Full SO(3) right Jacobian: J_r(w) = J_l(−w) (cf. reference so3.cpp:128-143)."""
    return left_jacobian(-w)


def inverse_left_jacobian(w):
    """J_l⁻¹ = I − K/2 + (1/θ² − (1+cosθ)/(2θ sinθ))·K²  (cf. so3.cpp:108-125).

    The trig factor is evaluated as 1/θ² − 1/(2θ·tan(θ/2)) — the same
    function via the half-angle identity (1+cosθ)/sinθ ≡ 1/tan(θ/2) —
    which stays finite-by-construction at θ = π where the raw form is 0/0.
    """
    t_sq = _theta_sq(w)
    small, t = _safe_theta(t_sq)
    K = hat(w)
    K2 = K @ K
    safe_t_sq = jnp.where(small, jnp.ones_like(t_sq), t_sq)
    # 1/θ² − 1/(2θ tan(θ/2)), Taylor: 1/12 + θ²/720 + θ⁴/30240
    factor = jnp.where(
        small,
        1.0 / 12.0 + t_sq / 720.0 + t_sq * t_sq / 30240.0,
        1.0 / safe_t_sq - 1.0 / (2.0 * t * jnp.tan(0.5 * t)),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye - 0.5 * K + factor[..., None, None] * K2


def inverse_right_jacobian(w):
    """J_r⁻¹(w) = J_l⁻¹(−w)."""
    return inverse_left_jacobian(-w)
