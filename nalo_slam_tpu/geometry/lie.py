"""SO(3)/SE(3) Lie-group math, written once for both numpy (host, float64)
and jax.numpy (device, float32).

Conventions match Sophus as used by the reference (src/util/NumType.h:48-50):
a twist xi in R^6 is ordered (upsilon, omega) = (translation, rotation), and
``se3_exp(xi) = [exp(omega^), V(omega) upsilon; 0, 1]``.  The adjoint is
``Adj(R, t) = [[R, t^ R], [0, R]]``.

All functions are branch-free (Taylor switches via ``where``) so they can be
traced by XLA; pass ``xp=numpy`` for float64 host math.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def _mm(a, b, xp):
    """3x3 matmul at full precision (TPU MXU defaults to bf16 otherwise)."""
    if xp is jnp:
        return jnp.einsum("...ij,...jk->...ik", a, b, precision="highest")
    return a @ b


def _mv(M, v, xp):
    """Matrix-vector product at full precision."""
    if xp is jnp:
        return jnp.einsum("...ij,...j->...i", M, v, precision="highest")
    import numpy as _np

    return _np.einsum("...ij,...j->...i", M, v)


def hat(w, xp=jnp):
    """Skew-symmetric matrix of w (3,) -> (3,3). Batched over leading dims."""
    w = xp.asarray(w)
    zeros = xp.zeros_like(w[..., 0])
    return xp.stack(
        [
            xp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
            xp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
            xp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w, xp=jnp):
    """Rodrigues: (,...,3) -> (...,3,3)."""
    w = xp.asarray(w)
    theta2 = xp.sum(w * w, axis=-1)
    theta = xp.sqrt(xp.maximum(theta2, 0.0))
    small = theta < _EPS
    # sin(t)/t and (1-cos t)/t^2 with Taylor fallback
    safe = xp.where(small, xp.ones_like(theta), theta)
    A = xp.where(small, 1.0 - theta2 / 6.0, xp.sin(safe) / safe)
    B = xp.where(small, 0.5 - theta2 / 24.0, (1.0 - xp.cos(safe)) / (safe * safe))
    W = hat(w, xp)
    W2 = _mm(W, W, xp)
    eye = xp.eye(3, dtype=w.dtype)
    return eye + A[..., None, None] * W + B[..., None, None] * W2


def so3_log(R, xp=jnp):
    """(...,3,3) -> (...,3).  Handles angles in [0, pi)."""
    R = xp.asarray(R)
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = xp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = xp.arccos(cos_t)
    small = theta < _EPS
    # vee of antisymmetric part
    v = xp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = xp.sin(xp.where(small, xp.ones_like(theta), theta))
    # factor = theta / (2 sin theta); near pi sin->0, use eigen-style fallback
    factor_small = 0.5 + theta * theta / 12.0
    factor = xp.where(small, factor_small, theta / (2.0 * sin_t))
    w = v * factor[..., None]
    # near theta = pi the antisymmetric part vanishes; recover axis from
    # the symmetric part: R ~ I + 2 ww^T/theta^2 ... use diagonal.
    near_pi = theta > 3.0
    if hasattr(near_pi, "any"):
        diag = xp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
        axis2 = xp.maximum((diag - cos_t[..., None]) / (1.0 - cos_t[..., None] + 1e-12), 0.0)
        axis = xp.sqrt(axis2)
        # fix signs from off-diagonals
        sx = xp.where(v[..., 0] >= 0, 1.0, -1.0)
        sy = xp.where(v[..., 1] >= 0, 1.0, -1.0)
        sz = xp.where(v[..., 2] >= 0, 1.0, -1.0)
        axis = axis * xp.stack([sx, sy, sz], axis=-1)
        w_pi = axis * theta[..., None]
        w = xp.where(near_pi[..., None], w_pi, w)
    return w


def _so3_left_jacobian(w, xp=jnp):
    """V(omega) such that t = V upsilon in se3_exp."""
    w = xp.asarray(w)
    theta2 = xp.sum(w * w, axis=-1)
    theta = xp.sqrt(xp.maximum(theta2, 0.0))
    small = theta < _EPS
    safe = xp.where(small, xp.ones_like(theta), theta)
    B = xp.where(small, 0.5 - theta2 / 24.0, (1.0 - xp.cos(safe)) / (safe * safe))
    C = xp.where(small, 1.0 / 6.0 - theta2 / 120.0, (safe - xp.sin(safe)) / (safe**3))
    W = hat(w, xp)
    W2 = _mm(W, W, xp)
    eye = xp.eye(3, dtype=w.dtype)
    return eye + B[..., None, None] * W + C[..., None, None] * W2


def _so3_left_jacobian_inv(w, xp=jnp):
    w = xp.asarray(w)
    theta2 = xp.sum(w * w, axis=-1)
    theta = xp.sqrt(xp.maximum(theta2, 0.0))
    small = theta < _EPS
    safe = xp.where(small, xp.ones_like(theta), theta)
    half = 0.5 * safe
    cot = half * xp.cos(half) / xp.sin(xp.where(small, xp.ones_like(half), half))
    k = xp.where(small, 1.0 / 12.0 + theta2 / 720.0, (1.0 - cot) / (safe * safe))
    W = hat(w, xp)
    W2 = _mm(W, W, xp)
    eye = xp.eye(3, dtype=w.dtype)
    return eye - 0.5 * W + k[..., None, None] * W2


def se3_exp(xi, xp=jnp):
    """xi (...,6) (upsilon, omega) -> (R (...,3,3), t (...,3))."""
    xi = xp.asarray(xi)
    v, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w, xp)
    V = _so3_left_jacobian(w, xp)
    t = _mv(V, v, xp)
    return R, t


def se3_log(R, t, xp=jnp):
    """(R, t) -> xi (...,6)."""
    w = so3_log(R, xp)
    Vinv = _so3_left_jacobian_inv(w, xp)
    v = _mv(Vinv, xp.asarray(t), xp)
    return xp.concatenate([v, w], axis=-1)


def se3_mul(R1, t1, R2, t2, xp=jnp):
    """(R1,t1) * (R2,t2)."""
    R = _mm(R1, R2, xp)
    t = _mv(R1, t2, xp) + t1
    return R, t


def se3_inv(R, t, xp=jnp):
    Rt = xp.swapaxes(R, -1, -2)
    return Rt, -_mv(Rt, t, xp)


def se3_adj(R, t, xp=jnp):
    """Adjoint (...,6,6) for twist order (v, w): [[R, t^R], [0, R]]."""
    R = xp.asarray(R)
    tR = _mm(hat(t, xp), R, xp)
    z = xp.zeros_like(R)
    top = xp.concatenate([R, tR], axis=-1)
    bot = xp.concatenate([z, R], axis=-1)
    return xp.concatenate([top, bot], axis=-2)
