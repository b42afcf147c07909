import numpy as np
import pytest

from nalo_slam_tpu.geometry import lie, SE3


def random_twists(rng, n=64, scale=1.0):
    xi = rng.normal(size=(n, 6)) * scale
    # keep the rotation part in the principal domain |w| < pi
    wn = np.linalg.norm(xi[:, 3:], axis=1, keepdims=True)
    xi[:, 3:] = np.where(wn > 3.0, xi[:, 3:] * 3.0 / wn, xi[:, 3:])
    return xi


class TestSO3:
    def test_exp_log_roundtrip(self, rng):
        # restrict to the principal domain |w| < pi where log is unique
        w = rng.normal(size=(128, 3))
        n = np.linalg.norm(w, axis=1, keepdims=True)
        w = np.where(n > 3.0, w * 3.0 / n, w)
        R = lie.so3_exp(w, xp=np)
        w2 = lie.so3_log(R, xp=np)
        np.testing.assert_allclose(w, w2, atol=1e-9)

    def test_log_near_pi_matrix_roundtrip(self, rng):
        axes = rng.normal(size=(64, 3))
        axes /= np.linalg.norm(axes, axis=1, keepdims=True)
        angles = np.pi - 10 ** rng.uniform(-7, -1, size=64)
        R = lie.so3_exp(axes * angles[:, None], xp=np)
        R2 = lie.so3_exp(lie.so3_log(R, xp=np), xp=np)
        np.testing.assert_allclose(R, R2, atol=1e-7)

    def test_small_angle(self, rng):
        w = rng.normal(size=(16, 3)) * 1e-10
        R = lie.so3_exp(w, xp=np)
        np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), R.shape), atol=1e-9)
        np.testing.assert_allclose(lie.so3_log(R, xp=np), w, atol=1e-12)

    def test_orthonormal(self, rng):
        w = rng.normal(size=(32, 3)) * 2
        R = lie.so3_exp(w, xp=np)
        np.testing.assert_allclose(
            np.einsum("nij,nkj->nik", R, R), np.broadcast_to(np.eye(3), R.shape), atol=1e-12
        )
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = random_twists(rng)
        R, t = lie.se3_exp(xi, xp=np)
        xi2 = lie.se3_log(R, t, xp=np)
        np.testing.assert_allclose(xi, xi2, atol=1e-9)

    def test_identity(self):
        s = SE3.exp(np.zeros(6))
        np.testing.assert_allclose(s.matrix(), np.eye(4), atol=1e-15)

    def test_group_ops(self, rng):
        a = SE3.exp(rng.normal(size=6))
        b = SE3.exp(rng.normal(size=6))
        ab = a * b
        np.testing.assert_allclose(ab.matrix(), a.matrix() @ b.matrix(), atol=1e-12)
        np.testing.assert_allclose((a * a.inverse()).matrix(), np.eye(4), atol=1e-12)

    def test_adjoint_identity(self, rng):
        """Adj(T) xi == log(T exp(xi) T^-1) to first order."""
        T = SE3.exp(rng.normal(size=6))
        xi = rng.normal(size=6) * 1e-5
        lhs = T.adj() @ xi
        rhs = (T * SE3.exp(xi) * T.inverse()).log()
        np.testing.assert_allclose(lhs, rhs, atol=1e-12, rtol=1e-4)

    def test_translation_first_ordering(self):
        """Twist is (v, w): pure-v twist of identity-rotation moves t only."""
        s = SE3.exp([1.0, 2.0, 3.0, 0, 0, 0])
        np.testing.assert_allclose(s.R, np.eye(3), atol=1e-15)
        np.testing.assert_allclose(s.t, [1, 2, 3], atol=1e-15)

    def test_quaternion_roundtrip(self, rng):
        a = SE3.exp(rng.normal(size=6))
        q = a.quaternion_xyzw()
        b = SE3.rot_xyzw(q[0], q[1], q[2], q[3], a.t)
        np.testing.assert_allclose(a.matrix(), b.matrix(), atol=1e-12)


class TestJaxParity:
    def test_jnp_matches_numpy(self, rng):
        import jax.numpy as jnp

        xi = random_twists(rng, 32).astype(np.float32)
        Rn, tn = lie.se3_exp(xi, xp=np)
        Rj, tj = lie.se3_exp(jnp.asarray(xi))
        np.testing.assert_allclose(Rn, np.asarray(Rj), atol=1e-6)
        np.testing.assert_allclose(tn, np.asarray(tj), atol=1e-6)
        xin = lie.se3_log(Rj, tj)
        np.testing.assert_allclose(xi, np.asarray(xin), atol=5e-5)


class TestNullspaceOracle:
    """Numeric pose-nullspace derivation mirrors the reference's
    FrameHessian::setStateZero (src/FullSystem/HessianBlocks.cpp:73-106)."""

    def test_pose_nullspace_finite_diff(self, rng):
        T = SE3.exp(rng.normal(size=6))  # worldToCam
        eps = 1e-3
        cols = []
        for i in range(6):
            e = np.zeros(6)
            e[i] = eps
            p = (T * SE3.exp(e) * T.inverse()).log()
            m = (T * SE3.exp(-e) * T.inverse()).log()
            cols.append((p - m) / (2 * eps))
        N = np.stack(cols, axis=1)
        # this is just Adj(T); verify
        np.testing.assert_allclose(N, T.adj(), atol=1e-5, rtol=1e-4)


def test_pyramid_calib():
    from nalo_slam_tpu.geometry import PyramidCalib

    # 640x480 stops once the level has <= 5000 px (80x60): 4 levels,
    # exactly the reference rule (globalCalib.cpp:48-53)
    c = PyramidCalib.make(640, 480, 500.0, 500.0, 320.0, 240.0)
    assert c.levels == 4
    assert c.w == [640, 320, 160, 80]
    np.testing.assert_allclose(c.fx[1], 250.0)
    np.testing.assert_allclose(c.cx[1], (320.0 + 0.5) / 2 - 0.5)
    # K @ Ki == I
    np.testing.assert_allclose(
        np.einsum("lij,ljk->lik", c.K, c.Ki),
        np.broadcast_to(np.eye(3), (c.levels, 3, 3)),
        atol=1e-12,
    )
    # KITTI-like: 1216x368 -> 5 levels (76x23 is odd, stops)
    c2 = PyramidCalib.make(1216, 368, 718.856, 718.856, 607.19, 185.21)
    assert c2.levels == 5
