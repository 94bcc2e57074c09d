"""Lie/spatial math unit tests (batched, float64 precision checks).

Covers the counterparts of reference spatial_vector_algebra.py:14-53 and
se3_so3_util.py: rotations, exp/log maps (incl. small-angle limits),
quaternion conversions, hat/vee, homogeneous transforms, spatial algebra
identities.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from differentiable_robot_model_tpu.ops import lie, spatial


def random_rotations(n, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.normal(0, 1.2, (n, 3))
    return lie.exp_so3(jnp.asarray(w)), jnp.asarray(w)


class TestSO3:
    def test_axis_rotations_match_rodrigues(self):
        ang = jnp.asarray(np.linspace(-3, 3, 11))
        for fn, axis in [(lie.x_rot, [1, 0, 0]), (lie.y_rot, [0, 1, 0]), (lie.z_rot, [0, 0, 1])]:
            R1 = fn(ang)
            R2 = lie.axis_angle_to_matrix(jnp.broadcast_to(jnp.asarray(axis, jnp.float64), (11, 3)), ang)
            assert np.allclose(np.asarray(R1), np.asarray(R2), atol=1e-12)

    def test_exp_log_roundtrip(self):
        R, w = random_rotations(64)
        w_back = lie.log_so3(R)
        assert np.allclose(np.asarray(lie.exp_so3(w_back)), np.asarray(R), atol=1e-9)

    def test_exp_small_angle(self):
        w = jnp.asarray([[1e-12, 0, 0], [0.0, 0.0, 0.0]])
        R = lie.exp_so3(w)
        assert np.allclose(np.asarray(R), np.eye(3), atol=1e-9)
        # gradient well-defined at zero
        import jax

        g = jax.jacobian(lambda x: lie.exp_so3(x))(jnp.zeros(3))
        assert np.isfinite(np.asarray(g)).all()

    def test_rotations_orthonormal(self):
        R, _ = random_rotations(32, seed=3)
        Rn = np.asarray(R)
        assert np.allclose(Rn @ np.swapaxes(Rn, -1, -2), np.eye(3), atol=1e-12)
        assert np.allclose(np.linalg.det(Rn), 1.0, atol=1e-12)

    def test_quaternion_roundtrip(self):
        R, _ = random_rotations(64, seed=1)
        q = lie.matrix_to_quaternion(R)
        assert np.allclose(np.linalg.norm(np.asarray(q), axis=-1), 1.0, atol=1e-9)
        R2 = lie.quaternion_to_matrix(q)
        assert np.allclose(np.asarray(R2), np.asarray(R), atol=1e-9)

    def test_quat_axis_angle_roundtrip(self):
        _, w = random_rotations(32, seed=2)
        q = lie.axis_angle_to_quaternion(w)
        w2 = lie.quaternion_to_axis_angle(q)
        R1 = np.asarray(lie.exp_so3(w))
        R2 = np.asarray(lie.exp_so3(jnp.asarray(w2)))
        assert np.allclose(R1, R2, atol=1e-9)

    def test_hat_vee(self):
        v = jnp.asarray(np.random.default_rng(0).normal(size=(8, 3)))
        assert np.allclose(np.asarray(lie.vee_so3(lie.hat_so3(v))), np.asarray(v))

    def test_angular_error_and_integration(self):
        R, _ = random_rotations(8, seed=5)
        err = lie.angular_error(R, R)
        assert np.allclose(np.asarray(err), 0.0, atol=1e-9)


class TestSE3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(0)
        xi = np.asarray(rng.normal(0, 0.8, (32, 6)))
        # principal-branch roundtrip requires |omega| < pi
        norms = np.linalg.norm(xi[:, 3:], axis=-1, keepdims=True)
        xi[:, 3:] *= np.minimum(1.0, 3.0 / norms)
        xi = jnp.asarray(xi)
        R, t = lie.exp_se3(xi)
        xi2 = lie.log_se3(R, t)
        assert np.allclose(np.asarray(xi2), np.asarray(xi), atol=1e-8)

    def test_hat_vee(self):
        xi = jnp.asarray(np.random.default_rng(1).normal(size=(5, 6)))
        assert np.allclose(np.asarray(lie.vee_se3(lie.hat_se3(xi))), np.asarray(xi))

    def test_homogeneous_inverse(self):
        R, _ = random_rotations(8, seed=7)
        t = jnp.asarray(np.random.default_rng(2).normal(size=(8, 3)))
        T = lie.homogeneous_matrix(R, t)
        TinvT = np.asarray(T) @ np.asarray(lie.homogeneous_inverse(T))
        assert np.allclose(TinvT, np.eye(4), atol=1e-12)


class TestSpatial:
    def test_inertia_matrix_vs_product(self):
        """inertia_times_motion == spatial_inertia_matrix @ motion."""
        rng = np.random.default_rng(0)
        mass = jnp.asarray(rng.uniform(0.5, 3.0, (16,)))
        com = jnp.asarray(rng.normal(0, 0.1, (16, 3)))
        A = rng.normal(0, 0.1, (16, 3, 3))
        inertia = jnp.asarray(A @ np.swapaxes(A, -1, -2) + 0.1 * np.eye(3))
        m = jnp.asarray(rng.normal(size=(16, 6)))
        f1 = spatial.inertia_times_motion(mass, com, inertia, m)
        I6 = spatial.spatial_inertia_matrix(mass, com, inertia)
        f2 = jnp.einsum("...ij,...j->...i", I6, m)
        assert np.allclose(np.asarray(f1), np.asarray(f2), atol=1e-12)

    def test_cross_product_duality(self):
        """<m1 x m2, f> = -<m2, m1 x* f> (spatial cross-product duality)."""
        rng = np.random.default_rng(1)
        m1, m2, f = (jnp.asarray(rng.normal(size=(8, 6))) for _ in range(3))
        lhs = spatial.motion_dot_force(spatial.motion_cross_motion(m1, m2), f)
        rhs = -spatial.motion_dot_force(m2, spatial.motion_cross_force(m1, f))
        assert np.allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-12)

    def test_transform_roundtrip(self):
        R, _ = random_rotations(8, seed=9)
        p = jnp.asarray(np.random.default_rng(3).normal(size=(8, 3)))
        m = jnp.asarray(np.random.default_rng(4).normal(size=(8, 6)))
        m_w = spatial.motion_to_world(R, p, m)
        # invert: local = from_world
        Rt, pt = spatial.transform_inverse(R, p)
        w = jnp.einsum("...ij,...j->...i", Rt, m_w[..., :3])
        v = jnp.einsum("...ij,...j->...i", Rt, m_w[..., 3:]) + jnp.cross(pt, w)
        m_back = jnp.concatenate([w, v], axis=-1)
        assert np.allclose(np.asarray(m_back), np.asarray(m), atol=1e-10)

    def test_force_power_invariance(self):
        """<m, f> is frame-invariant: power computed in world == local."""
        R, _ = random_rotations(8, seed=11)
        p = jnp.asarray(np.random.default_rng(5).normal(size=(8, 3)))
        m = jnp.asarray(np.random.default_rng(6).normal(size=(8, 6)))
        f = jnp.asarray(np.random.default_rng(7).normal(size=(8, 6)))
        lhs = spatial.motion_dot_force(m, f)
        rhs = spatial.motion_dot_force(
            spatial.motion_to_world(R, p, m), spatial.force_to_world(R, p, f)
        )
        assert np.allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-10)
