"""Cross-validation of ops/lie.py against the reference's se3_so3_util.py,
executed directly (same import mechanism as tests/test_vs_reference.py).

The reference's Lie utilities are single-sample torch; ours are batched
jax. Each check runs both on the same float64 inputs: SO(3)/SE(3)
log/exp (including round trips through each other's representation),
quaternion <-> axis-angle, skew/vee, homogeneous-transform helpers,
axis-angle integration, and angular error. 6-vector ordering conventions
never enter the comparisons: twists are compared as 4x4 kseehat matrices
via our hat/vee maps.
"""

import os
import sys
import zlib

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

REF_ROOT = "/root/reference"
_HERE = os.path.dirname(os.path.abspath(__file__))

torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REF_ROOT, "differentiable_robot_model")):
    pytest.skip("reference checkout not available", allow_module_level=True)

# APPEND (not prepend): the reference checkout contains top-level package
# names that must not shadow this repo's (e.g. its stale `experiments/`
# package vs our runnable one).
for p in (os.path.join(_HERE, "refstub"), REF_ROOT):
    if p not in sys.path:
        sys.path.append(p)

su = pytest.importorskip("differentiable_robot_model.se3_so3_util")

from differentiable_robot_model_tpu.ops import lie  # noqa: E402


def _rotations(n, seed):
    """Random rotations with a spread of angles incl. near-pi and small."""
    rng = np.random.default_rng(zlib.crc32(seed.encode()))
    ws = rng.normal(0, 1.0, (n, 3))
    ws /= np.linalg.norm(ws, axis=-1, keepdims=True)
    angles = np.concatenate([
        rng.uniform(0.1, 3.0, n - 2), [1e-4], [np.pi - 1e-3]
    ])
    return ws * angles[:, None]


def _t64(x):
    return torch.tensor(np.asarray(x), dtype=torch.float64)


X64 = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


class TestSO3:
    def test_exp_matches(self):
        for w in _rotations(8, "exp"):
            R_ref = su.expMapso3(su.getSkewSymMatFromVec3(_t64(w))).numpy()
            R_our = np.asarray(lie.exp_so3(jnp.asarray(w, X64)))
            assert np.allclose(R_our, R_ref, atol=1e-6)

    def test_log_matches(self):
        for w in _rotations(8, "log"):
            R = su.expMapso3(su.getSkewSymMatFromVec3(_t64(w))).numpy()
            w_ref = su.getVec3FromSkewSymMat(su.logMapSO3(_t64(R))).numpy()
            w_our = np.asarray(lie.log_so3(jnp.asarray(R, X64)))
            assert np.allclose(w_our, w_ref, atol=1e-5)

    def test_skew_vee(self):
        rng = np.random.default_rng(7)
        v = rng.normal(0, 2.0, 3)
        K_ref = su.getSkewSymMatFromVec3(_t64(v)).numpy()
        assert np.allclose(np.asarray(lie.hat_so3(jnp.asarray(v))), K_ref)
        v_ref = su.getVec3FromSkewSymMat(_t64(K_ref)).numpy()
        assert np.allclose(
            np.asarray(lie.vee_so3(jnp.asarray(K_ref))), v_ref
        )

    def test_integrate_axis_angle(self):
        rng = np.random.default_rng(8)
        aa = rng.normal(0, 0.7, 3)
        om = rng.normal(0, 1.5, 3)
        dt = 0.03
        ref = su.integrateAxisAngle(_t64(aa), _t64(om), dt).numpy()
        ours = np.asarray(lie.integrate_axis_angle(
            jnp.asarray(aa, X64), jnp.asarray(om, X64), dt
        ))
        assert np.allclose(ours, ref, atol=1e-6)

    def test_angular_error(self):
        rng = np.random.default_rng(9)
        src = rng.normal(0, 0.8, 3)
        tgt = rng.normal(0, 0.8, 3)
        ref = su.computeAngularError(_t64(src), _t64(tgt)).numpy()
        R_src = lie.exp_so3(jnp.asarray(src, X64))
        R_tgt = lie.exp_so3(jnp.asarray(tgt, X64))
        ours = np.asarray(lie.angular_error(R_tgt, R_src))
        assert np.allclose(ours, ref, atol=1e-6)


class TestQuaternion:
    def test_axis_angle_to_quaternion(self):
        for w in _rotations(8, "aa2q"):
            q_ref = su.convertAxisAngleToQuaternion(_t64(w)).numpy()
            q_our = np.asarray(lie.axis_angle_to_quaternion(jnp.asarray(w, X64)))
            sign = np.sign(np.dot(q_ref, q_our)) or 1.0
            assert np.allclose(q_our * sign, q_ref, atol=1e-6)

    def test_quaternion_to_axis_angle(self):
        for w in _rotations(6, "q2aa"):
            q = su.convertAxisAngleToQuaternion(_t64(w)).numpy()
            aa_ref = su.convertQuaternionToAxisAngle(_t64(q)).numpy()
            aa_our = np.asarray(lie.quaternion_to_axis_angle(jnp.asarray(q, X64)))
            assert np.allclose(aa_our, aa_ref, atol=1e-4)

    def test_quaternion_matrix_consistency(self):
        """our matrix_to_quaternion on a reference-built R inverts the
        reference's axis-angle->quaternion chain."""
        for w in _rotations(6, "qm"):
            R = su.expMapso3(su.getSkewSymMatFromVec3(_t64(w))).numpy()
            q_ref = su.convertAxisAngleToQuaternion(_t64(w)).numpy()
            q_our = np.asarray(lie.matrix_to_quaternion(jnp.asarray(R, X64)))
            sign = np.sign(np.dot(q_ref, q_our)) or 1.0
            assert np.allclose(q_our * sign, q_ref, atol=1e-6)


class TestSE3:
    def _random_T(self, seed):
        rng = np.random.default_rng(zlib.crc32(seed.encode()))
        w = rng.normal(0, 0.9, 3)
        t = rng.normal(0, 1.5, 3)
        R = np.asarray(lie.exp_so3(jnp.asarray(w, X64)))
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        return T

    def test_log_matches(self):
        for i in range(6):
            T = self._random_T(f"se3log{i}")
            kseehat_ref = su.logMapSE3(_t64(T)).numpy()
            xi = lie.log_se3(jnp.asarray(T[:3, :3], X64), jnp.asarray(T[:3, 3], X64))
            kseehat_our = np.asarray(lie.hat_se3(xi))
            assert np.allclose(kseehat_our, kseehat_ref, atol=1e-6), i

    def test_exp_matches(self):
        rng = np.random.default_rng(31)
        for i in range(6):
            xi = rng.normal(0, 0.8, 6)  # (v, omega) ours
            kseehat = np.asarray(lie.hat_se3(jnp.asarray(xi, X64)))
            T_ref = su.expMapse3(_t64(kseehat)).numpy()
            R_our, t_our = lie.exp_se3(jnp.asarray(xi, X64))
            assert np.allclose(np.asarray(R_our), T_ref[:3, :3], atol=1e-6)
            assert np.allclose(np.asarray(t_our), T_ref[:3, 3], atol=1e-6)

    def test_cross_roundtrip(self):
        """our exp inverts the reference's log and vice versa."""
        for i in range(4):
            T = self._random_T(f"se3rt{i}")
            xi_ref = np.asarray(lie.vee_se3(
                jnp.asarray(su.logMapSE3(_t64(T)).numpy(), X64)
            ))
            R, t = lie.exp_se3(jnp.asarray(xi_ref, X64))
            assert np.allclose(np.asarray(R), T[:3, :3], atol=1e-6)
            assert np.allclose(np.asarray(t), T[:3, 3], atol=1e-6)

    def test_homogeneous_inverse(self):
        T = self._random_T("hinv")
        Tinv_ref = su.getInverseHomogeneousTransformMatrix(_t64(T)).numpy()
        Tinv_our = np.asarray(lie.homogeneous_inverse(jnp.asarray(T, X64)))
        assert np.allclose(Tinv_our, Tinv_ref, atol=1e-8)
