"""RobotStruct invariants: specialization-hint consistency and dtype gates.

Round-1 advisor findings: stale `axis_code` after a bare dataclasses.replace
of `axis`, float32-only frozen immediates, and zero robot-cotangents from
the traced Pallas FK VJP. These tests pin the fixes.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from differentiable_robot_model_tpu import (
    DifferentiableKUKAiiwa,
    DifferentiableTwoLinkRobot,
)


@pytest.fixture(scope="module")
def iiwa_struct():
    return DifferentiableKUKAiiwa().struct


def test_with_arrays_recomputes_axis_code(iiwa_struct):
    s = iiwa_struct
    # Rotate one joint axis off-axis: the code for that link must clear.
    l = s.dof_links[2]
    new_axis = np.array(s.axis)
    new_axis[l] = np.array([0.6, 0.8, 0.0], np.float32)
    s2 = s.with_arrays(axis=jnp.asarray(new_axis))
    assert s2.axis_code[l] is None
    # Untouched links keep their codes.
    other = s.dof_links[0]
    assert s2.axis_code[other] == s.axis_code[other]
    # Restoring an axis-aligned unit vector restores the code.
    new_axis[l] = np.array([0.0, -1.0, 0.0], np.float32)
    s3 = s.with_arrays(axis=jnp.asarray(new_axis))
    assert s3.axis_code[l] == (1, -1)


def test_with_arrays_recomputes_rpy_and_trans_hints(iiwa_struct):
    s = iiwa_struct
    rpy = np.asarray(s.rot_angles).copy()
    was_zero = [l for l in range(s.n_links) if s.rpy_zero[l]]
    assert was_zero, "expected at least one zero-rpy link on the iiwa"
    rpy[was_zero[0]] = [0.1, 0.0, 0.0]
    s2 = s.with_arrays(rot_angles=jnp.asarray(rpy))
    assert not s2.rpy_zero[was_zero[0]]

    tr = np.asarray(s.trans).copy()
    tr[1] = [0.0, 0.0, 0.0]
    s3 = s.with_arrays(trans=jnp.asarray(tr))
    assert s3.trans_zero[1] == (True, True, True)


def test_with_arrays_clears_hints_for_traced_overlays(iiwa_struct):
    s = iiwa_struct

    def f(axis):
        s2 = s.with_arrays(axis=axis)
        # hints must be fully cleared under tracing (no stale specialization)
        assert all(c is None for c in s2.axis_code)
        return jnp.sum(s2.axis)

    jax.jit(f)(s.axis)


def test_traced_fk_pallas_falls_back_for_robot_gradients(iiwa_struct):
    """Differentiating the dof-major Pallas FK w.r.t. robot parameters must
    produce the scalar path's exact gradients, not silent zeros
    (round-1 advisor medium finding)."""
    from differentiable_robot_model_tpu.ops.kinematics import (
        fk_link_position_dof_first,
    )
    from differentiable_robot_model_tpu.ops.pallas.fk import fk_position_dof_major

    s = iiwa_struct
    ee = s.link_index("iiwa_link_ee")
    qM = jnp.asarray(
        np.random.default_rng(0).uniform(-0.5, 0.5, (7, 4)), jnp.float32
    )

    def loss_pallas(trans):
        s2 = s.with_arrays(trans=trans)
        return jnp.sum(fk_position_dof_major(s2, qM, ee) ** 2)

    def loss_scalar(trans):
        s2 = s.with_arrays(trans=trans)
        return jnp.sum(fk_link_position_dof_first(s2, qM, ee) ** 2)

    g_p = jax.grad(loss_pallas)(s.trans)
    g_s = jax.grad(loss_scalar)(s.trans)
    assert float(jnp.max(jnp.abs(g_s))) > 1e-3  # non-trivial gradient
    assert np.allclose(np.asarray(g_p), np.asarray(g_s), atol=1e-5)


def test_traced_fk_pallas_q_gradients_still_kernel_path(iiwa_struct):
    """When only q is differentiated, the traced path keeps the geometric-
    Jacobian backward and matches the scalar path."""
    from differentiable_robot_model_tpu.ops.kinematics import (
        fk_link_position_dof_first,
    )
    from differentiable_robot_model_tpu.ops.pallas.fk import fk_position_dof_major

    s = iiwa_struct
    ee = s.link_index("iiwa_link_ee")
    qM = jnp.asarray(
        np.random.default_rng(1).uniform(-0.5, 0.5, (7, 4)), jnp.float32
    )

    from jax.experimental.pallas import tpu as pltpu

    # robot passed as a jit argument -> traced (but not perturbed)
    @jax.jit
    def g_pallas(robot, q):
        return jax.grad(lambda qq: jnp.sum(fk_position_dof_major(robot, qq, ee)))(q)

    @jax.jit
    def g_scalar(robot, q):
        return jax.grad(
            lambda qq: jnp.sum(fk_link_position_dof_first(robot, qq, ee))
        )(q)

    with pltpu.force_tpu_interpret_mode():
        g_p = np.asarray(g_pallas(s, qM))
    assert np.allclose(g_p, np.asarray(g_scalar(s, qM)), atol=1e-5)


def test_frozen_consts_gated_to_float32():
    from differentiable_robot_model_tpu.ops.pallas import fk as fkmod
    from differentiable_robot_model_tpu.ops.pallas import rnea as rneamod

    s32 = DifferentiableTwoLinkRobot().struct
    s64 = DifferentiableTwoLinkRobot(dtype=jnp.float64).struct
    assert fkmod._concrete_consts(s32) is not None
    assert fkmod._concrete_consts(s64) is None
    assert rneamod._concrete_consts(s32) is not None
    assert rneamod._concrete_consts(s64) is None


def test_bare_dataclasses_replace_still_possible_but_with_arrays_preferred(
    iiwa_struct,
):
    """Documents the contract: dataclasses.replace does NOT touch hints
    (that is why with_arrays exists)."""
    s = iiwa_struct
    new_axis = jnp.asarray(np.asarray(s.axis)[:, ::-1].copy())
    s2 = dataclasses.replace(s, axis=new_axis)
    assert s2.axis_code == s.axis_code  # stale by design; use with_arrays


class TestKinematicStateVelocities:
    def test_body_velocities_match_finite_difference(self):
        """update_kinematic_state's spatial velocities are physically
        correct: for every link, V = [omega, v_at_world_origin] satisfies
        d p_l/dt = v + omega x p_l and Rdot R^T = skew(omega) along the
        trajectory q(t) = q + t qd (float64 central differences). Directly
        validates the velocity half of the kinematic state (the reference
        computes it link-locally, robot_model.py:188-193; here it is one
        ancestor-masked matmul, ops/kinematics.py:body_velocities)."""
        import jax.numpy as jnp

        from differentiable_robot_model_tpu import DifferentiableTrifingerEdu

        model = DifferentiableTrifingerEdu(dtype=jnp.float64)
        struct = model.struct
        rng = np.random.default_rng(4)
        D = struct.n_dofs
        q = rng.uniform(-0.6, 0.6, D)
        qd = rng.uniform(-1.0, 1.0, D)

        ks = model.update_kinematic_state(q, qd)
        V = np.asarray(ks.vel) if hasattr(ks, "vel") else np.asarray(ks[3])
        p = np.asarray(ks[1])
        R = np.asarray(ks[0])

        eps = 1e-6
        fkp, fkm = (
            model.compute_forward_kinematics_all_links(q + s * eps * qd)
            for s in (+1.0, -1.0)
        )
        Rp = model.update_kinematic_state(q + eps * qd, qd)
        Rm = model.update_kinematic_state(q - eps * qd, qd)
        for i, ln in enumerate(struct.link_names):
            pdot = (np.asarray(fkp[ln][0]) - np.asarray(fkm[ln][0])) / (2 * eps)
            omega, v = V[i, :3], V[i, 3:]
            assert np.allclose(pdot, v + np.cross(omega, p[i]), atol=1e-7), ln
            Rdot = (np.asarray(Rp[0])[i] - np.asarray(Rm[0])[i]) / (2 * eps)
            W = Rdot @ R[i].T
            omega_fd = np.array([W[2, 1], W[0, 2], W[1, 0]])
            assert np.allclose(omega, omega_fd, atol=1e-7), ln
