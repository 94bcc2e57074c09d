"""Author-independent golden values: hand-derived closed-form assertions.

Every expected constant in this file was derived BY HAND from the URDF
numbers and textbook mechanics (derivations inline) — none comes from
running repo code. This breaks the common-author correlation between the
algorithms and the float64 oracle (tests/oracle.py), standing in for the
reference's external pybullet oracle
(/root/reference/tests/test_kinematics_dynamics.py:112-131), which is not
installable here.

URDF constants used (read directly from robot_data/*.urdf):
- 2link_robot.urdf: baseHinge at xyz (0,0,0.15) axis z; interArm at
  xyz (1,0,0) axis z; ee fixed at xyz (0,0,0.05); each arm mass 1,
  com (0.5,0,0), izz=0.001; damping 0.5.
- kuka_iiwa_iiwa7.urdf: the seven joint origins/rpys as composed below.
- fetch_full.urdf: torso_lift prismatic at xyz (-0.086875, 0, 0.37743),
  axis z, rpy ~ 0.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from differentiable_robot_model_tpu import (
    DifferentiableFetchFull,
    DifferentiableKUKAiiwa,
    DifferentiableTwoLinkRobot,
)

G = 9.81


@pytest.fixture(scope="module")
def twolink():
    return DifferentiableTwoLinkRobot()


@pytest.fixture(scope="module")
def iiwa():
    return DifferentiableKUKAiiwa()


# ---------------------------------------------------------------------------
# Forward kinematics
# ---------------------------------------------------------------------------


def test_twolink_fk_zero_config(twolink):
    """q=0: arm1 origin (0,0,0.15); arm2 = arm1 + (1,0,0); ee = arm2 +
    (0,0,0.05). Read straight off the URDF chain."""
    pos, quat = twolink.compute_forward_kinematics(jnp.zeros(2), "endEffector")
    assert np.allclose(np.asarray(pos), [1.0, 0.0, 0.2], atol=1e-6)
    assert np.allclose(np.asarray(quat), [0, 0, 0, 1], atol=1e-6)


def test_twolink_fk_analytic_planar(twolink):
    """Both joints rotate about z. Per the URDF chain, the endEffector link
    sits at xyz (0,0,0.05) from the arm2 JOINT (the elbow at arm1's tip) —
    the z-offset is invariant under the z-axis rotations, so
    ee = (cos q1, sin q1, 0.2) and the orientation is Rz(q1+q2)."""
    for q1, q2 in [(0.3, 0.0), (0.0, 0.7), (-0.4, 0.9), (1.2, -1.1)]:
        pos, quat = twolink.compute_forward_kinematics(
            jnp.asarray([q1, q2], jnp.float32), "endEffector"
        )
        expected = [np.cos(q1), np.sin(q1), 0.2]
        assert np.allclose(np.asarray(pos), expected, atol=1e-5)
        # orientation: rotation about z by q1+q2
        half = 0.5 * (q1 + q2)
        expected_quat = [0.0, 0.0, np.sin(half), np.cos(half)]
        q_np = np.asarray(quat)
        if q_np[3] * expected_quat[3] < 0:
            q_np = -q_np
        assert np.allclose(q_np, expected_quat, atol=1e-5)


def test_iiwa_fk_zero_config(iiwa):
    """q=0 ee position composed BY HAND from the 8 joint origins:
    z climbs 0.15+0.19+0.21+0.19+0.21+0.19+0.081+0.045 = 1.266; the two
    0.0607 y-offsets cancel (joints 6 and 7 in mutually flipped frames);
    x = y = 0; orientation composes to identity."""
    pos, quat = iiwa.compute_forward_kinematics(jnp.zeros(7), "iiwa_link_ee")
    assert np.allclose(np.asarray(pos), [0.0, 0.0, 1.266], atol=1e-6)
    q_np = np.asarray(quat)
    if q_np[3] < 0:
        q_np = -q_np
    assert np.allclose(q_np, [0, 0, 0, 1], atol=1e-6)


def test_iiwa_fk_base_joint_spins_ee_in_place(iiwa):
    """With q2..q7 = 0 the ee sits ON the base z-axis, so q1 only changes
    orientation: position invariant, quaternion = Rz(q1)."""
    for psi in (0.0, 0.8, -1.3, 2.5):
        q = jnp.asarray([psi, 0, 0, 0, 0, 0, 0], jnp.float32)
        pos, quat = iiwa.compute_forward_kinematics(q, "iiwa_link_ee")
        assert np.allclose(np.asarray(pos), [0.0, 0.0, 1.266], atol=1e-5)
        q_np = np.asarray(quat)
        expected = [0.0, 0.0, np.sin(psi / 2), np.cos(psi / 2)]
        if q_np[3] * expected[3] < 0:
            q_np = -q_np
        assert np.allclose(q_np, expected, atol=1e-5)


def test_iiwa_fk_shoulder_pitch_analytic(iiwa):
    """q = (0, th, 0, 0, 0, 0, 0): joint 2's frame (rpy pi/2,0,pi then axis
    z) pitches everything above z=0.34 about the world y-axis through
    (0,0,0.34) by +th toward +x... Derivation: R2_world(0) maps local z to
    world -y?  Composed by hand instead at th=pi/2: the 0.926 m of
    structure above joint 2 swings from +z to +x:
    ee = (0.926, 0, 0.34) + the 0.0607-pair still cancelling."""
    th = np.pi / 2
    q = jnp.asarray([0, th, 0, 0, 0, 0, 0], jnp.float32)
    pos, _ = iiwa.compute_forward_kinematics(q, "iiwa_link_ee")
    assert np.allclose(np.asarray(pos), [0.926, 0.0, 0.34], atol=1e-5)


def test_fetch_torso_prismatic_golden():
    """torso_lift_joint is prismatic along +z at xyz (-0.086875, 0,
    0.37743): the torso link's world position is exactly that offset plus
    q on z (rpy is -6.1e-17 ~ 0)."""
    fetch = DifferentiableFetchFull()
    s = fetch.struct
    d_lift = s.dof_links.index(s.link_index("torso_lift_link"))
    for lift in (0.0, 0.2, 0.38):
        q = np.zeros(fetch.n_dofs, np.float32)
        q[d_lift] = lift
        pos, _ = fetch.compute_forward_kinematics(
            jnp.asarray(q), "torso_lift_link"
        )
        assert np.allclose(
            np.asarray(pos), [-0.086875, 0.0, 0.37743 + lift], atol=1e-5
        )


# ---------------------------------------------------------------------------
# Jacobian
# ---------------------------------------------------------------------------


def test_twolink_jacobian_zero_config(twolink):
    """At q=0: p_ee=(1,0,0.2), joint1 axis z through (0,0,0.15), joint2 z
    through (1,0,0.15).
    J_lin col1 = z x (p_ee - p_j1) = (0,0,1) x (1,0,0.05) = (0,1,0);
    J_lin col2 = (0,0,1) x (0,0,0.05) = (0,0,0);  J_ang = [z, z]."""
    lin, ang = twolink.compute_endeffector_jacobian(jnp.zeros(2), "endEffector")
    assert np.allclose(np.asarray(lin), [[0, 0], [1, 0], [0, 0]], atol=1e-6)
    assert np.allclose(np.asarray(ang), [[0, 0], [0, 0], [1, 1]], atol=1e-6)


# ---------------------------------------------------------------------------
# Dynamics
# ---------------------------------------------------------------------------


def test_twolink_mass_matrix_golden(twolink):
    """Planar 2-link, l1=1, lc1=lc2=0.5, m=1, Izz=0.001 each:
    H11 = I1 + m1 lc1^2 + I2 + m2 (l1^2 + lc2^2 + 2 l1 lc2 cos q2)
    H12 = I2 + m2 (lc2^2 + l1 lc2 cos q2);  H22 = I2 + m2 lc2^2.
    At q2=0: H = [[2.502, 0.751], [0.751, 0.251]]."""
    H = np.asarray(twolink.compute_lagrangian_inertia_matrix(jnp.zeros(2)))
    assert np.allclose(H, [[2.502, 0.751], [0.751, 0.251]], atol=1e-5)
    # and at q2 = pi/2 the cos terms vanish:
    H2 = np.asarray(
        twolink.compute_lagrangian_inertia_matrix(
            jnp.asarray([0.0, np.pi / 2], jnp.float32)
        )
    )
    assert np.allclose(H2, [[1.502, 0.251], [0.251, 0.251]], atol=1e-5)


def test_twolink_gravity_torques_zero(twolink):
    """Motion is in the xy-plane, gravity along -z: zero gravity torque at
    any configuration; with qdd=0, qd=0 and damping ON the torque is
    exactly 0.5*qd = 0."""
    for q in ([0.0, 0.0], [0.7, -0.3]):
        tau = twolink.compute_inverse_dynamics(
            jnp.asarray(q, jnp.float32), jnp.zeros(2), jnp.zeros(2)
        )
        assert np.allclose(np.asarray(tau), [0.0, 0.0], atol=1e-6)


def test_twolink_damping_torque_exact(twolink):
    """q=qdd=0, qd arbitrary: tau = damping * qd = 0.5 qd exactly (no
    gravity coupling, no Coriolis at this configuration's symmetry...
    Coriolis terms vanish because gravity is out-of-plane and centrifugal
    forces are radial along the arm at q2=0)."""
    qd = jnp.asarray([0.8, -0.4], jnp.float32)
    tau = twolink.compute_inverse_dynamics(jnp.zeros(2), qd, jnp.zeros(2))
    # centrifugal force at q2=0 is radial (-x), moment about both z axes:
    # for joint 2: r x f has z-component 0 (r parallel f); for joint 1 the
    # com2 force line passes through the origin -> zero moment as well.
    assert np.allclose(np.asarray(tau), 0.5 * np.asarray(qd), atol=1e-5)


def test_twolink_unit_acceleration_torque(twolink):
    """qdd = e1 at rest, no damping: tau = H @ e1 = (2.502, 0.751)."""
    tau = np.asarray(
        twolink.compute_inverse_dynamics(
            jnp.zeros(2), jnp.zeros(2), jnp.asarray([1.0, 0.0], jnp.float32),
            use_damping=False,
        )
    )
    assert np.allclose(tau, [2.502, 0.751], atol=1e-5)


def _pendulum_struct(l=0.5, m=2.0):
    """Point mass m at distance l along +x of a single revolute y-axis
    joint at the origin: H = m l^2, gravity torque = -m g l cos(theta)."""
    from differentiable_robot_model_tpu.models.structs import build_struct

    return build_struct(
        name="pendulum",
        link_names=["base", "bob"],
        joint_names=["root", "hinge"],
        parent=[0, 0],
        joint_types=[0, 1],
        trans=np.zeros((2, 3)),
        rot_angles=np.zeros((2, 3)),
        axis=np.array([[0.0, 0.0, 0.0], [0.0, 1.0, 0.0]]),
        mass=np.array([0.0, m]),
        com=np.array([[0.0, 0.0, 0.0], [l, 0.0, 0.0]]),
        inertia_com=np.zeros((2, 3, 3)),
        damping_per_link=np.zeros(2),
        limits_per_link=np.tile(
            np.array([[-10.0, 10.0, 100.0, 100.0]]), (2, 1)
        ),
    )


def test_pendulum_free_fall_qdd():
    """Free fall of a horizontal point-mass pendulum: |qdd| = g/l at
    theta=0, zero at theta=+-pi/2 (arm vertical), g cos(theta)/l in
    between; and the sign flips with theta -> theta + pi."""
    from differentiable_robot_model_tpu.ops.dynamics_scalar import (
        forward_dynamics_scalar,
    )

    l = 0.5
    s = _pendulum_struct(l=l, m=2.0).astype(jnp.float64)
    qd = jnp.zeros(1, jnp.float64)
    tau = jnp.zeros(1, jnp.float64)

    qdd0 = float(
        forward_dynamics_scalar(s, jnp.zeros(1, jnp.float64), qd, tau)[0]
    )
    assert np.isclose(abs(qdd0), G / l, atol=1e-9)

    for th in (np.pi / 2, -np.pi / 2):
        qdd = float(
            forward_dynamics_scalar(
                s, jnp.asarray([th], jnp.float64), qd, tau
            )[0]
        )
        assert np.isclose(qdd, 0.0, atol=1e-7)

    th = 0.6
    qdd_a = float(
        forward_dynamics_scalar(s, jnp.asarray([th], jnp.float64), qd, tau)[0]
    )
    qdd_b = float(
        forward_dynamics_scalar(
            s, jnp.asarray([th + np.pi], jnp.float64), qd, tau
        )[0]
    )
    assert np.isclose(abs(qdd_a), (G / l) * np.cos(th), atol=1e-9)
    assert np.isclose(qdd_b, -qdd_a, atol=1e-9)


def test_pendulum_holding_torque():
    """Static hold at theta: |tau| = m g l cos(theta) (textbook)."""
    l, m = 0.7, 1.5
    s = _pendulum_struct(l=l, m=m).astype(jnp.float64)
    from differentiable_robot_model_tpu.ops.dynamics_scalar import rnea_scalar

    for th in (0.0, 0.4, 1.1):
        tau = float(
            rnea_scalar(
                s, jnp.asarray([th], jnp.float64), jnp.zeros(1, jnp.float64),
                jnp.zeros(1, jnp.float64),
            )[0]
        )
        assert np.isclose(abs(tau), m * G * l * np.cos(th), atol=1e-9)


def test_energy_conservation_undamped_rollout(twolink):
    """Undamped free swing of the 2-link under gravity... gravity does no
    work here (motion in xy-plane), so kinetic energy T = 0.5 qd^T H qd
    alone must be conserved along a fine-dt rollout."""
    from differentiable_robot_model_tpu.ops.dynamics_scalar import (
        forward_dynamics_scalar,
        mass_matrix_scalar,
    )

    s = twolink.struct.astype(jnp.float64)
    dt = 1e-4
    q = jnp.asarray([0.3, -0.5], jnp.float64)
    qd = jnp.asarray([1.0, -2.0], jnp.float64)

    def step(carry, _):
        q, qd = carry
        qdd = forward_dynamics_scalar(
            s, q, qd, jnp.zeros(2, jnp.float64), use_damping=False
        )
        qd2 = qd + dt * qdd
        return (q + dt * qd2, qd2), (q, qd)

    (_, _), (qs, qds) = jax.lax.scan(step, (q, qd), None, length=2000)

    def kinetic(q, qd):
        H = mass_matrix_scalar(s, q)
        return 0.5 * qd @ H @ qd

    E = jax.vmap(kinetic)(qs, qds)
    E = np.asarray(E)
    assert abs(E[-1] - E[0]) < 1e-3 * E[0]


def test_pendulum_energy_conservation_with_potential():
    """Pendulum swing: E = 0.5 m l^2 qd^2 + m g z_com conserved (z_com =
    -l sin(theta) for rotation about +y from +x)."""
    from differentiable_robot_model_tpu.ops.dynamics_scalar import (
        forward_dynamics_scalar,
    )

    l, m = 0.5, 2.0
    s = _pendulum_struct(l=l, m=m).astype(jnp.float64)
    dt = 1e-4
    q = jnp.asarray([0.2], jnp.float64)
    qd = jnp.asarray([0.5], jnp.float64)

    def step(carry, _):
        q, qd = carry
        qdd = forward_dynamics_scalar(s, q, qd, jnp.zeros(1, jnp.float64))
        qd2 = qd + dt * qdd
        return (q + dt * qd2, qd2), (q, qd)

    (_, _), (qs, qds) = jax.lax.scan(step, (q, qd), None, length=5000)
    qs, qds = np.asarray(qs)[:, 0], np.asarray(qds)[:, 0]
    T = 0.5 * m * l * l * qds**2
    # Right-hand rotation about +y maps (l,0,0) -> (l cos th, 0, -l sin th),
    # so z_com = -l sin(theta) and V = -m g l sin(theta).
    V = -m * G * l * np.sin(qs)
    E = T + V
    assert np.ptp(E) < 1e-3 * max(np.ptp(T), 1e-12)
