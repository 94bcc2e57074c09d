"""Device/dtype smoke test: every public method runs under each dtype.

Counterpart of reference tests/test_devices.py (47 LoC: 2-link model across
cpu/cuda device combos); here the axes are dtypes (float32/float64/bfloat16)
and sharded placement across the virtual 8-device mesh.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from differentiable_robot_model_tpu import DifferentiableTwoLinkRobot
from differentiable_robot_model_tpu.parallel.mesh import make_mesh, shard_scenarios


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64, jnp.bfloat16], ids=str)
def test_all_public_methods_run(dtype):
    robot = DifferentiableTwoLinkRobot(dtype=dtype)
    q = np.array([0.3, -0.4])
    qd = np.array([0.1, 0.1])
    qdd = np.array([0.2, -0.1])
    ee = "endEffector"

    robot.update_kinematic_state(q, qd)
    robot.compute_forward_kinematics(q, ee)
    robot.compute_forward_kinematics(q, ee, recursive=True)
    robot.compute_forward_kinematics_all_links(q)
    robot.compute_endeffector_jacobian(q, ee)
    robot.compute_inverse_dynamics(q, qd, qdd)
    robot.compute_non_linear_effects(q, qd)
    robot.compute_lagrangian_inertia_matrix(q)
    robot.compute_forward_dynamics(q, qd, qdd)
    robot.compute_forward_dynamics(q, qd, qdd, method="aba")
    robot.compute_forward_dynamics_old(q, qd, qdd)
    robot.get_joint_limits()
    robot.get_link_names()


def test_methods_run_on_sharded_inputs():
    robot = DifferentiableTwoLinkRobot()
    mesh = make_mesh(jax.devices()[:8])
    B = 16
    q = shard_scenarios(mesh, jnp.zeros((B, 2), jnp.float32))
    pos, quat = robot.compute_forward_kinematics(q, "endEffector")
    assert pos.shape == (B, 3)
    tau = robot.compute_inverse_dynamics(q, q, q)
    assert np.isfinite(np.asarray(tau, dtype=np.float32)).all()
