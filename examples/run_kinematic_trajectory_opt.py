"""Optimize a joint-delta action sequence to reach an end-effector goal.

Counterpart of reference examples/run_kinematic_trajectory_opt.py (119 LoC):
same task (Franka Panda, H=20 action deltas, DenseGoalCost, Adam lr=1e-3,
100 iterations, open-loop playback) — but the whole optimization is ONE
jitted on-device program (solve_kinematic_adam), and playback runs through
the built-in PD-controlled dynamics sim instead of pybullet.
"""

import numpy as np
import jax
import jax.numpy as jnp

from differentiable_robot_model_tpu import DifferentiableFrankaPanda
from differentiable_robot_model_tpu.trajopt.solvers import solve_kinematic_adam
from examples.simple_sim_wrapper import SimpleSimWrapperPositionControl

EE_NAME = "panda_virtual_ee_link"
TIME_HORIZON = 20
N_DOFS = 7


def run(n_iters: int = 100, lr: float = 1e-3, playback: bool = True):
    model = DifferentiableFrankaPanda()
    struct = model.struct
    ee_idx = struct.link_index(EE_NAME)

    start_joint_config = jnp.asarray(
        [0.0, 0.0, 0.0, -1.5, 0.0, 1.6, 0.0], jnp.float32
    )
    goal_ee_pose, _ = model.compute_forward_kinematics(np.zeros(N_DOFS), EE_NAME)
    goal_ee_pose = jnp.asarray(goal_ee_pose)

    result = jax.jit(
        lambda q0, goal: solve_kinematic_adam(
            struct, q0, goal, ee_idx, horizon=TIME_HORIZON, n_iters=n_iters, lr=lr,
            stop_gradient_between_steps=True,  # reference's detach-per-step
        )
    )(start_joint_config, goal_ee_pose)
    for i, c in enumerate(np.asarray(result.cost_history)):
        print(f"cost: {c}")

    if playback:
        # open-loop execution of the optimized deltas through the PD sim
        # (reference run_kinematic_trajectory_opt.py:101-119)
        sim = SimpleSimWrapperPositionControl(model.urdf_path)
        sim.reset_joint_state(np.asarray(start_joint_config))
        des = np.asarray(start_joint_config)
        for i in range(TIME_HORIZON):
            des = des + np.asarray(result.actions[i])
            sim.step(des)
        ee_pos, _ = sim.get_link_state(EE_NAME)
        print("__________________________________________________")
        print(f"final dist to goal: {ee_pos - np.asarray(goal_ee_pose)}")
        print("__________________________________________________")

    return result


if __name__ == "__main__":
    run()
