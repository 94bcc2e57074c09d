"""Closed-loop TORQUE-SPACE MPC on the full forward dynamics.

No reference analog (its only trajectory workload is the kinematic
run_kinematic_trajectory_opt.py): here the plan is a torque sequence
integrated through RNEA + mass matrix + LDL^T forward dynamics, replanned
closed-loop with warm starts — and, with `solver="mppi"`, the same loop
runs the gradient-free sampling solver instead of preconditioned Adam.
Everything (solve, plant step, metrics) is jitted on-device.
"""

import numpy as np
import jax
import jax.numpy as jnp

from differentiable_robot_model_tpu import DifferentiableKUKAiiwa
from differentiable_robot_model_tpu.ops import kinematics as K
from differentiable_robot_model_tpu.trajopt.mpc import (
    DynamicMPCConfig,
    MPPIMPCConfig,
    dynamic_mpc_init,
    make_dynamic_mpc_step,
    make_mppi_mpc_step,
    mppi_mpc_init,
)

EE_NAME = "iiwa_link_ee"


def run(n_steps: int = 30, solver: str = "adam", horizon: int = 20, seed: int = 0):
    """Drive the iiwa end effector to a reach goal under torque control.

    Returns the per-step goal distances [n_steps] (numpy)."""
    model = DifferentiableKUKAiiwa()
    struct = model.struct
    ee_idx = struct.link_index(EE_NAME)

    q0 = jnp.zeros(7, jnp.float32).at[3].set(-1.2)
    qd0 = jnp.zeros(7, jnp.float32)
    goal = K.fk_link_position(struct, q0, ee_idx) + jnp.asarray(
        [0.10, 0.10, -0.10], jnp.float32
    )

    if solver == "adam":
        config = DynamicMPCConfig(horizon=horizon, iters_per_step=5)
        step = jax.jit(make_dynamic_mpc_step(struct, ee_idx, config))
        state = dynamic_mpc_init(struct, q0, qd0, config)
    elif solver == "mppi":
        config = MPPIMPCConfig(
            horizon=horizon, iters_per_step=3, n_samples=128
        )
        step = jax.jit(make_mppi_mpc_step(struct, ee_idx, config))
        state = mppi_mpc_init(struct, q0, qd0, config, jax.random.key(seed))
    else:
        raise ValueError(f"unknown solver '{solver}' (adam | mppi)")

    dists = []
    for i in range(n_steps):
        state, metrics = step(state, goal)
        dists.append(float(metrics.goal_distance))
        if i % 5 == 0:
            print(
                f"step {i:3d}  goal dist {dists[-1]:.4f} m  "
                f"plan cost {float(metrics.cost):.4f}"
            )
    print(f"final goal distance: {dists[-1]:.4f} m ({solver})")
    return np.asarray(dists)


if __name__ == "__main__":
    import sys

    run(solver=sys.argv[1] if len(sys.argv) > 1 else "adam")
