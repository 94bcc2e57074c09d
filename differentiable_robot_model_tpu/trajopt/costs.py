"""Trajectory cost functions (pure, batched, differentiable).

Counterpart of the reference's DenseGoalCost
(reference: examples/run_kinematic_trajectory_opt.py:64-70), widened into the
cost stack an MPC solver needs: goal tracking, action effort, joint-limit
barriers, and quadratic stage costs for iLQR.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.structs import RobotStruct


def dense_goal_cost(goal: jnp.ndarray, trajectory: jnp.ndarray, weight: float = 100.0):
    """mean((weight * (traj - goal))^2) — exact parity with reference
    DenseGoalCost.forward (run_kinematic_trajectory_opt.py:68-70)."""
    d = weight * (trajectory - goal)
    return jnp.mean(d * d)


def terminal_goal_cost(goal: jnp.ndarray, trajectory: jnp.ndarray, weight: float = 100.0):
    """Squared distance of the final trajectory point to the goal."""
    d = weight * (trajectory[..., -1, :] - goal)
    return jnp.mean(d * d)


def action_effort_cost(actions: jnp.ndarray, weight: float = 1.0):
    """Quadratic penalty on actions (regularizes the solve; keeps the iLQR
    Quu positive definite)."""
    return weight * jnp.mean(actions * actions)


def joint_limit_barrier(robot: RobotStruct, q_traj: jnp.ndarray, weight: float = 1.0, margin: float = 0.0):
    """Smooth one-sided quadratic barrier outside [lower+margin, upper-margin]."""
    lo = robot.limit_lower + margin
    hi = robot.limit_upper - margin
    below = jnp.maximum(lo - q_traj, 0.0)
    above = jnp.maximum(q_traj - hi, 0.0)
    return weight * jnp.mean(below * below + above * above)


def velocity_cost(qd_traj: jnp.ndarray, weight: float = 1.0):
    return weight * jnp.mean(qd_traj * qd_traj)
