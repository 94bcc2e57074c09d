"""Trajectory optimization: rollouts, costs, Adam solver, iLQR."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from differentiable_robot_model_tpu import DifferentiableFrankaPanda, DifferentiableKUKAiiwa
from differentiable_robot_model_tpu.ops import kinematics as K
from differentiable_robot_model_tpu.trajopt.costs import dense_goal_cost
from differentiable_robot_model_tpu.trajopt.rollout import (
    clip_to_limits,
    dynamic_rollout,
    kinematic_rollout,
)
from differentiable_robot_model_tpu.trajopt.solvers import (
    ilqr,
    solve_kinematic_adam,
    solve_kinematic_adam_batch,
)


@pytest.fixture(scope="module")
def panda():
    return DifferentiableFrankaPanda()


def test_kinematic_rollout_matches_manual_loop(panda):
    """Scan rollout == hand-written Python loop with the reference's
    semantics (run_kinematic_trajectory_opt.py:49-61)."""
    struct = panda.struct
    ee = struct.link_index("panda_virtual_ee_link")
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.uniform(-0.3, 0.3, 7), jnp.float32)
    actions = jnp.asarray(rng.normal(0, 0.05, (6, 7)), jnp.float32)

    ee_traj, q_traj = kinematic_rollout(struct, q0, actions, ee)

    q = clip_to_limits(struct, q0)
    exp_q = [np.asarray(q0)]
    exp_ee = [np.asarray(K.fk_world(struct, q)[1][ee])]
    for t in range(5):
        q = clip_to_limits(struct, q + actions[t])
        exp_q.append(np.asarray(q))
        exp_ee.append(np.asarray(K.fk_world(struct, q)[1][ee]))
    assert np.allclose(np.asarray(q_traj), np.stack(exp_q), atol=1e-6)
    assert np.allclose(np.asarray(ee_traj), np.stack(exp_ee), atol=1e-6)


def test_rollout_clips_to_limits(panda):
    struct = panda.struct
    ee = struct.link_index("panda_virtual_ee_link")
    q0 = jnp.zeros(7, jnp.float32)
    actions = jnp.ones((4, 7), jnp.float32) * 100.0  # run far past limits
    _, q_traj = kinematic_rollout(struct, q0, actions, ee)
    assert np.all(np.asarray(q_traj[1:]) <= np.asarray(struct.limit_upper) + 1e-6)


def test_associative_rollout_matches_sequential_gradients(panda):
    """The horizon-parallel (associative-scan) integration must agree with a
    plain sequential scan in values AND gradients, including at active joint
    limits where the clamp saturates."""
    struct = panda.struct
    ee = struct.link_index("panda_virtual_ee_link")
    rng = np.random.default_rng(7)
    q0 = jnp.asarray(rng.uniform(-0.3, 0.3, 7), jnp.float32)
    # Large actions so several steps saturate the limits.
    actions = jnp.asarray(rng.normal(0, 0.8, (12, 7)), jnp.float32)

    def seq_cost(acts):
        q = clip_to_limits(struct, q0)
        total = 0.0
        for t in range(acts.shape[0] - 1):
            q = clip_to_limits(struct, q + acts[t])
            total = total + jnp.sum(K.fk_world(struct, q)[1][ee] ** 2)
        return total

    def assoc_cost(acts):
        ee_traj, _ = kinematic_rollout(struct, q0, acts, ee)
        return jnp.sum(ee_traj[1:] ** 2)

    assert np.allclose(float(seq_cost(actions)), float(assoc_cost(actions)), rtol=1e-6)
    g_seq = jax.grad(seq_cost)(actions)
    g_assoc = jax.grad(assoc_cost)(actions)
    assert np.allclose(np.asarray(g_seq), np.asarray(g_assoc), atol=1e-5)


def test_dense_goal_cost_formula():
    goal = jnp.asarray([1.0, 2.0, 3.0])
    traj = jnp.zeros((5, 3))
    # reference formula: mean((100*(traj - goal))^2) over all entries
    val = float(dense_goal_cost(goal, traj))
    manual = float(np.mean((100.0 * (np.zeros((5, 3)) - np.asarray(goal))) ** 2))
    assert np.allclose(val, manual)


def test_adam_solver_reaches_goal(panda):
    struct = panda.struct
    ee = struct.link_index("panda_virtual_ee_link")
    q0 = jnp.asarray([0.0, 0.0, 0.0, -1.5, 0.0, 1.6, 0.0], jnp.float32)
    q_goal = jnp.zeros(7, jnp.float32)
    _, p_all = K.fk_world(struct, q_goal), None
    goal = K.fk_world(struct, q_goal)[1][ee]
    res = jax.jit(
        lambda: solve_kinematic_adam(struct, q0, goal, ee, horizon=20, n_iters=150, lr=2e-2)
    )()
    hist = np.asarray(res.cost_history)
    assert hist[-1] < hist[0] * 0.1
    # final ee close to goal
    ee_traj, _ = kinematic_rollout(struct, q0, res.actions, ee)
    assert np.linalg.norm(np.asarray(ee_traj[-1]) - np.asarray(goal)) < 0.05


def test_batched_solver_matches_vmapped_per_sample(panda):
    """solve_kinematic_adam_batch (dof-major throughput twin) == vmap of the
    per-sample solver, same algorithm on the same backend."""
    struct = panda.struct
    ee = struct.link_index("panda_virtual_ee_link")
    rng = np.random.default_rng(11)
    B, H = 4, 8
    q0 = jnp.asarray(rng.uniform(-0.4, 0.4, (B, 7)), jnp.float32)
    goals = jax.vmap(lambda q: K.fk_world(struct, q)[1][ee])(
        jnp.asarray(rng.uniform(-0.5, 0.5, (B, 7)), jnp.float32)
    )
    res_b = solve_kinematic_adam_batch(
        struct, q0, goals, ee, horizon=H, n_iters=12, lr=0.02,
        fk_impl="scalar", eps=1e-3,
    )
    res_v = jax.vmap(
        lambda a, b: solve_kinematic_adam(
            struct, a, b, ee, horizon=H, n_iters=12, lr=0.02, eps=1e-3
        )
    )(q0, goals)
    assert np.allclose(np.asarray(res_b.actions), np.asarray(res_v.actions), atol=1e-5)
    assert np.allclose(np.asarray(res_b.cost), np.asarray(res_v.cost), rtol=1e-5)


def test_stop_gradient_variant_still_optimizes(panda):
    struct = panda.struct
    ee = struct.link_index("panda_virtual_ee_link")
    q0 = jnp.asarray([0.0, 0.0, 0.0, -1.5, 0.0, 1.6, 0.0], jnp.float32)
    goal = K.fk_world(struct, jnp.zeros(7, jnp.float32))[1][ee]
    res = solve_kinematic_adam(
        struct, q0, goal, ee, horizon=10, n_iters=50, lr=1e-2,
        stop_gradient_between_steps=True,
    )
    hist = np.asarray(res.cost_history)
    assert hist[-1] < hist[0]


def test_dynamic_rollout_gravity_sanity():
    """Unactuated iiwa under gravity starts accelerating; states stay finite."""
    model = DifferentiableKUKAiiwa()
    struct = model.struct
    ee = struct.link_index("iiwa_link_ee")
    q0 = jnp.asarray([0.3, 0.4, 0.1, -0.5, 0.2, 0.3, 0.0], jnp.float32)
    qd0 = jnp.zeros(7, jnp.float32)
    taus = jnp.zeros((50, 7), jnp.float32)
    out = dynamic_rollout(struct, q0, qd0, taus, dt=1e-3, ee_link_idx=ee)
    assert np.isfinite(np.asarray(out.q)).all()
    assert float(jnp.max(jnp.abs(out.qd))) > 1e-3  # gravity did something


def test_ilqr_double_integrator():
    """iLQR solves a trivial LQR problem near-exactly in a few iterations."""
    dt = 0.1

    def dynamics(x, u):
        pos, vel = x[:2], x[2:]
        vel2 = vel + dt * u
        return jnp.concatenate([pos + dt * vel2, vel2])

    goal = jnp.asarray([1.0, -0.5, 0.0, 0.0])

    def cost(x, u):
        return 0.1 * jnp.sum(u * u) + jnp.sum((x - goal) ** 2)

    def final_cost(x):
        return 100.0 * jnp.sum((x - goal) ** 2)

    x0 = jnp.zeros(4)
    us0 = jnp.zeros((30, 2))
    res = jax.jit(lambda: ilqr(dynamics, cost, final_cost, x0, us0, n_iters=10))()
    hist = np.asarray(res.cost_history)
    assert hist[-1] < hist[0] * 0.2
    assert np.linalg.norm(np.asarray(res.xs[-1][:2]) - np.asarray(goal[:2])) < 0.05


def test_parallel_riccati_matches_sequential():
    """The associative-scan Riccati backward pass (horizon-parallel
    factorization) must produce the same gains and the same iLQR iterates as
    the sequential recursion."""
    dt = 0.1

    def dynamics(x, u):
        pos, vel = x[:2], x[2:]
        vel2 = vel + dt * u
        return jnp.concatenate([pos + dt * vel2, vel2])

    goal = jnp.asarray([1.0, -0.5, 0.0, 0.0])

    def cost(x, u):
        return 0.1 * jnp.sum(u * u) + jnp.sum((x - goal) ** 2) + 0.05 * x[0] * u[1]

    def final_cost(x):
        return 100.0 * jnp.sum((x - goal) ** 2)

    x0 = jnp.asarray([0.2, -0.1, 0.3, 0.05])
    us0 = jnp.asarray(np.random.default_rng(5).normal(0, 0.1, (17, 2)), jnp.float64)
    x0 = x0.astype(jnp.float64)

    r_seq = jax.jit(
        lambda: ilqr(dynamics, cost, final_cost, x0, us0, n_iters=8, riccati="sequential")
    )()
    r_par = jax.jit(
        lambda: ilqr(dynamics, cost, final_cost, x0, us0, n_iters=8, riccati="parallel")
    )()
    assert np.allclose(np.asarray(r_seq.us), np.asarray(r_par.us), atol=1e-8)
    assert np.allclose(
        np.asarray(r_seq.cost_history), np.asarray(r_par.cost_history), rtol=1e-10
    )


def test_parallel_riccati_iiwa_reach():
    """Horizon-parallel iLQR solves the kinematic iiwa reach like the
    sequential one (float32, real robot plant)."""
    model = DifferentiableKUKAiiwa()
    struct = model.struct
    ee = struct.link_index("iiwa_link_ee")
    goal = K.fk_world(struct, jnp.zeros(7, jnp.float32))[1][ee]
    dt = 0.1

    def dynamics(x, u):
        return clip_to_limits(struct, x + dt * u)

    def cost(x, u):
        _, p = K.fk_world(struct, x)
        return 0.01 * jnp.sum(u * u) + 10.0 * jnp.sum((p[ee] - goal) ** 2)

    def final_cost(x):
        _, p = K.fk_world(struct, x)
        return 1000.0 * jnp.sum((p[ee] - goal) ** 2)

    x0 = jnp.asarray([0.5, 0.3, -0.2, -1.2, 0.4, 1.0, 0.1], jnp.float32)
    us0 = jnp.zeros((20, 7), jnp.float32)
    # Gains are identical to the sequential recursion on identical inputs
    # (test above); the full solves can fork at borderline line-search
    # accepts (clip-discontinuous plant, indefinite Hessians), so this test
    # only requires convergence, with a few extra iterations of headroom.
    res = jax.jit(
        lambda: ilqr(dynamics, cost, final_cost, x0, us0, n_iters=25, riccati="parallel")
    )()
    hist = np.asarray(res.cost_history)
    assert hist[-1] < hist[0]
    _, p = K.fk_world(struct, res.xs[-1])
    assert np.linalg.norm(np.asarray(p[ee]) - np.asarray(goal)) < 0.05


def test_ilqr_torque_space_dynamic():
    """iLQR through the real forward dynamics (torque controls): stabilize
    the 2-link robot at an upright target. No reference analog (the
    reference has no dynamic trajectory optimization at all)."""
    from differentiable_robot_model_tpu import DifferentiableTwoLinkRobot
    from differentiable_robot_model_tpu.ops import dynamics as D

    struct = DifferentiableTwoLinkRobot().struct
    dt = 0.05
    q_target = jnp.asarray([0.8, -0.4], jnp.float32)

    def dynamics(x, u):
        q, qd = x[:2], x[2:]
        qdd = D.forward_dynamics_crb(struct, q, qd, u, use_damping=True)
        qd2 = qd + dt * qdd
        return jnp.concatenate([q + dt * qd2, qd2])

    def cost(x, u):
        return (
            0.001 * jnp.sum(u * u)
            + 5.0 * jnp.sum((x[:2] - q_target) ** 2)
            + 0.1 * jnp.sum(x[2:] ** 2)
        )

    def final_cost(x):
        return 500.0 * jnp.sum((x[:2] - q_target) ** 2) + 5.0 * jnp.sum(x[2:] ** 2)

    x0 = jnp.zeros(4, jnp.float32)
    us0 = jnp.zeros((25, 2), jnp.float32)
    res = jax.jit(lambda: ilqr(dynamics, cost, final_cost, x0, us0, n_iters=15))()
    hist = np.asarray(res.cost_history)
    assert hist[-1] < hist[0] * 0.1
    assert np.linalg.norm(np.asarray(res.xs[-1][:2]) - np.asarray(q_target)) < 0.05


def test_ilqr_iiwa_reach():
    """iLQR through the real kinematic plant (joint-velocity controls)."""
    model = DifferentiableKUKAiiwa()
    struct = model.struct
    ee = struct.link_index("iiwa_link_ee")
    goal = K.fk_world(struct, jnp.zeros(7, jnp.float32))[1][ee]
    dt = 0.1

    def dynamics(x, u):
        return clip_to_limits(struct, x + dt * u)

    def cost(x, u):
        _, p = K.fk_world(struct, x)
        return 0.01 * jnp.sum(u * u) + 10.0 * jnp.sum((p[ee] - goal) ** 2)

    def final_cost(x):
        _, p = K.fk_world(struct, x)
        return 1000.0 * jnp.sum((p[ee] - goal) ** 2)

    x0 = jnp.asarray([0.5, 0.3, -0.2, -1.2, 0.4, 1.0, 0.1], jnp.float32)
    us0 = jnp.zeros((20, 7), jnp.float32)
    res = jax.jit(lambda: ilqr(dynamics, cost, final_cost, x0, us0, n_iters=12))()
    hist = np.asarray(res.cost_history)
    assert hist[-1] < hist[0]
    _, p = K.fk_world(struct, res.xs[-1])
    assert np.linalg.norm(np.asarray(p[ee]) - np.asarray(goal)) < 0.05
