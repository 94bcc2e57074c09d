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
    dynamic_rollout_dof_major,
    fd_step_implicit_damping,
    kinematic_rollout,
)
from differentiable_robot_model_tpu.trajopt.solvers import (
    ilqr,
    solve_dynamic_adam,
    solve_dynamic_adam_batch,
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


@pytest.fixture(scope="module")
def iiwa_scenarios():
    robot = DifferentiableKUKAiiwa()
    struct = robot.struct
    ee = struct.link_index("iiwa_link_ee")
    rng = np.random.default_rng(3)
    B = 4
    lo = np.asarray(struct.limit_lower, np.float32)
    hi = np.asarray(struct.limit_upper, np.float32)
    q0 = jnp.asarray(rng.uniform(0.3 * lo, 0.3 * hi, (B, 7)), jnp.float32)
    qd0 = jnp.zeros((B, 7), jnp.float32)
    qg = jnp.asarray(rng.uniform(0.5 * lo, 0.5 * hi, (B, 7)), jnp.float32)
    goals = jax.vmap(lambda q: K.fk_world(struct, q)[1][ee])(qg)
    return struct, ee, q0, qd0, goals


def test_fd_implicit_damping_matches_explicit_without_damping(iiwa_scenarios):
    """With damping off the implicit-damping step IS the explicit forward
    dynamics (the extra diagonal term vanishes)."""
    from differentiable_robot_model_tpu.ops.dynamics_scalar import (
        forward_dynamics_scalar,
    )

    struct, ee, q0, qd0, goals = iiwa_scenarios
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(0, 0.4, 7), jnp.float64)
    qd = jnp.asarray(rng.normal(0, 0.2, 7), jnp.float64)
    tau = jnp.asarray(rng.normal(0, 2.0, 7), jnp.float64)
    s64 = struct.astype(jnp.float64)
    a = fd_step_implicit_damping(s64, q, qd, tau, dt=0.02, use_damping=False)
    b = forward_dynamics_scalar(s64, q, qd, tau, use_damping=False)
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_fd_implicit_damping_converges_to_explicit_as_dt_to_zero(iiwa_scenarios):
    """(H + dt D)^-1 rhs -> H^-1 rhs linearly in dt."""
    from differentiable_robot_model_tpu.ops.dynamics_scalar import (
        forward_dynamics_scalar,
    )

    struct, ee, q0, qd0, goals = iiwa_scenarios
    s64 = struct.astype(jnp.float64)
    rng = np.random.default_rng(6)
    q = jnp.asarray(rng.normal(0, 0.4, 7), jnp.float64)
    qd = jnp.asarray(rng.normal(0, 0.2, 7), jnp.float64)
    tau = jnp.asarray(rng.normal(0, 2.0, 7), jnp.float64)
    explicit = np.asarray(forward_dynamics_scalar(s64, q, qd, tau, use_damping=True))
    errs = []
    for dt in (1e-2, 1e-3, 1e-4, 1e-5):
        impl = np.asarray(fd_step_implicit_damping(s64, q, qd, tau, dt=dt))
        errs.append(np.max(np.abs(impl - explicit)))
    assert errs[0] > errs[1] > errs[2] > errs[3]
    # Linear in dt once dt*d/H_ii << 1 (the wrist has dt*d/H_ii ~ 3 at
    # dt=1e-2, so the first decades are saturation, not the linear regime).
    assert errs[3] < 0.15 * errs[2]
    assert errs[3] < 5e-3 * np.max(np.abs(explicit))


def test_dynamic_rollout_dof_major_stable_under_torque_perturbation(iiwa_scenarios):
    """The implicit-damping integrator holds dt=0.02 on the iiwa where the
    explicit damping term is unstable (dt*d/H_ii > 2 at the wrist): a +-1 Nm
    perturbation around gravity compensation must stay bounded and finite
    over 50 steps."""
    from differentiable_robot_model_tpu.ops.dynamics_scalar import rnea_scalar

    struct, ee, q0, qd0, goals = iiwa_scenarios
    q0T, qd0T = q0.T, qd0.T
    zeros = jnp.zeros_like(q0T)
    tau_ref = rnea_scalar(struct, q0T, zeros, zeros)
    rng = np.random.default_rng(9)
    pert = jnp.asarray(np.sign(rng.normal(size=(50, 7, q0.shape[0]))), jnp.float32)
    qs, qds = dynamic_rollout_dof_major(
        struct, q0T, qd0T, tau_ref[None] + pert, dt=0.02
    )
    assert bool(jnp.all(jnp.isfinite(qs))) and bool(jnp.all(jnp.isfinite(qds)))
    assert float(jnp.max(jnp.abs(qds))) < 50.0


def test_dynamic_rollout_dof_major_matches_vmapped_steps(iiwa_scenarios):
    """Dof-major trailing-batch rollout == vmap of per-sample implicit steps."""
    struct, ee, q0, qd0, goals = iiwa_scenarios
    B = q0.shape[0]
    rng = np.random.default_rng(4)
    taus = jnp.asarray(rng.normal(0, 1.0, (6, 7, B)), jnp.float32)

    qs, qds = dynamic_rollout_dof_major(struct, q0.T, qd0.T, taus, dt=0.01)

    def one(q0_, qd0_, taus_):  # taus_ [H, D]
        def step(carry, tau_t):
            q, qd = carry
            qdd = fd_step_implicit_damping(struct, q, qd, tau_t, 0.01)
            qd2 = qd + 0.01 * qdd
            return (q + 0.01 * qd2, qd2), (q + 0.01 * qd2, qd2)

        _, out = jax.lax.scan(step, (q0_, qd0_), taus_)
        return out

    qs_v, qds_v = jax.vmap(one, in_axes=(0, 0, 2), out_axes=2)(q0, qd0, taus)
    assert np.allclose(np.asarray(qs), np.asarray(qs_v), atol=1e-6)
    assert np.allclose(np.asarray(qds), np.asarray(qds_v), atol=1e-6)


def test_dynamic_batched_solver_matches_vmapped_per_sample(iiwa_scenarios):
    """solve_dynamic_adam_batch (dof-major) == vmap(solve_dynamic_adam):
    same torques, same costs (observed bitwise-equal on CPU; asserted to
    fp32 roundoff)."""
    struct, ee, q0, qd0, goals = iiwa_scenarios
    H = 10
    res_b = solve_dynamic_adam_batch(
        struct, q0, qd0, goals, ee, horizon=H, n_iters=8, lr=1.0, eps=1e-1
    )
    res_v = jax.vmap(
        lambda a, b, c: solve_dynamic_adam(
            struct, a, b, c, ee, horizon=H, n_iters=8, lr=1.0, eps=1e-1
        )
    )(q0, qd0, goals)
    assert np.allclose(np.asarray(res_b.actions), np.asarray(res_v.actions), atol=1e-5)
    assert np.allclose(np.asarray(res_b.cost), np.asarray(res_v.cost), rtol=1e-5)
    hist = np.asarray(res_b.cost_history)
    assert np.all(np.isfinite(hist))
    assert np.all(hist[-1] < hist[0])  # every scenario improved


def test_dynamic_solver_moves_ee_toward_goal(iiwa_scenarios):
    """Torque-space MPC through the forward dynamics reduces end-effector
    goal distance from the zero-delta (gravity-hold) rollout."""
    struct, ee, q0, qd0, goals = iiwa_scenarios
    H = 25
    res = solve_dynamic_adam_batch(
        struct, q0, qd0, goals, ee, horizon=H, n_iters=60, lr=1.0, eps=1e-1,
        dt=0.02,
    )
    hist = np.asarray(res.cost_history)
    assert np.all(np.isfinite(hist))
    # The dense cost keeps an irreducible early-horizon transient (the arm
    # starts at rest away from the goal), so require a solid but not total
    # reduction, plus the geometric check below.
    assert np.all(hist[-1] < 0.65 * hist[0])
    # Final-state ee distance closed vs the held start pose for most scenarios.
    qs, _ = dynamic_rollout_dof_major(
        struct, q0.T, qd0.T, jnp.transpose(res.actions, (1, 2, 0)), dt=0.02
    )
    p_fin = jax.vmap(lambda q: K.fk_world(struct, q)[1][ee])(qs[-1].T)
    p_start = jax.vmap(lambda q: K.fk_world(struct, q)[1][ee])(q0)
    d_fin = np.linalg.norm(np.asarray(p_fin - goals), axis=-1)
    d_start = np.linalg.norm(np.asarray(p_start - goals), axis=-1)
    assert np.mean(d_fin < d_start) >= 0.75


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


def test_sequential_riccati_survives_indefinite_quu():
    """Round-3 fork fix (RICCATI_DIAG_r03.json): on a nonlinear plant whose
    terminal Hessian drives Quu indefinite, the sequential backward pass
    must keep making progress (the old cho_factor path emitted NaN gains at
    EVERY stage and the solve never left its initial cost) and must land
    within a few percent of the parallel path's cost."""
    # Pendulum-ish plant with a trig observation: the terminal Hessian of
    # 500*(sin(x0)-s*)^2 is strongly indefinite where cos(x0)^2 term loses
    # to the -sin(x0) curvature term.
    dt = 0.1

    def dynamics(x, u):
        th, w = x[0], x[1]
        w2 = w + dt * (u[0] - 2.0 * jnp.sin(th))
        return jnp.stack([th + dt * w2, w2])

    target = -0.9

    def obs_err(x):
        return jnp.sin(x[0]) - target

    def cost(x, u):
        return 0.01 * jnp.sum(u * u) + 5.0 * obs_err(x) ** 2

    def final_cost(x):
        return 500.0 * obs_err(x) ** 2 + 50.0 * x[1] ** 2

    # start at the peak of sin with the target at the trough: the
    # Gauss-Newton term cos^2 vanishes and the residual-curvature term
    # -(sin - t) sin dominates, making the terminal Hessian indefinite
    x0 = jnp.asarray([1.5, 0.0], jnp.float32)
    us0 = jnp.zeros((25, 1), jnp.float32)

    Vxx0 = np.asarray(jax.hessian(final_cost)(x0))
    assert np.linalg.eigvalsh(Vxx0)[0] < 0, "test premise: indefinite Vxx"

    r_seq = jax.jit(lambda: ilqr(
        dynamics, cost, final_cost, x0, us0, n_iters=25, riccati="sequential"
    ))()
    r_par = jax.jit(lambda: ilqr(
        dynamics, cost, final_cost, x0, us0, n_iters=25, riccati="parallel"
    ))()
    h_seq = np.asarray(r_seq.cost_history)
    h_par = np.asarray(r_par.cost_history)
    assert np.all(np.isfinite(h_seq))
    # the old code returned h_seq[-1] == h_seq[0] exactly (all NaN gains)
    assert h_seq[-1] < 0.5 * h_seq[0]
    # both backward passes solve the same problem to within a few percent
    assert h_seq[-1] < 1.1 * h_par[-1] + 1e-6


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


def test_gn_linearize_matches_autodiff_derivatives():
    """make_gn_reach_linearize: every returned stage derivative that is
    exact in Gauss-Newton (A, B, lx, lu, luu, lux, Vx) matches autodiff of
    the same cost to fp tolerance; lxx/Vxx differ ONLY by the dropped FK
    curvature term (checked small relative to the GN term and PSD)."""
    from differentiable_robot_model_tpu import DifferentiableKUKAiiwa
    from differentiable_robot_model_tpu.trajopt.rollout import (
        fd_step_implicit_damping,
    )
    from differentiable_robot_model_tpu.trajopt.solvers import (
        make_gn_reach_linearize,
    )

    struct = DifferentiableKUKAiiwa().struct
    ee = struct.link_index("iiwa_link_ee")
    D_, dt = 7, 0.02
    goal = jnp.asarray([0.45, 0.15, 0.65], jnp.float32)

    def dynamics(x, u):
        q, qd = x[:D_], x[D_:]
        qdd = fd_step_implicit_damping(struct, q, qd, u, dt)
        qd2 = qd + dt * qdd
        return jnp.concatenate([q + dt * qd2, qd2])

    gw, ew, wf = 10.0, 1e-4, 100.0

    def cost(x, u):
        p = K.fk_link_position(struct, x[None, :D_], ee)[0]
        return gw * jnp.sum((p - goal) ** 2) + ew * jnp.sum(u * u)

    def final_cost(x):
        p = K.fk_link_position(struct, x[None, :D_], ee)[0]
        return wf * jnp.sum((p - goal) ** 2)

    rng = np.random.default_rng(5)
    H = 4
    xs = jnp.asarray(
        np.concatenate(
            [rng.uniform(-0.6, 0.6, (H + 1, D_)),
             rng.uniform(-0.3, 0.3, (H + 1, D_))], axis=1
        ), jnp.float32)
    us = jnp.asarray(rng.uniform(-3, 3, (H, D_)), jnp.float32)

    gn = make_gn_reach_linearize(
        struct, ee, dynamics, goal, stage_goal_w=gw, effort_w=ew,
        u_ref=0.0, final_goal_w=wf,
    )
    A, B, lx, lu, lxx, luu, lux, Vx, Vxx = gn(xs, us)

    A_ref = jax.vmap(jax.jacfwd(dynamics, argnums=0))(xs[:-1], us)
    B_ref = jax.vmap(jax.jacfwd(dynamics, argnums=1))(xs[:-1], us)
    lx_ref = jax.vmap(jax.grad(cost, argnums=0))(xs[:-1], us)
    lu_ref = jax.vmap(jax.grad(cost, argnums=1))(xs[:-1], us)
    lxx_ref = jax.vmap(jax.hessian(cost, argnums=0))(xs[:-1], us)
    Vx_ref = jax.grad(final_cost)(xs[-1])

    assert np.allclose(np.asarray(A), np.asarray(A_ref), atol=1e-5)
    assert np.allclose(np.asarray(B), np.asarray(B_ref), atol=1e-5)
    # cost gradients are EXACT in GN (it only approximates curvature)
    scale = float(np.abs(np.asarray(lx_ref)).max())
    assert np.allclose(np.asarray(lx), np.asarray(lx_ref), atol=1e-4 * scale)
    assert np.allclose(np.asarray(lu), np.asarray(lu_ref), atol=1e-6)
    assert np.allclose(np.asarray(Vx), np.asarray(Vx_ref),
                       atol=1e-4 * float(np.abs(np.asarray(Vx_ref)).max()))
    assert np.allclose(np.asarray(lux), 0.0)
    assert np.allclose(np.asarray(luu), 2.0 * ew * np.eye(D_), atol=1e-7)
    # GN Hessian: PSD by construction (the exact Hessian need not be)
    evals = np.linalg.eigvalsh(np.asarray(lxx))
    assert evals.min() > -1e-4
    # ... and EXACT in the zero-residual limit: at a state whose ee
    # position IS the goal, the dropped curvature term 2w sum_j r_j Hess(p_j)
    # vanishes, so GN lxx == autodiff lxx there
    x_star = xs[0]
    p_star = K.fk_link_position(struct, x_star[None, :D_], ee)[0]
    gn0 = make_gn_reach_linearize(
        struct, ee, dynamics, p_star, stage_goal_w=gw, effort_w=ew,
        u_ref=0.0, final_goal_w=wf,
    )

    def cost0(x, u):
        p = K.fk_link_position(struct, x[None, :D_], ee)[0]
        return gw * jnp.sum((p - p_star) ** 2) + ew * jnp.sum(u * u)

    _, _, _, _, lxx0, _, _, _, _ = gn0(
        jnp.tile(x_star[None], (2, 1)), us[:1]
    )
    lxx0_ref = jax.hessian(cost0, argnums=0)(x_star, us[0])
    h0 = max(1.0, float(np.abs(np.asarray(lxx0_ref)).max()))
    assert np.abs(np.asarray(lxx0[0]) - np.asarray(lxx0_ref)).max() < 1e-3 * h0


def test_ilqr_gn_linearize_solves_reach():
    """ilqr(linearize=make_gn_reach_linearize(...)) converges on the
    torque-space iiwa reach to comparable quality as the generic autodiff
    linearization at the same iteration budget."""
    from differentiable_robot_model_tpu import DifferentiableKUKAiiwa
    from differentiable_robot_model_tpu.ops.dynamics_scalar import rnea_scalar
    from differentiable_robot_model_tpu.trajopt.rollout import (
        fd_step_implicit_damping,
    )
    from differentiable_robot_model_tpu.trajopt.solvers import (
        make_gn_reach_linearize,
    )

    struct = DifferentiableKUKAiiwa().struct
    ee = struct.link_index("iiwa_link_ee")
    D_, dt = 7, 0.02
    goal = jnp.asarray([0.45, 0.15, 0.65], jnp.float32)

    def dynamics(x, u):
        q, qd = x[:D_], x[D_:]
        qdd = fd_step_implicit_damping(struct, q, qd, u, dt)
        qd2 = qd + dt * qdd
        return jnp.concatenate([q + dt * qd2, qd2])

    def cost(x, u):
        p = K.fk_link_position(struct, x[None, :D_], ee)[0]
        return 10.0 * jnp.sum((p - goal) ** 2) + 1e-4 * jnp.sum(u * u)

    def final_cost(x):
        p = K.fk_link_position(struct, x[None, :D_], ee)[0]
        return 100.0 * jnp.sum((p - goal) ** 2)

    q0 = jnp.asarray([0.2, 0.4, -0.1, -1.0, 0.3, 0.8, 0.0], jnp.float32)
    x0 = jnp.concatenate([q0, jnp.zeros(7, jnp.float32)])
    z71 = jnp.zeros((7, 1), jnp.float32)
    tau_ref = rnea_scalar(struct, q0[:, None], z71, z71)[:, 0]
    us0 = jnp.tile(tau_ref[None], (15, 1)).astype(jnp.float32)

    gn = make_gn_reach_linearize(
        struct, ee, dynamics, goal, stage_goal_w=10.0, effort_w=1e-4,
        u_ref=0.0, final_goal_w=100.0,
    )
    r_gn = jax.jit(lambda: ilqr(dynamics, cost, final_cost, x0, us0,
                                n_iters=10, linearize=gn))()
    r_ad = jax.jit(lambda: ilqr(dynamics, cost, final_cost, x0, us0,
                                n_iters=10))()
    h_gn = np.asarray(r_gn.cost_history)
    h_ad = np.asarray(r_ad.cost_history)
    assert np.isfinite(h_gn).all()
    assert h_gn[-1] < h_gn[0] * 0.5
    # comparable quality (both are descent methods on the same problem)
    assert h_gn[-1] <= h_ad[-1] * 1.5 + 1e-3


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
    # 30 iterations of headroom (the parallel twin below uses 25): f32
    # solves on the clip-discontinuous plant fork at borderline
    # line-search accepts, so the exact iterate count to a given distance
    # is seed- and roundoff-sensitive (the unrolled-LDL backward's
    # different roundoff lands at 0.073 after 20 iters on this seed).
    res = jax.jit(lambda: ilqr(dynamics, cost, final_cost, x0, us0, n_iters=30))()
    hist = np.asarray(res.cost_history)
    assert hist[-1] < hist[0]
    _, p = K.fk_world(struct, res.xs[-1])
    assert np.linalg.norm(np.asarray(p[ee]) - np.asarray(goal)) < 0.05


def test_dynamic_warm_start_roundtrip(iiwa_scenarios):
    """init_actions takes ABSOLUTE torques — the same quantity .actions
    returns — so the natural MPC warm-start pattern
    (init_actions=prev.actions) round-trips exactly: warm-starting a
    0-iteration solve from a previous solution returns that solution, and
    the batched/unbatched twins agree on the warm-started solve."""
    struct, ee, q0, qd0, goals = iiwa_scenarios
    H = 8
    prev = solve_dynamic_adam_batch(
        struct, q0, qd0, goals, ee, horizon=H, n_iters=5, lr=1.0, eps=1e-1
    )
    # 0-iteration resolve from the warm start reproduces the warm start:
    # actions -> internal deltas -> actions is identity up to the LDL
    # solve/matvec round trip (fp32).
    res0 = solve_dynamic_adam_batch(
        struct, q0, qd0, goals, ee, horizon=H, n_iters=0, lr=1.0, eps=1e-1,
        init_actions=prev.actions,
    )
    assert np.allclose(
        np.asarray(res0.actions), np.asarray(prev.actions), atol=1e-4
    )
    # and its cost equals the previous final cost (same rollout).
    assert np.allclose(np.asarray(res0.cost), np.asarray(prev.cost), rtol=1e-5)

    # Batched == vmapped unbatched with the same warm start.
    res_b = solve_dynamic_adam_batch(
        struct, q0, qd0, goals, ee, horizon=H, n_iters=3, lr=1.0, eps=1e-1,
        init_actions=prev.actions,
    )
    res_v = jax.vmap(
        lambda a, b, c, w: solve_dynamic_adam(
            struct, a, b, c, ee, horizon=H, n_iters=3, lr=1.0, eps=1e-1,
            init_actions=w,
        )
    )(q0, qd0, goals, prev.actions)
    assert np.allclose(
        np.asarray(res_b.actions), np.asarray(res_v.actions), atol=1e-4
    )
    # Warm-started replanning should not be worse than the cold solve at
    # the same budget (the whole point of warm starts).
    cold = solve_dynamic_adam_batch(
        struct, q0, qd0, goals, ee, horizon=H, n_iters=3, lr=1.0, eps=1e-1
    )
    assert float(jnp.mean(res_b.cost)) <= float(jnp.mean(cold.cost)) + 1e-6


def test_kinematic_batched_solver_horizon_one(iiwa_scenarios):
    """H==1 edge: no integration steps, trajectory is just the clipped
    start, and the batched solver matches the vmapped unbatched solver
    (this path goes through clamp_affine_q_traj's empty-u guard)."""
    struct, ee, q0, _, goals = iiwa_scenarios
    res_b = solve_kinematic_adam_batch(
        struct, q0, goals, ee, horizon=1, n_iters=3, lr=0.05, eps=1e-1,
        fk_impl="scalar",
    )
    res_v = jax.vmap(
        lambda a, b: solve_kinematic_adam(
            struct, a, b, ee, horizon=1, n_iters=3, lr=0.05, eps=1e-1
        )
    )(q0, goals)
    assert res_b.actions.shape == (q0.shape[0], 1, 7)
    assert np.allclose(np.asarray(res_b.cost), np.asarray(res_v.cost), rtol=1e-5)
    assert np.all(np.isfinite(np.asarray(res_b.actions)))


# ---------------------------------------------------------------------------
# Effort limits (actuator box constraints) in the torque-space solvers
# ---------------------------------------------------------------------------


def test_effort_limits_box_constraint(iiwa_scenarios):
    """respect_effort_limits=True keeps every returned torque inside the
    URDF effort box even when it binds hard (5 Nm is far below the iiwa's
    gravity-compensation torques), and the clamped solve still improves.
    The reference parses effort limits (urdf_utils.py:59-64) but never
    enforces them — this is the box-constraint half of SURVEY §7 step 5."""
    struct, ee, q0, qd0, goals = iiwa_scenarios
    box = 5.0
    tight = struct.with_arrays(
        limit_effort=jnp.full((7,), box, struct.dtype)
    )
    res = solve_dynamic_adam_batch(
        tight, q0, qd0, goals, ee, horizon=10, n_iters=8, lr=1.0, eps=1e-1,
        respect_effort_limits=True,
    )
    a = np.asarray(res.actions)
    assert np.all(np.abs(a) <= box + 1e-5)
    assert np.any(np.abs(a) > 0.99 * box)  # the constraint actually binds
    hist = np.asarray(res.cost_history)
    assert np.all(np.isfinite(hist))
    assert np.all(hist[-1] < hist[0])


def test_effort_limits_batch_matches_unbatched(iiwa_scenarios):
    """Dof-major batched == vmapped per-sample solver with the box active."""
    struct, ee, q0, qd0, goals = iiwa_scenarios
    tight = struct.with_arrays(
        limit_effort=jnp.full((7,), 20.0, struct.dtype)
    )
    kw = dict(horizon=8, n_iters=6, lr=1.0, eps=1e-1,
              respect_effort_limits=True)
    res_b = solve_dynamic_adam_batch(tight, q0, qd0, goals, ee, **kw)
    res_v = jax.vmap(
        lambda a, b, c: solve_dynamic_adam(tight, a, b, c, ee, **kw)
    )(q0, qd0, goals)
    assert np.allclose(
        np.asarray(res_b.actions), np.asarray(res_v.actions), atol=1e-5
    )
    assert np.allclose(np.asarray(res_b.cost), np.asarray(res_v.cost), rtol=1e-5)


def test_effort_limits_nonpositive_means_unbounded(iiwa_scenarios):
    """Missing/non-positive URDF effort limits are unbounded: the flag is a
    no-op on such robots (matching _velocity_bound's convention)."""
    struct, ee, q0, qd0, goals = iiwa_scenarios
    unb = struct.with_arrays(limit_effort=jnp.zeros((7,), struct.dtype))
    kw = dict(horizon=8, n_iters=6, lr=1.0, eps=1e-1)
    res_on = solve_dynamic_adam_batch(
        unb, q0, qd0, goals, ee, respect_effort_limits=True, **kw
    )
    res_off = solve_dynamic_adam_batch(struct, q0, qd0, goals, ee, **kw)
    assert np.allclose(
        np.asarray(res_on.actions), np.asarray(res_off.actions), atol=1e-6
    )


def test_effort_limited_rollout_clamps_torques(iiwa_scenarios):
    """dynamic_rollout_dof_major(respect_effort_limits=True) equals feeding
    pre-clamped torques through the unconstrained rollout."""
    struct, ee, q0, qd0, _ = iiwa_scenarios
    from differentiable_robot_model_tpu.trajopt.rollout import clip_to_effort

    tight = struct.with_arrays(limit_effort=jnp.full((7,), 3.0, struct.dtype))
    rng = np.random.default_rng(11)
    taus = jnp.asarray(rng.normal(0, 10.0, (6, 7, q0.shape[0])), jnp.float32)
    qs_a, qds_a = dynamic_rollout_dof_major(
        tight, q0.T, qd0.T, taus, dt=0.01, respect_effort_limits=True
    )
    clamped = jnp.clip(taus, -3.0, 3.0)
    qs_b, qds_b = dynamic_rollout_dof_major(tight, q0.T, qd0.T, clamped, dt=0.01)
    assert np.allclose(np.asarray(qs_a), np.asarray(qs_b), atol=1e-7)
    assert np.allclose(np.asarray(qds_a), np.asarray(qds_b), atol=1e-7)
    # dof-last public helper agrees
    assert np.allclose(
        np.asarray(clip_to_effort(tight, taus.transpose(0, 2, 1))),
        np.asarray(clamped.transpose(0, 2, 1)),
    )


def test_ilqr_control_bounds():
    """Control-limited iLQR (forward-pass projection): every control in
    every accepted trajectory stays inside the box, the constraint binds,
    and the solve still converges toward the unconstrained target."""
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
        return 500.0 * jnp.sum((x[:2] - q_target) ** 2) + 5.0 * jnp.sum(
            x[2:] ** 2
        )

    x0 = jnp.zeros(4, jnp.float32)
    # init deliberately OUTSIDE the box: entry clamping must project it
    us0 = jnp.full((25, 2), 9.0, jnp.float32)
    box = 2.0
    res = jax.jit(
        lambda: ilqr(
            dynamics, cost, final_cost, x0, us0, n_iters=20,
            control_bounds=(-box, box),
        )
    )()
    us = np.asarray(res.us)
    assert np.all(np.abs(us) <= box + 1e-6)
    assert np.any(np.abs(us) > 0.99 * box)  # the box binds on this task
    hist = np.asarray(res.cost_history)
    assert np.all(np.isfinite(hist))
    assert hist[-1] < hist[0] * 0.1
    # still reaches the target (the box slows, not blocks, this plant)
    assert (
        np.linalg.norm(np.asarray(res.xs[-1][:2]) - np.asarray(q_target))
        < 0.1
    )


def test_dynamic_rollout_remat_same_values_and_gradients(iiwa_scenarios):
    """remat=True (checkpointed integration step) changes memory behavior
    only: values and reverse-mode gradients match the default exactly."""
    struct, ee, q0, qd0, _ = iiwa_scenarios
    rng = np.random.default_rng(13)
    taus = jnp.asarray(rng.normal(0, 2.0, (5, 7, q0.shape[0])), jnp.float32)

    def loss(taus_, remat):
        qs, qds = dynamic_rollout_dof_major(
            struct, q0.T, qd0.T, taus_, dt=0.01, remat=remat
        )
        return jnp.sum(qs**2) + jnp.sum(qds**2)

    v0, g0 = jax.value_and_grad(lambda t: loss(t, False))(taus)
    v1, g1 = jax.value_and_grad(lambda t: loss(t, True))(taus)
    assert np.allclose(float(v0), float(v1), rtol=1e-7)
    assert np.allclose(np.asarray(g0), np.asarray(g1), atol=1e-6)


# ---------------------------------------------------------------------------
# MPPI (sampling-based torque-space MPC)
# ---------------------------------------------------------------------------


def test_mppi_improves_and_is_deterministic(iiwa_scenarios):
    """MPPI improves on the gravity-comp hover baseline and is a pure
    function of its PRNG key."""
    from differentiable_robot_model_tpu.trajopt.solvers import (
        solve_dynamic_mppi,
    )

    struct, ee, q0, qd0, goals = iiwa_scenarios
    key = jax.random.key(7)
    solve = jax.jit(lambda q, qd, g, k: solve_dynamic_mppi(
        struct, q, qd, g, ee, horizon=8, key=k, n_samples=64, n_iters=6,
    ))
    res = solve(q0[0], qd0[0], goals[0], key)
    hist = np.asarray(res.cost_history)
    assert np.all(np.isfinite(hist))
    # hover cost = cost of the zero-delta nominal; sampling must beat it
    from differentiable_robot_model_tpu.trajopt.solvers import (
        solve_dynamic_adam,
    )
    hover = float(solve_dynamic_adam(
        struct, q0[0], qd0[0], goals[0], ee, horizon=8, n_iters=1, lr=0.0,
    ).cost)
    assert float(res.cost) < hover
    res2 = solve(q0[0], qd0[0], goals[0], key)
    assert np.allclose(np.asarray(res.actions), np.asarray(res2.actions))
    res3 = solve(q0[0], qd0[0], goals[0], jax.random.key(8))
    assert not np.allclose(np.asarray(res.actions), np.asarray(res3.actions))


def test_mppi_respects_effort_box(iiwa_scenarios):
    """With respect_effort_limits=True every returned torque obeys a
    deliberately tight URDF box (which binds: gravity comp alone needs
    more than 5 Nm on the iiwa)."""
    from differentiable_robot_model_tpu.trajopt.solvers import (
        solve_dynamic_mppi,
    )

    struct, ee, q0, qd0, goals = iiwa_scenarios
    box = 5.0
    tight = struct.with_arrays(limit_effort=jnp.full((7,), box, struct.dtype))
    res = solve_dynamic_mppi(
        tight, q0[0], qd0[0], goals[0], ee, horizon=8,
        key=jax.random.key(0), n_samples=32, n_iters=4,
        respect_effort_limits=True,
    )
    a = np.asarray(res.actions)
    assert np.all(np.abs(a) <= box + 1e-5)
    assert np.any(np.abs(a) > 0.99 * box)
    assert np.all(np.isfinite(np.asarray(res.cost_history)))


def test_mppi_warm_start_and_batch(iiwa_scenarios):
    """Warm-starting MPPI from an Adam solve's torques starts at (or below)
    that solve's cost, and the batch wrapper stacks per-scenario solves."""
    from differentiable_robot_model_tpu.trajopt.solvers import (
        solve_dynamic_adam,
        solve_dynamic_mppi,
        solve_dynamic_mppi_batch,
    )

    struct, ee, q0, qd0, goals = iiwa_scenarios
    adam = solve_dynamic_adam(
        struct, q0[0], qd0[0], goals[0], ee, horizon=8, n_iters=6, lr=0.5,
        eps=1e-1,
    )
    res = solve_dynamic_mppi(
        struct, q0[0], qd0[0], goals[0], ee, horizon=8,
        key=jax.random.key(1), n_samples=64, n_iters=4,
        init_actions=adam.actions,
    )
    # sample 0 is the unperturbed warm start, so MPPI can only improve on
    # the warm-start cost (up to the effort-term bookkeeping, identical
    # cost definitions)
    assert float(res.cost) <= float(adam.cost) * 1.02
    assert np.all(np.isfinite(np.asarray(res.actions)))

    B = q0.shape[0]
    rb = jax.jit(lambda q, qd, g, k: solve_dynamic_mppi_batch(
        struct, q, qd, g, ee, horizon=6, key=k, n_samples=32, n_iters=3,
    ))(q0, qd0, goals, jax.random.key(2))
    assert rb.actions.shape == (B, 6, 7)
    assert rb.cost.shape == (B,)
    assert np.all(np.isfinite(np.asarray(rb.cost_history)))


def test_mppi_adaptation_flags(iiwa_scenarios):
    """adapt_sigma/adapt_temperature change the solve (the adapted state is
    live), stay deterministic per key, and still improve on the hover
    baseline; flags default off so the tuned-constant path is unchanged."""
    from differentiable_robot_model_tpu.trajopt.solvers import (
        solve_dynamic_adam,
        solve_dynamic_mppi,
    )

    struct, ee, q0, qd0, goals = iiwa_scenarios
    key = jax.random.key(7)
    kw = dict(horizon=8, n_samples=64, n_iters=6)
    base = solve_dynamic_mppi(struct, q0[0], qd0[0], goals[0], ee, key=key, **kw)
    adapt = jax.jit(lambda q, qd, g, k: solve_dynamic_mppi(
        struct, q, qd, g, ee, key=k, adapt_sigma=True,
        adapt_temperature=True, **kw,
    ))
    res = adapt(q0[0], qd0[0], goals[0], key)
    assert np.all(np.isfinite(np.asarray(res.cost_history)))
    hover = float(solve_dynamic_adam(
        struct, q0[0], qd0[0], goals[0], ee, horizon=8, n_iters=1, lr=0.0,
    ).cost)
    assert float(res.cost) < hover
    # adaptation is live: same key, different trajectory than fixed constants
    assert not np.allclose(np.asarray(res.actions), np.asarray(base.actions))
    # still a pure function of the key
    res2 = adapt(q0[0], qd0[0], goals[0], key)
    assert np.allclose(np.asarray(res.actions), np.asarray(res2.actions))


def test_ift_f_AB_matches_jacfwd():
    """make_ift_f_AB: the implicit-function-theorem dynamics jacobians are
    the SAME values as vmap(jacfwd(dynamics)) through the full step — tight
    in f64 (1e-9 grade; both are exact, differing only in roundoff), loose
    fp tolerance in f32 — including stages where the velocity clamp
    saturates (the clamp mask must match jnp.clip's jvp: saturated rows of
    A/B are zero except dq'/dq = I)."""
    from differentiable_robot_model_tpu.trajopt.rollout import (
        _velocity_bound,
        fd_step_implicit_damping,
    )
    from differentiable_robot_model_tpu.trajopt.solvers import make_ift_f_AB

    struct32 = DifferentiableKUKAiiwa().struct
    ee_dtype_cases = [
        (struct32, jnp.float32, 1e-4),
        (
            jax.tree.map(
                lambda a: a.astype(jnp.float64)
                if jnp.issubdtype(a.dtype, jnp.floating)
                else a,
                struct32,
            ),
            jnp.float64,
            1e-9,
        ),
    ]
    for struct, dtype, tol in ee_dtype_cases:
        D_, dt = struct.n_dofs, 0.02
        vmax = _velocity_bound(struct, 0)

        def dynamics(x, u, struct=struct, vmax=vmax):
            q, qd = x[:D_], x[D_:]
            qdd = fd_step_implicit_damping(struct, q, qd, u, dt)
            qd2 = jnp.clip(qd + dt * qdd, -vmax, vmax)
            return jnp.concatenate([q + dt * qd2, qd2])

        rng = np.random.default_rng(11)
        H = 6
        xs = jnp.asarray(
            np.concatenate(
                [rng.uniform(-0.8, 0.8, (H, D_)),
                 rng.uniform(-0.5, 0.5, (H, D_))], axis=1
            ), dtype)
        us = jnp.asarray(rng.uniform(-20, 20, (H, D_)), dtype)
        # stage 0: a huge torque from rest drives dt*qdd far past the iiwa
        # velocity limit (~1.48 rad/s) so the clamp saturates
        xs = xs.at[0, D_:].set(0.0)
        us = us.at[0].set(1e4)

        A0, B0 = jax.vmap(jax.jacfwd(dynamics, argnums=(0, 1)))(xs, us)
        A1, B1 = make_ift_f_AB(struct, dt, vmax=vmax)(xs, us)
        a_scale = float(jnp.abs(A0).max())
        assert np.allclose(np.asarray(A0), np.asarray(A1),
                           atol=tol * a_scale), dtype
        assert np.allclose(np.asarray(B0), np.asarray(B1), atol=tol), dtype
        # the clamp actually bit somewhere (otherwise the mask went
        # untested): saturated velocity rows have zero jacobian rows, and
        # both engines agree on them (checked above)
        qd2_0 = jax.vmap(dynamics)(xs, us)[0, D_:]
        sat = np.asarray(jnp.abs(qd2_0) >= np.asarray(vmax) - 1e-6)
        assert sat.any()
        zero_rows = np.asarray(jnp.abs(A0[0, D_:, :]).sum(axis=1))[sat]
        assert np.allclose(zero_rows, 0.0)


def test_ilqr_mpc_ift_matches_autodiff_driver():
    """make_ilqr_mpc_step(dynamics_jacobians='ift') — the default — reaches
    the same cost as the 'autodiff' engine (identical linearizations up to
    roundoff; only line-search branch ties may fork, so the gate is on
    solve cost, not bitwise controls)."""
    from differentiable_robot_model_tpu.trajopt.mpc import (
        ILQRMPCConfig,
        ilqr_mpc_init,
        make_ilqr_mpc_step,
    )

    struct = DifferentiableKUKAiiwa().struct
    ee = struct.link_index("iiwa_link_ee")
    goal = jnp.asarray([0.45, 0.15, 0.65], jnp.float32)
    q0 = jnp.zeros((7,), jnp.float32)
    qd0 = jnp.zeros((7,), jnp.float32)

    costs = {}
    for engine in ("ift", "autodiff"):
        cfg = ILQRMPCConfig(
            horizon=8, iters_per_step=4, dynamics_jacobians=engine
        )
        step = jax.jit(make_ilqr_mpc_step(struct, ee, cfg))
        state = ilqr_mpc_init(struct, q0, qd0, cfg)
        for _ in range(2):
            state, metrics = step(state, goal)
        costs[engine] = float(metrics.cost)
        assert np.isfinite(costs[engine])
    assert costs["ift"] <= costs["autodiff"] * 1.05 + 1e-6
