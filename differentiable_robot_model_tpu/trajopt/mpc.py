"""Receding-horizon MPC: warm-started replanning as one jitted step.

No reference analog (the reference stops at open-loop trajectory
optimization, examples/run_kinematic_trajectory_opt.py); this is the
closed-loop layer of the north-star workload (BASELINE.json: iiwa MPC H=50,
B=4096 scenarios, 1 kHz-class replanning budget).

Design: an MPC *step* = (solve with warm start) + (execute first action) +
(shift the plan) — one jitted, vmappable function; a fleet of B scenarios
replans in a single device program and shards over the scenario mesh axis
(parallel/mesh.py).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.structs import RobotStruct
from .rollout import clip_to_limits, kinematic_rollout
from .solvers import solve_kinematic_adam


@dataclasses.dataclass(frozen=True)
class MPCConfig:
    """The framework's (small) config system — SURVEY.md §5 calls for a plain
    dataclass of robot/horizon/batch/solver knobs rather than a config
    framework (the reference's hydra dependency is vestigial)."""

    horizon: int = 50
    iters_per_step: int = 10
    lr: float = 0.05
    goal_weight: float = 100.0
    replan_interval: int = 1  # execute this many actions per replan
    # FK/solve engine for the batched driver, like DynamicMPCConfig's
    # rollout_impl: "auto" picks the kinematic whole-solve kernel on TPU
    # backends (the ENTIRE Adam loop in one launch, ops/pallas/solver.py,
    # with per-robot fallback to the per-iteration FK kernel) and the
    # scalar-XLA path elsewhere; "fused"/"pallas"/"scalar" force a choice
    # (see solvers.solve_kinematic_adam_batch). The per-sample
    # `make_mpc_step` driver ignores this (it runs the unbatched solver).
    fk_impl: str = "auto"


class MPCState(NamedTuple):
    q: jnp.ndarray  # [D] current joint position
    plan: jnp.ndarray  # [H, D] warm-start action sequence
    step_count: jnp.ndarray  # []


class MPCMetrics(NamedTuple):
    """Structured per-step observability (SURVEY.md §5: metrics returned as
    arrays from the jitted solve; no host-side logging in the hot loop)."""

    cost: jnp.ndarray  # [] final solve cost
    cost_initial: jnp.ndarray  # [] cost before this replan's iterations
    goal_distance: jnp.ndarray  # [] current ee distance to goal
    plan_norm: jnp.ndarray  # [] action-plan magnitude


def mpc_init(robot: RobotStruct, q0: jnp.ndarray, config: MPCConfig) -> MPCState:
    plan = jnp.zeros((config.horizon, robot.n_dofs), robot.dtype)
    return MPCState(jnp.asarray(q0, robot.dtype), plan, jnp.zeros((), jnp.int32))


def make_mpc_step(robot: RobotStruct, ee_link_idx: int, config: MPCConfig):
    """Build the jitted MPC step: (state, goal) -> (state', metrics).

    The returned function is pure and vmappable over scenario batches.
    """
    from ..ops import kinematics as K

    def step(state: MPCState, goal: jnp.ndarray):
        result = solve_kinematic_adam(
            robot,
            state.q,
            goal,
            ee_link_idx,
            horizon=config.horizon,
            n_iters=config.iters_per_step,
            lr=config.lr,
            goal_weight=config.goal_weight,
            init_actions=state.plan,
        )
        # Execute the first action(s), shift the plan (zero-padded tail).
        n_exec = config.replan_interval
        q_next = state.q
        for i in range(n_exec):
            q_next = clip_to_limits(robot, q_next + result.actions[i])
        plan_next = jnp.concatenate(
            [result.actions[n_exec:], jnp.zeros((n_exec, robot.n_dofs), robot.dtype)]
        )
        ee = K.fk_link_position(robot, q_next, ee_link_idx)
        metrics = MPCMetrics(
            cost=result.cost,
            cost_initial=result.cost_history[0],
            goal_distance=jnp.linalg.norm(ee - goal),
            plan_norm=jnp.sqrt(jnp.mean(result.actions**2)),
        )
        return MPCState(q_next, plan_next, state.step_count + 1), metrics

    return step


def make_mpc_step_batch(
    robot: RobotStruct,
    ee_link_idx: int,
    config: MPCConfig,
    fk_impl: str | None = None,
    eps: float = 1e-8,
):
    """Throughput twin of `make_mpc_step` for a whole scenario fleet.

    `(states [B], goals [B, 3]) -> (states', metrics)` built on the dof-major
    batched solver (solvers.solve_kinematic_adam_batch): one fused Pallas FK
    call per solver iteration covers all B scenarios x H steps, instead of
    vmapping the per-sample solver. States are the same MPCState pytree with
    a leading batch axis, so `mpc_init` composes with vmap as usual.

    The engine comes from `config.fk_impl` ("auto" rides the kinematic
    whole-solve kernel on TPU); the `fk_impl` parameter, when given,
    overrides the config (kept for per-call engine A/Bs, e.g.
    benchmarks/latency.py).
    """
    from ..ops import kinematics as K
    from .solvers import solve_kinematic_adam_batch

    if fk_impl is None:
        fk_impl = config.fk_impl
    if fk_impl == "auto":
        fk_impl = "fused" if jax.default_backend() == "tpu" else "scalar"

    def step(states: MPCState, goals: jnp.ndarray):
        result = solve_kinematic_adam_batch(
            robot,
            states.q,
            goals,
            ee_link_idx,
            horizon=config.horizon,
            n_iters=config.iters_per_step,
            lr=config.lr,
            goal_weight=config.goal_weight,
            fk_impl=fk_impl,
            eps=eps,
            init_actions=states.plan,
        )
        n_exec = config.replan_interval
        q_next = states.q
        for i in range(n_exec):
            q_next = clip_to_limits(robot, q_next + result.actions[:, i])
        B = result.actions.shape[0]
        plan_next = jnp.concatenate(
            [
                result.actions[:, n_exec:],
                jnp.zeros((B, n_exec, robot.n_dofs), robot.dtype),
            ],
            axis=1,
        )
        ee = K.fk_link_position(robot, q_next, ee_link_idx)
        metrics = MPCMetrics(
            cost=result.cost,
            cost_initial=result.cost_history[0],
            goal_distance=jnp.linalg.norm(ee - goals, axis=-1),
            plan_norm=jnp.sqrt(jnp.mean(result.actions**2, axis=(1, 2))),
        )
        return MPCState(q_next, plan_next, states.step_count + 1), metrics

    return step


@dataclasses.dataclass(frozen=True)
class DynamicMPCConfig:
    """Config for the torque-space (dynamics-in-the-loop) MPC step."""

    horizon: int = 50
    iters_per_step: int = 10
    lr: float = 0.5
    dt: float = 0.02
    goal_weight: float = 10.0
    effort_weight: float = 1e-4
    eps: float = 1e-1  # gradient-scale Adam eps (see solvers.py)
    replan_interval: int = 1
    # Enforce URDF effort limits as a box constraint on planned AND executed
    # torques (see solvers.solve_dynamic_adam's respect_effort_limits).
    respect_effort_limits: bool = False
    # Rollout engine: "auto" picks the whole-solve fused kernel on TPU
    # backends (the ENTIRE Adam loop in one launch, ops/pallas/solver.py;
    # falls back per-robot to the per-iteration rollout kernel) and the
    # lax.scan path elsewhere; "fused"/"pallas"/"scan" force a choice (see
    # solvers.solve_dynamic_adam_batch).
    rollout_impl: str = "auto"


class DynamicMPCState(NamedTuple):
    q: jnp.ndarray  # [D] joint position
    qd: jnp.ndarray  # [D] joint velocity
    plan: jnp.ndarray  # [H, D] warm-start ABSOLUTE torque sequence
    step_count: jnp.ndarray  # []


def dynamic_mpc_init(
    robot: RobotStruct, q0: jnp.ndarray, qd0: jnp.ndarray,
    config: DynamicMPCConfig,
) -> DynamicMPCState:
    """Initial state with the plan at gravity compensation (the solver's
    zero-delta reference), so the very first replan warm-starts from a
    bounded hold-still rollout."""
    from ..ops.dynamics_scalar import rnea_scalar

    q0 = jnp.asarray(q0, robot.dtype)
    qd0 = jnp.asarray(qd0, robot.dtype)
    tau_ref = rnea_scalar(robot, q0, jnp.zeros_like(q0), jnp.zeros_like(q0))
    plan = jnp.tile(tau_ref[None], (config.horizon, 1))
    return DynamicMPCState(q0, qd0, plan, jnp.zeros((), jnp.int32))


def make_dynamic_mpc_step(
    robot: RobotStruct, ee_link_idx: int, config: DynamicMPCConfig
):
    """Closed-loop torque-space MPC step: (state, goal) -> (state', metrics).

    The solve is `solve_dynamic_adam` (full forward dynamics in the loop)
    warm-started from the previous plan (absolute torques — the warm-start
    round-trip the solver guarantees); the executed plant step is the SAME
    integrator the plan uses (semi-implicit Euler, implicit joint damping,
    velocity clamp), so closed-loop state tracks the plan exactly under
    zero disturbance. Pure and vmappable over scenario batches; no
    reference analog (torque-level closed-loop control).

    Compiles the dof-major batched program at B=1 rather than the
    per-sample `solve_dynamic_adam` graph: the two are the same math
    (tested equal in tests/test_mpc_and_utils.py), but the dof-major
    [D, ..., B] layout emits one fused lax.scan program that measures
    ~4x faster per replan on the chip at B=1 (88 ms -> ~20 ms at
    H=20/3 iters; the per-sample graph's per-link scalar graph is
    larger and schedules worse).
    """
    stepB = make_dynamic_mpc_step_batch(robot, ee_link_idx, config)

    def step(state: DynamicMPCState, goal: jnp.ndarray):
        states = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None], state)
        new_states, metricsB = stepB(states, goal[None])
        new_state = jax.tree_util.tree_map(lambda x: x[0], new_states)
        metrics = jax.tree_util.tree_map(lambda x: x[0], metricsB)
        return new_state, metrics

    return step


def _make_dynamic_mpc_step_per_sample(
    robot: RobotStruct, ee_link_idx: int, config: DynamicMPCConfig
):
    """Per-sample dynamic MPC step graph (the vmappable reference form of
    `make_dynamic_mpc_step`; kept for the batch-vs-single equality tests)."""
    from ..ops import kinematics as K
    from .rollout import _velocity_bound, fd_step_implicit_damping
    from .solvers import solve_dynamic_adam

    vmax = _velocity_bound(robot, 0)

    def step(state: DynamicMPCState, goal: jnp.ndarray):
        result = solve_dynamic_adam(
            robot, state.q, state.qd, goal, ee_link_idx,
            horizon=config.horizon, dt=config.dt,
            n_iters=config.iters_per_step, lr=config.lr,
            goal_weight=config.goal_weight,
            effort_weight=config.effort_weight, eps=config.eps,
            init_actions=state.plan,
            respect_effort_limits=config.respect_effort_limits,
        )
        q, qd = state.q, state.qd
        for i in range(config.replan_interval):
            qdd = fd_step_implicit_damping(
                robot, q, qd, result.actions[i], config.dt
            )
            qd = jnp.clip(qd + config.dt * qdd, -vmax, vmax)
            q = q + config.dt * qd
        n_exec = config.replan_interval
        # Shift the plan; hold the final torque over the padded tail.
        plan_next = jnp.concatenate(
            [
                result.actions[n_exec:],
                jnp.tile(result.actions[-1:], (n_exec, 1)),
            ]
        )
        ee = K.fk_link_position(robot, q, ee_link_idx)
        metrics = MPCMetrics(
            cost=result.cost,
            cost_initial=result.cost_history[0],
            goal_distance=jnp.linalg.norm(ee - goal),
            plan_norm=jnp.sqrt(jnp.mean(result.actions**2)),
        )
        return DynamicMPCState(q, qd, plan_next, state.step_count + 1), metrics

    return step


def make_dynamic_mpc_step_batch(
    robot: RobotStruct, ee_link_idx: int, config: DynamicMPCConfig
):
    """Throughput twin of `make_dynamic_mpc_step` for a scenario fleet:
    `(states [B], goals [B, 3]) -> (states', metrics)` on the dof-major
    batched solver (solvers.solve_dynamic_adam_batch). States are the same
    DynamicMPCState pytree with a leading batch axis (`dynamic_mpc_init`
    composes with vmap)."""
    import jax as _jax

    from ..ops import kinematics as K
    from .rollout import _velocity_bound, fd_step_implicit_damping
    from .solvers import solve_dynamic_adam_batch

    vmax = _velocity_bound(robot, 1)  # [D, 1] for the dof-major plant step
    rollout_impl = config.rollout_impl
    if rollout_impl == "auto":
        rollout_impl = "fused" if _jax.default_backend() == "tpu" else "scan"

    def step(states: DynamicMPCState, goals: jnp.ndarray):
        result = solve_dynamic_adam_batch(
            robot, states.q, states.qd, goals, ee_link_idx,
            horizon=config.horizon, dt=config.dt,
            n_iters=config.iters_per_step, lr=config.lr,
            goal_weight=config.goal_weight,
            effort_weight=config.effort_weight, eps=config.eps,
            init_actions=states.plan,
            respect_effort_limits=config.respect_effort_limits,
            rollout_impl=rollout_impl,
        )
        qT, qdT = states.q.T, states.qd.T  # [D, B]
        for i in range(config.replan_interval):
            qddT = fd_step_implicit_damping(
                robot, qT, qdT, result.actions[:, i].T, config.dt
            )
            qdT = jnp.clip(qdT + config.dt * qddT, -vmax, vmax)
            qT = qT + config.dt * qdT
        n_exec = config.replan_interval
        plan_next = jnp.concatenate(
            [
                result.actions[:, n_exec:],
                jnp.tile(result.actions[:, -1:], (1, n_exec, 1)),
            ],
            axis=1,
        )
        q, qd = qT.T, qdT.T
        ee = jax.vmap(lambda x: K.fk_link_position(robot, x, ee_link_idx))(q)
        metrics = MPCMetrics(
            cost=result.cost,
            cost_initial=result.cost_history[0],
            goal_distance=jnp.linalg.norm(ee - goals, axis=-1),
            plan_norm=jnp.sqrt(jnp.mean(result.actions**2, axis=(1, 2))),
        )
        return (
            DynamicMPCState(q, qd, plan_next, states.step_count + 1),
            metrics,
        )

    return step


def make_fleet_dynamic_mpc_step_specialized(
    structs, ee_link_idxs, config: DynamicMPCConfig | list
):
    """Closed-loop heterogeneous-fleet MPC on the FAST path: one step
    function whose single trace replans EVERY member of a static roster —
    R per-member-specialized `make_dynamic_mpc_step_batch` instances (each
    on its own fused rollout kernel on TPU) composed in one program, the
    closed-loop counterpart of `models.fleet.solve_fleet_dynamic_specialized`.

    `(states, goals) -> (states', metrics)` where `states` is a tuple of
    per-member batched `DynamicMPCState` pytrees (shapes [B_r, ...] may
    differ per member) and `goals` a tuple of [B_r, 3]. `config` may be
    one shared `DynamicMPCConfig` or a per-member list (members may run
    different horizons/budgets — impossible in the padded fleet program,
    free here). Composes with `run_closed_loop` (tuples are pytrees), so a
    whole mixed fleet's control loop can run N ticks in one dispatch.
    No reference analog (reference binds one URDF per module instance,
    robot_model.py:87)."""
    configs = (
        config if isinstance(config, (list, tuple))
        else [config] * len(structs)
    )
    assert len(structs) == len(ee_link_idxs) == len(configs)
    steps = [
        make_dynamic_mpc_step_batch(s, e, c)
        for s, e, c in zip(structs, ee_link_idxs, configs)
    ]

    def step(states, goals):
        outs = [fn(st, g) for fn, st, g in zip(steps, states, goals)]
        return tuple(o[0] for o in outs), tuple(o[1] for o in outs)

    return step


def run_closed_loop(
    step_fn, state0, goal, n_steps: int, per_tick_goal: bool = False
):
    """N warm-started MPC ticks as ONE device program: a lax.scan of
    `step_fn` (any of this module's drivers — their signatures are all
    `(state, goal) -> (state', metrics)`).

    This is the on-chip-local deployment shape: the round-3 floor
    decomposition (MPPI_r03.json, LATENCY_r03.json) measured every B=1
    replan pinned at ~2.8 ms by per-call dispatch over the dev tunnel while
    the solver iterations themselves cost ~0.02 ms each — >95% of a tick
    was host-device round trip, not compute. Scanning the ticks on-device
    pays ONE dispatch for the whole window, so per-tick time measures what
    the controller costs when the loop stays device-local (a co-located
    TPU, or sensor fusion on-chip). For a loop that must return to the
    host every tick (remote sensors), the single-step drivers remain the
    honest measurement — benchmarks/latency.py reports both.

    Returns (final_state, stacked metrics [n_steps, ...]). With
    `per_tick_goal=True`, `goal` is a [n_steps, ...] pytree of per-tick
    targets (a moving setpoint; scan slices every leaf's leading axis);
    otherwise one goal is shared by every tick. `goal` may be any pytree
    the step accepts — e.g. the per-member goal tuple of
    `make_fleet_dynamic_mpc_step_specialized`. Jit the result; vmap over
    scenario batches as usual.
    """

    def body(state, g):
        state, metrics = step_fn(state, goal if g is None else g)
        return state, metrics

    xs = goal if per_tick_goal else None
    return jax.lax.scan(body, state0, xs, length=n_steps)


def run_mpc(
    robot: RobotStruct,
    q0: jnp.ndarray,
    goal: jnp.ndarray,
    ee_link_idx: int,
    config: MPCConfig,
    n_steps: int,
):
    """Closed-loop MPC rollout (single scenario): scan of jitted MPC steps.

    Returns (final MPCState, stacked MPCMetrics over steps, q trajectory).
    """
    step = make_mpc_step(robot, ee_link_idx, config)

    def body(state, _):
        state, metrics = step(state, goal)
        return state, (metrics, state.q)

    state0 = mpc_init(robot, q0, config)
    final, (metrics, q_traj) = jax.lax.scan(body, state0, None, length=n_steps)
    return final, metrics, q_traj


# ---------------------------------------------------------------------------
# Closed-loop iLQR (second-order) MPC
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ILQRMPCConfig:
    """Config for the closed-loop second-order (iLQR) torque-space MPC step.

    The solver budget is iLQR iterations (each = one Riccati backward pass +
    parallel line search), not Adam steps — at equal wall-clock a handful of
    iLQR iterations typically reaches lower cost than the first-order driver
    (measured in BENCH/benchmarks/latency.py; the round-2 verdict's
    cost-at-equal-budget question)."""

    horizon: int = 20
    iters_per_step: int = 5
    dt: float = 0.02
    goal_weight: float = 10.0
    effort_weight: float = 1e-4
    reg: float = 1e-6
    replan_interval: int = 1
    respect_effort_limits: bool = False
    riccati: str = "sequential"  # or "parallel" (see solvers.ilqr)
    # Stage-derivative engine:
    # - "gauss_newton" (default): analytic cost derivatives — the stage cost
    #   is quadratic in (ee-position, torque), so lx/lxx come from the
    #   geometric Jacobian (ops/kinematics.link_jacobian) with the standard
    #   Gauss-Newton curvature 2w J^T J (drops the FK second-derivative
    #   term; PSD by construction, which also starves the LM lambda less
    #   than the occasionally-indefinite exact Hessian). Dynamics jacobians
    #   still via one forward-mode pass.
    # - "exact": solvers.ilqr's generic autodiff linearization (full cost
    #   Hessian through FK).
    linearization: str = "gauss_newton"
    # Dynamics-jacobian engine for the gauss_newton linearization:
    # - "ift" (default): analytic implicit-function-theorem jacobians
    #   (solvers.make_ift_f_AB) — the FD solve defines qdd implicitly, so
    #   A/B cost one primal step + 2D forward tangents through a single
    #   RNEA (no tangents through the mass matrix or the solve) + cheap
    #   back-substitutions. Same values as autodiff to roundoff
    #   (tests/test_trajopt.py::test_ift_f_AB_matches_jacfwd).
    # - "autodiff": vmap(jacfwd(dynamics)) through the full step.
    dynamics_jacobians: str = "ift"


class ILQRMPCState(NamedTuple):
    q: jnp.ndarray  # [D]
    qd: jnp.ndarray  # [D]
    plan: jnp.ndarray  # [H, D] warm-start ABSOLUTE torque sequence
    step_count: jnp.ndarray  # []


def ilqr_mpc_init(
    robot: RobotStruct, q0: jnp.ndarray, qd0: jnp.ndarray,
    config: ILQRMPCConfig,
) -> ILQRMPCState:
    """Initial state: plan at gravity compensation (hold-still warm start),
    same convention as `dynamic_mpc_init`."""
    from ..ops.dynamics_scalar import rnea_scalar

    q0 = jnp.asarray(q0, robot.dtype)
    qd0 = jnp.asarray(qd0, robot.dtype)
    tau_ref = rnea_scalar(robot, q0, jnp.zeros_like(q0), jnp.zeros_like(q0))
    plan = jnp.tile(tau_ref[None], (config.horizon, 1))
    return ILQRMPCState(q0, qd0, plan, jnp.zeros((), jnp.int32))


def make_ilqr_mpc_step(
    robot: RobotStruct, ee_link_idx: int, config: ILQRMPCConfig
):
    """Closed-loop iLQR step: (state, goal) -> (state', metrics).

    The second-order member of the driver family (Adam `make_dynamic_mpc_step`,
    MPPI `make_mppi_mpc_step`): per control tick, `solvers.ilqr` replans on
    the torque-space plant — state x = [q; qd], control u = absolute applied
    torque, dynamics = the SAME semi-implicit Euler integrator with implicit
    joint damping and URDF velocity clamp the other drivers' plants use
    (`fd_step_implicit_damping`) — warm-started from the shifted previous
    plan, then the plant executes `replan_interval` steps of that integrator.

    Cost matches the Adam driver's (solve_dynamic_adam): goal term
    goal_weight^2/(3H) |p_ee(q_k) - goal|^2 on every state after the first
    step plus the same terminal term, and effort_weight/(HD) |u - tau_ref|^2
    on torque deltas around gravity compensation at the tick's start state —
    so iLQR / Adam / MPPI cost histories are directly comparable on the same
    problem. `respect_effort_limits=True` imposes the URDF effort box via
    control-limited iLQR (forward-pass projection; see solvers.ilqr).

    Pure and vmappable over scenario batches. This is the second-order
    completion of the reference's first-order trajectory optimization
    (reference: examples/run_kinematic_trajectory_opt.py:88-99).
    """
    from ..ops import kinematics as K
    from ..ops.dynamics_scalar import rnea_scalar
    from .rollout import _velocity_bound, fd_step_implicit_damping
    from .solvers import ilqr

    D = robot.n_dofs
    H = config.horizon
    vmax = _velocity_bound(robot, 0)
    if config.respect_effort_limits:
        e = jnp.where(robot.limit_effort > 0, robot.limit_effort, jnp.inf)
        control_bounds = (-e, e)
    else:
        control_bounds = None

    def dynamics(x, u):
        q, qd = x[:D], x[D:]
        qdd = fd_step_implicit_damping(robot, q, qd, u, config.dt)
        qd2 = jnp.clip(qd + config.dt * qdd, -vmax, vmax)
        return jnp.concatenate([q + config.dt * qd2, qd2])

    gw = config.goal_weight**2 / (3.0 * H)
    ew = config.effort_weight / (H * D)

    def step(state: ILQRMPCState, goal: jnp.ndarray):
        zeros = jnp.zeros_like(state.q)
        tau_ref = rnea_scalar(robot, state.q, zeros, zeros)

        def goal_term(x):
            p = K.fk_link_position(robot, x[None, :D], ee_link_idx)[0]
            return gw * jnp.sum((p - goal) ** 2)

        def cost(x, u):
            # x_0's goal term is a constant w.r.t. the controls; including it
            # keeps the stage cost uniform (total differs from the Adam
            # cost only by that constant).
            return goal_term(x) + ew * jnp.sum((u - tau_ref) ** 2)

        linearize = None
        if config.linearization == "gauss_newton":
            from .solvers import make_gn_reach_linearize, make_ift_f_AB

            f_AB = (
                make_ift_f_AB(robot, config.dt, vmax=vmax)
                if config.dynamics_jacobians == "ift"
                else None
            )
            linearize = make_gn_reach_linearize(
                robot, ee_link_idx, dynamics, goal,
                stage_goal_w=gw, effort_w=ew, u_ref=tau_ref, f_AB=f_AB,
            )

        x0 = jnp.concatenate([state.q, state.qd])
        result = ilqr(
            dynamics, cost, goal_term, x0, state.plan,
            n_iters=config.iters_per_step, reg=config.reg,
            riccati=config.riccati, control_bounds=control_bounds,
            linearize=linearize,
        )
        q, qd = state.q, state.qd
        for i in range(config.replan_interval):
            x_next = dynamics(jnp.concatenate([q, qd]), result.us[i])
            q, qd = x_next[:D], x_next[D:]
        n_exec = config.replan_interval
        plan_next = jnp.concatenate(
            [result.us[n_exec:], jnp.tile(result.us[-1:], (n_exec, 1))]
        )
        ee = K.fk_link_position(robot, q, ee_link_idx)
        metrics = MPCMetrics(
            cost=result.cost,
            cost_initial=result.cost_history[0],
            goal_distance=jnp.linalg.norm(ee - goal),
            plan_norm=jnp.sqrt(jnp.mean(result.us**2)),
        )
        return ILQRMPCState(q, qd, plan_next, state.step_count + 1), metrics

    return step


# ---------------------------------------------------------------------------
# Closed-loop MPPI (sampling-based) MPC
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MPPIMPCConfig:
    """Config for the closed-loop sampling-based (MPPI) MPC step."""

    horizon: int = 30
    iters_per_step: int = 5
    n_samples: int = 128
    temperature: float = 0.01
    noise_sigma: float = 5.0  # rad/s^2 (acceleration-unit sampling)
    dt: float = 0.02
    goal_weight: float = 10.0
    effort_weight: float = 1e-4
    replan_interval: int = 1
    respect_effort_limits: bool = False
    # Rollout engine, like DynamicMPCConfig: "auto" = on TPU, the
    # per-iteration EE-fused rollout kernel in the per-sample driver
    # (make_mppi_mpc_step) and the whole-solve MPPI kernel in the batch
    # driver (make_mppi_mpc_step_batch — the ENTIRE sampling loop in one
    # launch, 3.2-6.8x at fleet shapes, MPPI_r05.json); scan off-TPU.
    rollout_impl: str = "auto"
    # Per-dof noise-scale + softmax-temperature adaptation
    # (solvers.solve_dynamic_mppi adapt_sigma/adapt_temperature).
    adapt_sigma: bool = False
    adapt_temperature: bool = False


class MPPIMPCState(NamedTuple):
    q: jnp.ndarray  # [D]
    qd: jnp.ndarray  # [D]
    plan: jnp.ndarray  # [H, D] warm-start ABSOLUTE torque sequence
    key: jnp.ndarray  # PRNG key threaded through replans
    step_count: jnp.ndarray  # []


def mppi_mpc_init(
    robot: RobotStruct, q0: jnp.ndarray, qd0: jnp.ndarray,
    config: MPPIMPCConfig, key,
) -> MPPIMPCState:
    """Initial state: plan at gravity compensation, PRNG key owned by the
    state so the whole closed loop stays a pure function."""
    from ..ops.dynamics_scalar import rnea_scalar

    q0 = jnp.asarray(q0, robot.dtype)
    qd0 = jnp.asarray(qd0, robot.dtype)
    tau_ref = rnea_scalar(robot, q0, jnp.zeros_like(q0), jnp.zeros_like(q0))
    plan = jnp.tile(tau_ref[None], (config.horizon, 1))
    return MPPIMPCState(q0, qd0, plan, key, jnp.zeros((), jnp.int32))


def make_mppi_mpc_step(
    robot: RobotStruct, ee_link_idx: int, config: MPPIMPCConfig
):
    """Closed-loop MPPI step: (state, goal) -> (state', metrics).

    The sampling twin of `make_dynamic_mpc_step`: per control tick,
    `solve_dynamic_mppi` replans from the warm-started previous plan
    (shifted absolute torques), then the plant executes
    `replan_interval` steps of the SAME integrator the samples used.
    Derivative-free, so the closed loop tolerates cost terms the gradient
    driver cannot (discontinuous penalties, contact-like terms). Pure and
    vmappable (thread per-scenario keys via the state).
    """
    from ..ops import kinematics as K
    from .rollout import _velocity_bound, fd_step_implicit_damping
    from .solvers import solve_dynamic_mppi

    vmax = _velocity_bound(robot, 0)
    rollout_impl = config.rollout_impl
    if rollout_impl == "auto":
        rollout_impl = "pallas" if jax.default_backend() == "tpu" else "scan"

    def step(state: MPPIMPCState, goal: jnp.ndarray):
        key_next, key_solve = jax.random.split(state.key)
        result = solve_dynamic_mppi(
            robot, state.q, state.qd, goal, ee_link_idx,
            horizon=config.horizon, key=key_solve,
            n_samples=config.n_samples, n_iters=config.iters_per_step,
            dt=config.dt, temperature=config.temperature,
            noise_sigma=config.noise_sigma,
            goal_weight=config.goal_weight,
            effort_weight=config.effort_weight,
            respect_effort_limits=config.respect_effort_limits,
            init_actions=state.plan,
            rollout_impl=rollout_impl,
            adapt_sigma=config.adapt_sigma,
            adapt_temperature=config.adapt_temperature,
        )
        q, qd = state.q, state.qd
        for i in range(config.replan_interval):
            qdd = fd_step_implicit_damping(
                robot, q, qd, result.actions[i], config.dt
            )
            qd = jnp.clip(qd + config.dt * qdd, -vmax, vmax)
            q = q + config.dt * qd
        n_exec = config.replan_interval
        plan_next = jnp.concatenate(
            [
                result.actions[n_exec:],
                jnp.tile(result.actions[-1:], (n_exec, 1)),
            ]
        )
        ee = K.fk_link_position(robot, q, ee_link_idx)
        metrics = MPCMetrics(
            cost=result.cost,
            cost_initial=result.cost_history[0],
            goal_distance=jnp.linalg.norm(ee - goal),
            plan_norm=jnp.sqrt(jnp.mean(result.actions**2)),
        )
        return (
            MPPIMPCState(q, qd, plan_next, key_next, state.step_count + 1),
            metrics,
        )

    return step


def make_mppi_mpc_step_batch(
    robot: RobotStruct, ee_link_idx: int, config: MPPIMPCConfig
):
    """Throughput twin of `make_mppi_mpc_step` for a scenario fleet:
    `(states [B], goals [B, 3]) -> (states', metrics)` on the batched
    sampling solver (solvers.solve_dynamic_mppi_batch). States are the same
    MPPIMPCState pytree with a leading batch axis (vmapped `mppi_mpc_init`
    composes as usual).

    `config.rollout_impl="auto"` resolves to the whole-solve MPPI kernel
    on TPU — the ENTIRE sampling loop (on-core PRNG noise, all K sample
    rollouts, softmax weighting, nominal updates) in ONE kernel launch per
    replan, measured 3.2-6.8x the vmapped per-iteration engine at fleet
    shapes (MPPI_r05.json) — and to the scan path elsewhere. The batched
    solver derives every scenario's noise stream from ONE key; this driver
    advances all per-scenario keys each tick (determinism is preserved)
    but feeds scenario 0's stream to the solve.
    """
    from ..ops import kinematics as K
    from .rollout import _velocity_bound, fd_step_implicit_damping
    from .solvers import solve_dynamic_mppi_batch

    vmax = _velocity_bound(robot, 1)  # [D, 1] for the dof-major plant step
    rollout_impl = config.rollout_impl
    if rollout_impl == "auto":
        rollout_impl = "fused" if jax.default_backend() == "tpu" else "scan"
    if config.adapt_sigma or config.adapt_temperature:
        # adaptation is outside the whole-solve kernel's contract; the
        # batch solver would fall back anyway — resolve explicitly so the
        # trace never builds the declined branch
        if rollout_impl == "fused":
            rollout_impl = "pallas" if jax.default_backend() == "tpu" else "scan"

    def step(states: MPPIMPCState, goals: jnp.ndarray):
        keys = jax.vmap(jax.random.split)(states.key)  # [B, 2, ...]
        key_next, key_solve = keys[:, 0], keys[:, 1]
        result = solve_dynamic_mppi_batch(
            robot, states.q, states.qd, goals, ee_link_idx,
            horizon=config.horizon, key=key_solve[0],
            n_samples=config.n_samples, n_iters=config.iters_per_step,
            dt=config.dt, temperature=config.temperature,
            noise_sigma=config.noise_sigma,
            goal_weight=config.goal_weight,
            effort_weight=config.effort_weight,
            respect_effort_limits=config.respect_effort_limits,
            init_actions=states.plan,
            rollout_impl=rollout_impl,
            adapt_sigma=config.adapt_sigma,
            adapt_temperature=config.adapt_temperature,
        )
        qT, qdT = states.q.T, states.qd.T  # [D, B]
        for i in range(config.replan_interval):
            qddT = fd_step_implicit_damping(
                robot, qT, qdT, result.actions[:, i].T, config.dt
            )
            qdT = jnp.clip(qdT + config.dt * qddT, -vmax, vmax)
            qT = qT + config.dt * qdT
        n_exec = config.replan_interval
        plan_next = jnp.concatenate(
            [
                result.actions[:, n_exec:],
                jnp.tile(result.actions[:, -1:], (1, n_exec, 1)),
            ],
            axis=1,
        )
        q, qd = qT.T, qdT.T
        ee = jax.vmap(lambda x: K.fk_link_position(robot, x, ee_link_idx))(q)
        metrics = MPCMetrics(
            cost=result.cost,
            cost_initial=result.cost_history[:, 0],
            goal_distance=jnp.linalg.norm(ee - goals, axis=-1),
            plan_norm=jnp.sqrt(jnp.mean(result.actions**2, axis=(1, 2))),
        )
        return (
            MPPIMPCState(q, qd, plan_next, key_next, states.step_count + 1),
            metrics,
        )

    return step
