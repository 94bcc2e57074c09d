"""Heterogeneous robot fleets: ONE jitted program serves ANY robot.

SURVEY.md §7 "hard parts": pad links/DoFs to a fleet max with masks so one
program serves 2-link...29-link trees without recompiles. The key design
move: topology becomes *data* (traced arrays), not trace-time structure —

- the kinematic tree is a padded parent-index ARRAY; FK composes local
  transforms with `ceil(log2(Lmax))` pointer-jumping rounds of traced
  gathers + batched matmuls (vs. the static-topology unrolled composition
  in ops/kinematics.py);
- all dynamics reuse the world-frame masked-matmul formulations
  (ops/dynamics.py:rnea_given_fk / mass_matrix_given_fk), which only touch
  topology through the anc_mask / dof_select array leaves;
- padded links are massless fixed joints parented to the root: they
  contribute zero force, zero velocity, zero Jacobian columns; padded dofs
  get identity rows in the mass matrix so the FD solve stays nonsingular.

A fleet of R different robots is a pytree of [R, Lmax, ...] stacked leaves;
`vmap` over the leading axis batches across *different robots* in one
program, and scenario batches shard over the device mesh exactly like
single-robot batches (parallel/mesh.py). No reference analog (the reference
builds a Python object tree per robot; every robot is a different program).
"""

from __future__ import annotations

import math
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import dynamics as D
from ..ops.kinematics import joint_local_transforms
from .structs import RobotStruct


class FleetRobot(NamedTuple):
    """One padded robot, all-array (safe to vmap/stack/shard).

    Field names match RobotStruct's leaves so the world-frame dynamics
    formulations accept either type (duck-typed `robot` argument).
    """

    trans: jnp.ndarray  # [Lmax, 3]
    rot_angles: jnp.ndarray  # [Lmax, 3]
    axis: jnp.ndarray  # [Lmax, 3]
    mass: jnp.ndarray  # [Lmax]
    com: jnp.ndarray  # [Lmax, 3]
    inertia_com: jnp.ndarray  # [Lmax, 3, 3]
    damping: jnp.ndarray  # [Dmax]
    limit_lower: jnp.ndarray  # [Dmax]
    limit_upper: jnp.ndarray  # [Dmax]
    limit_velocity: jnp.ndarray  # [Dmax] (<=0 means unbounded)
    limit_effort: jnp.ndarray  # [Dmax] (<=0 means unbounded)
    anc_mask: jnp.ndarray  # [Lmax, Lmax]
    dof_select: jnp.ndarray  # [Lmax, Dmax]
    rev_mask: jnp.ndarray  # [Lmax]
    prism_mask: jnp.ndarray  # [Lmax]
    parent_idx: jnp.ndarray  # [Lmax] int32 (data, not structure!)
    dof_valid: jnp.ndarray  # [Dmax] 1 for real dofs
    ee_onehot: jnp.ndarray  # [Lmax] selects this robot's end-effector

    @property
    def dtype(self):
        return self.trans.dtype


def pad_robot(
    struct: RobotStruct, ee_link: str, max_links: int, max_dofs: int, dtype=None
) -> FleetRobot:
    """Pad one robot to fleet dimensions. Padded links: massless fixed
    joints parented to root (identity local transform)."""
    dtype = dtype or struct.dtype
    L, Dn = struct.n_links, struct.n_dofs
    assert L <= max_links and Dn <= max_dofs

    def pad(x, target_shape):
        x = np.asarray(x, np.float64)
        pads = [(0, t - s) for s, t in zip(x.shape, target_shape)]
        return jnp.asarray(np.pad(x, pads), dtype)

    parent = np.zeros(max_links, np.int32)
    parent[:L] = np.asarray(struct.parent, np.int32)
    ee = np.zeros(max_links)
    ee[struct.link_index(ee_link)] = 1.0
    dof_valid = np.zeros(max_dofs)
    dof_valid[:Dn] = 1.0

    return FleetRobot(
        trans=pad(struct.trans, (max_links, 3)),
        rot_angles=pad(struct.rot_angles, (max_links, 3)),
        axis=pad(struct.axis, (max_links, 3)),
        mass=pad(struct.mass, (max_links,)),
        com=pad(struct.com, (max_links, 3)),
        inertia_com=pad(struct.inertia_com, (max_links, 3, 3)),
        damping=pad(struct.damping, (max_dofs,)),
        limit_lower=pad(struct.limit_lower, (max_dofs,)),
        limit_upper=pad(struct.limit_upper, (max_dofs,)),
        limit_velocity=pad(struct.limit_velocity, (max_dofs,)),
        limit_effort=pad(struct.limit_effort, (max_dofs,)),
        anc_mask=pad(struct.anc_mask, (max_links, max_links)),
        dof_select=pad(struct.dof_select, (max_links, max_dofs)),
        rev_mask=pad(struct.rev_mask, (max_links,)),
        prism_mask=pad(struct.prism_mask, (max_links,)),
        parent_idx=jnp.asarray(parent),
        dof_valid=jnp.asarray(dof_valid, dtype),
        ee_onehot=jnp.asarray(ee, dtype),
    )


def build_fleet(
    robots: List[RobotStruct], ee_links: List[str], dtype=jnp.float32
) -> FleetRobot:
    """Stack R padded robots into a [R, ...] fleet pytree (vmap axis 0)."""
    max_links = max(s.n_links for s in robots)
    max_dofs = max(s.n_dofs for s in robots)
    padded = [
        pad_robot(s, ee, max_links, max_dofs, dtype) for s, ee in zip(robots, ee_links)
    ]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *padded)


# ---------------------------------------------------------------------------
# Data-driven kinematics (topology = traced parent-index array)
# ---------------------------------------------------------------------------


def fk_world_fleet(robot: FleetRobot, q: jnp.ndarray):
    """All-link world poses with pointer jumping over the traced parent array.

    ceil(log2(Lmax)) rounds always suffice (padded links sit at depth 1);
    rounds beyond a robot's true depth are idempotent (root self-loop with
    identity local transform).
    """
    L = robot.parent_idx.shape[0]
    n_rounds = max(1, math.ceil(math.log2(L)))
    R, t = joint_local_transforms(robot, q)
    pi = robot.parent_idx
    for _ in range(n_rounds):
        Rp = jnp.take(R, pi, axis=0)
        tp = jnp.take(t, pi, axis=0)
        t = jnp.einsum("lij,lj->li", Rp, t) + tp
        R = Rp @ R
        pi = jnp.take(pi, pi, axis=0)
    return R, t


def ee_position_fleet(robot: FleetRobot, q: jnp.ndarray) -> jnp.ndarray:
    _, p = fk_world_fleet(robot, q)
    return robot.ee_onehot @ p


def ee_trajectory_fleet(
    robot: FleetRobot, q_traj: jnp.ndarray, remat_chunk: int = 8
) -> jnp.ndarray:
    """EE positions for a whole trajectory q_traj [H, Dmax] -> [H, 3], with
    the H axis processed in rematerialized chunks.

    A single vmapped `ee_position_fleet` over H is fine forward, but its
    backward residuals are every pointer-jumping round's [*, Lmax, 3, 3]
    world rotations for ALL H steps at once — at the flagship shape
    (H=50, B=512 scenarios, fleet axis on top) that is what OOM'd the
    padded program at H=50 in round 4 (BASELINE.md). Chunking H through
    `lax.map` with `jax.checkpoint` on the chunk body stores only the
    chunk inputs and replays the FK per chunk in the backward, bounding
    the residual peak at chunk/H of the old one for a ~(H/chunk)-deep
    sequential loop — the identification-capable padded form now survives
    the flagship horizon (the specialized fast path is untouched).
    `remat_chunk=None` (or >= H) restores the all-at-once layout.
    """
    H = q_traj.shape[0]
    if remat_chunk is None or remat_chunk >= H:
        return jax.vmap(lambda qq: ee_position_fleet(robot, qq))(q_traj)
    chunk = remat_chunk
    pad = (-H) % chunk
    qp = jnp.pad(q_traj, ((0, pad), (0, 0)))
    qc = qp.reshape((H + pad) // chunk, chunk, q_traj.shape[1])
    body = jax.checkpoint(
        lambda qs: jax.vmap(lambda qq: ee_position_fleet(robot, qq))(qs)
    )
    ee = jax.lax.map(body, qc)
    return ee.reshape(-1, 3)[:H]


def ee_jacobian_fleet(robot: FleetRobot, q: jnp.ndarray):
    """Geometric Jacobian of the fleet end-effector: (lin, ang) [3, Dmax]."""
    from ..ops.kinematics import world_joint_subspaces

    R, p = fk_world_fleet(robot, q)
    S = world_joint_subspaces(robot, R, p)
    p_e = robot.ee_onehot @ p
    mask = robot.ee_onehot @ robot.anc_mask  # [Lmax] ancestors of ee
    j_ang = S[:, :3] * mask[:, None]
    j_lin = (S[:, 3:] + jnp.cross(S[:, :3], jnp.broadcast_to(p_e, S[:, :3].shape))) * mask[:, None]
    return (robot.dof_select.T @ j_lin).T, (robot.dof_select.T @ j_ang).T


# ---------------------------------------------------------------------------
# Data-driven dynamics (shared world-frame formulations)
# ---------------------------------------------------------------------------


def rnea_fleet(
    robot: FleetRobot,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    qdd: jnp.ndarray,
    include_gravity: bool = True,
    use_damping: bool = True,
) -> jnp.ndarray:
    R, p = fk_world_fleet(robot, q)
    tau = D.rnea_given_fk(robot, R, p, q, qd, qdd, include_gravity, use_damping)
    return tau * robot.dof_valid


def mass_matrix_fleet(robot: FleetRobot, q: jnp.ndarray) -> jnp.ndarray:
    """Padded dofs get identity rows/cols so the matrix stays SPD."""
    R, p = fk_world_fleet(robot, q)
    H = D.mass_matrix_given_fk(robot, R, p)
    valid = robot.dof_valid
    H = H * valid[:, None] * valid[None, :]
    return H + jnp.diag(1.0 - valid)


class FleetTrajOptResult(NamedTuple):
    actions: jnp.ndarray  # [R, ..., H, Dmax] optimized action sequences
    cost: jnp.ndarray  # [R, ...] final costs
    cost_history: jnp.ndarray  # [R, ..., iters]


def kinematic_rollout_fleet(robot: FleetRobot, q0: jnp.ndarray, actions: jnp.ndarray):
    """Clamp-affine rollout + fleet FK for ONE padded robot (vmap over the
    fleet axis to serve R different robots in one program).

    q0: [Dmax], actions: [H, Dmax]. Padded dofs have limits [0, 0], so the
    clamp pins them to zero and their action entries get exact zero
    subgradients — no masking needed. Same indexing as
    trajopt/rollout.py:kinematic_rollout.
    """
    from ..trajopt.rollout import clamp_affine_q_traj

    q_start = jnp.clip(q0, robot.limit_lower, robot.limit_upper)
    q_traj = clamp_affine_q_traj(
        q_start, actions[:-1], robot.limit_lower, robot.limit_upper
    )  # [H, Dmax]
    ee_traj = ee_trajectory_fleet(robot, q_traj)
    return ee_traj, q_traj


def solve_fleet_kinematic_adam(
    fleet: FleetRobot,  # [R, ...] stacked fleet pytree
    q0: jnp.ndarray,  # [R, Dmax] (or [R, B, Dmax] scenario-batched)
    goal_ee_pos: jnp.ndarray,  # [R, 3] (or [R, B, 3])
    horizon: int,
    n_iters: int = 100,
    lr: float = 1e-2,
    goal_weight: float = 100.0,
    eps: float = 1e-8,
) -> FleetTrajOptResult:
    """Heterogeneous-fleet MPC: R DIFFERENT robots (and optionally B
    scenarios each) solved in ONE jitted program.

    The reference compiles a different Python object tree per robot; here
    topology is data, so a 2-link, an iiwa, a panda and a trifinger solve
    side by side under a single `vmap` over the fleet axis (SURVEY.md §7
    config 4/5). Fully differentiable w.r.t. any fleet leaf — system
    identification THROUGH the fleet solve works by `jax.grad` on (e.g.)
    `fleet.trans` (tests/test_fleet.py).
    """
    import optax

    def solve_one(robot, q0_r, goal_r):
        D_ = q0_r.shape[-1]
        actions0 = jnp.zeros((horizon, D_), q0_r.dtype) + 0.0 * q0_r

        def cost_fn(actions):
            ee_traj, _ = kinematic_rollout_fleet(robot, q0_r, actions)
            err = goal_weight * (ee_traj - goal_r)
            return jnp.mean(err * err)

        opt = optax.adam(lr, eps=eps, eps_root=1e-8)

        def iteration(carry, _):
            actions, opt_state = carry
            cost, grads = jax.value_and_grad(cost_fn)(actions)
            updates, opt_state = opt.update(grads, opt_state)
            actions = optax.apply_updates(actions, updates)
            return (actions, opt_state), cost

        (actions, _), costs = jax.lax.scan(
            iteration, (actions0, opt.init(actions0)), None, length=n_iters
        )
        _, final_cost = jax.lax.scan(
            lambda c, _: (c, cost_fn(c)), actions, None, length=1
        )
        return FleetTrajOptResult(actions, final_cost[0], costs)

    if q0.ndim == 3:  # [R, B, Dmax]: scenario batch inside each robot
        solve_one = jax.vmap(solve_one, in_axes=(None, 0, 0))
    return jax.vmap(solve_one)(fleet, q0, goal_ee_pos)


def forward_dynamics_fleet(
    robot: FleetRobot,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    f: jnp.ndarray,
    include_gravity: bool = True,
    use_damping: bool = False,
) -> jnp.ndarray:
    nle = rnea_fleet(robot, q, qd, jnp.zeros_like(q), include_gravity, use_damping)
    H = mass_matrix_fleet(robot, q)
    rhs = ((f - nle) * robot.dof_valid)[..., None]
    return D.jax_sym_solve(H, rhs)[..., 0] * robot.dof_valid


def fd_step_implicit_damping_fleet(
    robot: FleetRobot,
    q: jnp.ndarray,  # [Dmax]
    qd: jnp.ndarray,
    tau: jnp.ndarray,
    dt: float,
    include_gravity: bool = True,
    use_damping: bool = True,
) -> jnp.ndarray:
    """Fleet twin of `trajopt.rollout.fd_step_implicit_damping`: forward
    dynamics with the viscous damping force evaluated at qd_{k+1}, i.e.
    (H + dt diag(d)) qdd = tau - nle(q, qd) — unconditionally stable in the
    damping term (see the single-robot docstring for the derivation).
    Padded dofs keep their identity mass-matrix rows and zero torque, so
    qdd is exactly zero there."""
    nle = rnea_fleet(robot, q, qd, jnp.zeros_like(q), include_gravity, use_damping)
    H = mass_matrix_fleet(robot, q)
    if use_damping:
        H = H + dt * jnp.diag(robot.damping * robot.dof_valid)
    rhs = ((tau - nle) * robot.dof_valid)[..., None]
    return D.jax_sym_solve(H, rhs)[..., 0] * robot.dof_valid


def dynamic_rollout_fleet(
    robot: FleetRobot,
    q0: jnp.ndarray,  # [Dmax]
    qd0: jnp.ndarray,  # [Dmax]
    taus: jnp.ndarray,  # [H, Dmax] absolute applied torques
    dt: float,
    use_damping: bool = True,
    respect_effort_limits: bool = False,
    remat: bool = True,
):
    """Semi-implicit Euler rollout through the fleet forward dynamics for
    ONE padded robot (vmap over the fleet axis serves R robots at once).

    Same integrator semantics as the single-robot dof-major rollout
    (trajopt/rollout.dynamic_rollout_dof_major): implicit joint damping,
    per-dof velocity clamp to the URDF limits (<=0 means unbounded), and —
    with `respect_effort_limits=True` — the actuator effort box on every
    applied torque. Returns (qs, qds), each [H, Dmax] (state AFTER each
    step).

    `remat=True` (default) checkpoints each integration step: the fleet
    FK/dynamics carry [..., 3, 3]-trailing intermediates whose TPU tile
    padding is ~57x, so saving them across the whole horizon for the
    backward pass overflows HBM at production shapes (measured: 28 GB
    demanded for a 310 MB-unpadded residual set at R=4, B=512, H=20 —
    benchmarks/fleet.py). Recomputing the step in the backward trades
    ~2x rollout FLOPs for O(carry) memory."""
    vmax = jnp.where(robot.limit_velocity > 0, robot.limit_velocity, jnp.inf)
    emax = jnp.where(robot.limit_effort > 0, robot.limit_effort, jnp.inf)

    def step_math(q, qd, tau_t):
        if respect_effort_limits:
            tau_t = jnp.clip(tau_t, -emax, emax)
        qdd = fd_step_implicit_damping_fleet(
            robot, q, qd, tau_t, dt, use_damping=use_damping
        )
        qd_next = jnp.clip(qd + dt * qdd, -vmax, vmax)
        q_next = q + dt * qd_next
        return q_next, qd_next

    if remat:
        step_math = jax.checkpoint(step_math)

    def step(carry, tau_t):
        q_next, qd_next = step_math(carry[0], carry[1], tau_t)
        return (q_next, qd_next), (q_next, qd_next)

    _, (qs, qds) = jax.lax.scan(step, (q0, qd0), taus)
    return qs, qds


def solve_fleet_dynamic_adam(
    fleet: FleetRobot,  # [R, ...] stacked fleet pytree
    q0: jnp.ndarray,  # [R, Dmax] (or [R, B, Dmax] scenario-batched)
    qd0: jnp.ndarray,  # same shape as q0
    goal_ee_pos: jnp.ndarray,  # [R, 3] (or [R, B, 3])
    horizon: int,
    dt: float = 0.02,
    n_iters: int = 10,
    lr: float = 0.5,
    goal_weight: float = 10.0,
    effort_weight: float = 1e-4,
    eps: float = 1e-1,
    use_damping: bool = True,
    precondition: bool = True,
    respect_effort_limits: bool = False,
    init_actions: jnp.ndarray | None = None,  # [R, (B,) H, Dmax] abs torques
) -> FleetTrajOptResult:
    """Heterogeneous-fleet TORQUE-SPACE MPC: R different robots, full
    forward dynamics in the loop, ONE jitted program.

    The dynamics-level counterpart of `solve_fleet_kinematic_adam` and the
    fleet-level counterpart of `trajopt.solvers.solve_dynamic_adam` (same
    algorithm: Adam on computed-torque-preconditioned deltas around the
    gravity-compensation reference, semi-implicit rollout with implicit
    damping and velocity clamps — see that docstring for the
    preconditioning rationale). Topology is data, so a 2-link, an iiwa and
    a trifinger plan torques side by side under one `vmap`, and the whole
    solve stays differentiable w.r.t. any fleet leaf (identification
    through the dynamic fleet solve). Returned actions are absolute
    applied torques [R, (B,) H, Dmax]; padded dofs carry exact zeros.
    No reference analog at any level (SURVEY.md §7 configs 4/5).
    """
    import optax

    def solve_one(robot, q0_r, qd0_r, goal_r, init_r):
        Dmax = q0_r.shape[-1]
        zeros = jnp.zeros_like(q0_r)
        tau_ref = rnea_fleet(robot, q0_r, zeros, zeros)  # gravity comp
        H0 = mass_matrix_fleet(robot, q0_r) if precondition else None
        emax = jnp.where(robot.limit_effort > 0, robot.limit_effort, jnp.inf)

        def to_torque_deltas(a):  # [H, Dmax]
            if H0 is None:
                return a * robot.dof_valid
            return (
                jnp.einsum(
                    "de,he->hd", H0, a, precision=jax.lax.Precision.HIGHEST
                )
                * robot.dof_valid
            )

        def to_applied_torques(a):
            taus = tau_ref + to_torque_deltas(a)
            if respect_effort_limits:
                taus = jnp.clip(taus, -emax, emax)
            return taus * robot.dof_valid

        if init_r is not None:
            dtau0 = init_r - tau_ref  # [H, Dmax]
            if H0 is None:
                actions0 = dtau0 * robot.dof_valid
            else:
                actions0 = (
                    D.jax_sym_solve(H0, dtau0.T).T * robot.dof_valid
                )
        else:
            actions0 = jnp.zeros((horizon, Dmax), q0_r.dtype) + 0.0 * q0_r

        def cost_fn(actions):
            dtau = to_torque_deltas(actions)
            taus = tau_ref + dtau
            if respect_effort_limits:
                taus = jnp.clip(taus, -emax, emax)
            qs, _ = dynamic_rollout_fleet(
                robot, q0_r, qd0_r, taus, dt, use_damping=use_damping
            )
            p = ee_trajectory_fleet(robot, qs)
            err = goal_weight * (p - goal_r)
            # masked mean over REAL dofs: identical cost (and gradients) to
            # the single-robot solver regardless of this fleet's padding
            effort = jnp.sum(dtau * dtau) / (
                dtau.shape[0] * jnp.sum(robot.dof_valid)
            )
            return jnp.mean(err * err) + effort_weight * effort

        opt = optax.adam(lr, eps=eps, eps_root=1e-8)

        def iteration(carry, _):
            actions, opt_state = carry
            cost, grads = jax.value_and_grad(cost_fn)(actions)
            updates, opt_state = opt.update(grads, opt_state)
            actions = optax.apply_updates(actions, updates)
            return (actions, opt_state), cost

        (actions, _), costs = jax.lax.scan(
            iteration, (actions0, opt.init(actions0)), None, length=n_iters
        )
        _, final_cost = jax.lax.scan(
            lambda c, _: (c, cost_fn(c)), actions, None, length=1
        )
        return FleetTrajOptResult(
            to_applied_torques(actions), final_cost[0], costs
        )

    in_axes_init = None if init_actions is None else 0
    if q0.ndim == 3:  # [R, B, Dmax]: scenario batch inside each robot
        solve_one = jax.vmap(
            solve_one, in_axes=(None, 0, 0, 0, in_axes_init)
        )
    return jax.vmap(solve_one, in_axes=(0, 0, 0, 0, in_axes_init))(
        fleet, q0, qd0, goal_ee_pos, init_actions
    )


def solve_fleet_kinematic_specialized(
    structs: List[RobotStruct],
    ee_link_idxs: List[int],
    q0s,  # tuple/list of [B_r, D_r] per member
    goals,  # tuple/list of [B_r, 3]
    horizon: int,
    n_iters: int = 100,
    lr: float = 1e-2,
    goal_weight: float = 100.0,
    fk_impl: str = "scalar",
    eps: float = 1e-8,
):
    """Kinematic twin of `solve_fleet_dynamic_specialized`: R per-member
    `solve_kinematic_adam_batch` instances (fused Pallas chain-FK kernels
    per member with `fk_impl="pallas"` on TPU) unrolled in ONE jitted
    program — the static-roster fast path; the padded
    `solve_fleet_kinematic_adam` remains the topology-as-data form.
    Returns a tuple of `BatchTrajOptResult` in member order."""
    from ..trajopt.solvers import solve_kinematic_adam_batch

    assert len(structs) == len(ee_link_idxs) == len(q0s) == len(goals)
    return tuple(
        solve_kinematic_adam_batch(
            struct, q0, goal, ee_idx,
            horizon=horizon, n_iters=n_iters, lr=lr,
            goal_weight=goal_weight, fk_impl=fk_impl, eps=eps,
        )
        for struct, ee_idx, q0, goal in zip(structs, ee_link_idxs, q0s, goals)
    )


def solve_fleet_dynamic_specialized(
    structs: List[RobotStruct],
    ee_link_idxs: List[int],
    q0s,  # tuple/list of [B_r, D_r] per member
    qd0s,  # same shapes as q0s
    goals,  # tuple/list of [B_r, 3]
    horizon: int,
    dt: float = 0.02,
    n_iters: int = 10,
    lr: float = 0.5,
    goal_weight: float = 10.0,
    effort_weight: float = 1e-4,
    eps: float = 1e-1,
    use_damping: bool = True,
    respect_effort_limits: bool = False,
    rollout_impl: str = "scan",
):
    """Fleet fast path: R PER-MEMBER-SPECIALIZED solves in ONE jitted program.

    The padded fleet (`solve_fleet_dynamic_adam`) trades per-member speed
    for one-program-serves-any-topology: every member pays Dmax/Lmax padded
    matmul dynamics, and the fused Pallas rollout kernel cannot serve it
    (a vmapped kernel would pad each member's scenarios to a full lane tile
    separately). This path takes the opposite trade for the case where the
    fleet roster is KNOWN at trace time: a Python loop over members unrolls
    into R single-robot `solve_dynamic_adam_batch` instances inside one
    jitted program — each member gets its own struct-specialized dynamics
    (and, with `rollout_impl="pallas"`, its own fused rollout kernel whose
    scenario batch fills the lane tile), and XLA schedules the R solves in
    one executable with no padding anywhere. R compiles amortize through
    the persistent cache.

    Inputs/outputs are per-member tuples in member order (shapes differ
    across members, so there is no stacked-array form): returns a tuple of
    `BatchTrajOptResult` with actions [B_r, H, D_r] (absolute applied
    torques), exactly `solve_dynamic_adam_batch`'s contract per member.

    Identical math to the single-robot solver by construction; parity with
    the padded-fleet program is tested in tests/test_fleet.py. Use this for
    throughput when the roster is static; use `solve_fleet_dynamic_adam`
    when topology must be data (e.g. identification over fleet leaves or a
    roster that changes per call). No reference analog at any level (the
    reference cannot run two robots in one program at all —
    robot_model.py:87 binds one URDF per module instance).
    """
    from ..trajopt.solvers import solve_dynamic_adam_batch

    assert len(structs) == len(ee_link_idxs) == len(q0s) == len(qd0s) == len(goals)
    results = []
    for struct, ee_idx, q0, qd0, goal in zip(
        structs, ee_link_idxs, q0s, qd0s, goals
    ):
        results.append(
            solve_dynamic_adam_batch(
                struct, q0, qd0, goal, ee_idx,
                horizon=horizon, dt=dt, n_iters=n_iters, lr=lr,
                goal_weight=goal_weight, effort_weight=effort_weight,
                eps=eps, use_damping=use_damping,
                respect_effort_limits=respect_effort_limits,
                rollout_impl=rollout_impl,
            )
        )
    return tuple(results)
