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
    ee_traj = jax.vmap(lambda qq: ee_position_fleet(robot, qq))(q_traj)
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
