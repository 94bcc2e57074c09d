"""Batched differentiable rollouts (kinematic and dynamic).

TPU-native counterpart of the reference's only "MPC-shaped" workload
(reference: examples/run_kinematic_trajectory_opt.py:17-61, a sequential
Python rollout loop with per-step clamping and FK). Here rollouts are
`lax.scan` programs over the horizon, fully jittable and vmappable over
scenario batches; the dynamic rollout integrates the forward dynamics with a
semi-implicit Euler step (the reference has no dynamic rollout at all).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.structs import RobotStruct
from ..ops import dynamics as D
from ..ops import kinematics as K


def clip_to_limits(robot: RobotStruct, q: jnp.ndarray) -> jnp.ndarray:
    """Clamp joint positions to the URDF limits.

    Mirrors the torch.where clamping of the reference's KinematicModel
    (run_kinematic_trajectory_opt.py:33-42).
    """
    return jnp.clip(q, robot.limit_lower, robot.limit_upper)


def clip_to_effort(robot: RobotStruct, tau: jnp.ndarray) -> jnp.ndarray:
    """Clamp applied torques to the URDF effort limits (dof on the LAST axis).

    The reference parses and exposes effort limits (`urdf_utils.py:59-64`,
    `robot_model.py:715`) but never enforces them; here they are the box
    constraint of the torque-space solvers (see `solve_dynamic_adam`'s
    `respect_effort_limits`). Non-positive or missing URDF limits mean
    unbounded, matching `_velocity_bound`'s convention.
    """
    e = jnp.where(robot.limit_effort > 0, robot.limit_effort, jnp.inf)
    return jnp.clip(tau, -e, e)


def _effort_bound(robot: RobotStruct, n_batch_dims: int):
    """Per-dof applied-torque bound for dof-major layouts, shaped [D, 1...].

    Dof-leading twin of `clip_to_effort`'s bound (dof axis first, trailing
    scenario batch), for the dof-major solvers/rollouts. Non-positive or
    missing URDF effort limits are treated as unbounded.
    """
    e = robot.limit_effort
    e = jnp.where(e > 0, e, jnp.inf)
    return e.reshape(e.shape + (1,) * n_batch_dims)


def clamp_affine_combine(e1, e2):
    """Associative composition of clamp-affine maps f(x)=min(max(x+a,b),c).

    (f2 ∘ f1) = (a1+a2, max(b1+a2, b2), min(max(c1+a2, b2), c2)) — the
    log-depth horizon-integration kernel shared by the kinematic rollout
    below, the dof-major batched solver (trajopt/solvers.py), and the
    fleet solver (models/fleet.py).
    """
    a1, b1, c1 = e1
    a2, b2, c2 = e2
    return (
        a1 + a2,
        jnp.maximum(b1 + a2, b2),
        jnp.minimum(jnp.maximum(c1 + a2, b2), c2),
    )


def clamp_affine_q_traj(q_start, u, lo, hi, axis: int = 0):
    """Clipped joint trajectory from composed clamp-affine steps.

    Integrates the H-1 steps f_t(x) = min(max(x + u_t, lo), hi) in O(log H)
    rounds via `associative_scan` over `clamp_affine_combine` (exact same
    values and subgradients as the sequential recursion) and returns the
    full [.., H, ..] trajectory with `q_start` as entry 0 along `axis`.

    `u` carries the horizon on `axis`; `lo`/`hi` broadcast against `u`;
    `q_start` is `u` with the horizon axis removed. Handles the horizon==1
    (empty `u`) edge in one place. Shared by `kinematic_rollout`, the
    dof-major batched solver (trajopt/solvers.py) and the fleet solver
    (models/fleet.py) — the three layouts differ only in `axis`.
    """
    q_start_h = jnp.expand_dims(q_start, axis)
    if u.shape[axis] == 0:  # horizon == 1: no integration steps
        return q_start_h
    A, Bnd, Cnd = jax.lax.associative_scan(
        clamp_affine_combine,
        (u, jnp.broadcast_to(lo, u.shape), jnp.broadcast_to(hi, u.shape)),
        axis=axis,
    )
    q_tail = jnp.minimum(jnp.maximum(q_start_h + A, Bnd), Cnd)
    return jnp.concatenate([q_start_h, q_tail], axis=axis)


def kinematic_rollout(
    robot: RobotStruct,
    q0: jnp.ndarray,
    actions: jnp.ndarray,
    ee_link_idx: int,
    stop_gradient_between_steps: bool = False,
):
    """Roll joint-position deltas through FK. Unbatched: q0 [D], actions [H, D].

    Returns (ee_traj [H, 3], q_traj [H, D]) with the reference's indexing
    (run_kinematic_trajectory_opt.py:49-61): entry 0 is the start state, then
    H-1 action steps (the last action is unused, as in the reference).
    `stop_gradient_between_steps=True` reproduces the reference's
    `joint_state.detach()` (line 58): gradients reach each action only
    through its own step's FK.
    """

    q_start = clip_to_limits(robot, q0)

    if stop_gradient_between_steps:
        # Reference-parity mode (per-step detach) keeps the sequential scan:
        # the detach breaks the clamp-affine composition below.
        def step(q, u):
            q_next = clip_to_limits(robot, jax.lax.stop_gradient(q) + u)
            return q_next, q_next

        _, q_tail = jax.lax.scan(step, q_start, actions[:-1])
        q_clipped = jnp.concatenate([q_start[None], q_tail], axis=0)
    else:
        # Horizon-parallel integration: the whole horizon composes in
        # O(log H) rounds of elementwise [H, D] ops (VJP likewise
        # log-depth) — the "horizon parallelism" axis of SURVEY.md §7.
        q_clipped = clamp_affine_q_traj(
            q_start, actions[:-1], robot.limit_lower, robot.limit_upper
        )  # [H, D]

    # The integration scan above is the only stateful part (tiny [D] adds);
    # the end-effector chain is evaluated with the scalar-expanded FK (pure
    # elementwise ops that fuse on the VPU) over ALL H configurations in one
    # batched call — the scalar form keeps intermediates at [H] per quantity,
    # so unlike a matrix-form mega-batch this stays register/VMEM-resident.
    ee_traj = K.fk_link_position(robot, q_clipped, ee_link_idx)
    # q_traj keeps the RAW q0 as entry 0 (reference indexing); the clipped
    # start only feeds the FK above.
    q_traj = jnp.concatenate([q0[None], q_clipped[1:]], axis=0)
    return ee_traj, q_traj


class DynRolloutResult(NamedTuple):
    q: jnp.ndarray  # [H, D]
    qd: jnp.ndarray  # [H, D]
    ee: jnp.ndarray  # [H, 3]


def dynamic_rollout(
    robot: RobotStruct,
    q0: jnp.ndarray,
    qd0: jnp.ndarray,
    taus: jnp.ndarray,
    dt: float,
    ee_link_idx: int,
    include_gravity: bool = True,
    use_damping: bool = True,
    respect_effort_limits: bool = False,
) -> DynRolloutResult:
    """Integrate applied torques through the forward dynamics (semi-implicit
    Euler), recording joint states and end-effector positions.

    Unbatched: q0, qd0 [D]; taus [H, D]. Beyond reference scope (its rollout
    is kinematic only); this is the plant model for torque-space MPC.
    `respect_effort_limits=True` clamps each torque to the URDF effort
    limits first (see `clip_to_effort`).
    """
    if respect_effort_limits:
        taus = clip_to_effort(robot, taus)

    def step(carry, tau):
        q, qd = carry
        qdd = D.forward_dynamics_crb(
            robot, q, qd, tau, include_gravity=include_gravity, use_damping=use_damping
        )
        qd_next = qd + dt * qdd
        q_next = q + dt * qd_next
        _, p = K.fk_world(robot, q_next)
        return (q_next, qd_next), (q_next, qd_next, p[ee_link_idx])

    _, (qs, qds, ees) = jax.lax.scan(step, (q0, qd0), taus)
    return DynRolloutResult(qs, qds, ees)


def fd_step_implicit_damping(
    robot: RobotStruct,
    q: jnp.ndarray,  # [D] or dof-major [D, B...]
    qd: jnp.ndarray,
    tau: jnp.ndarray,
    dt: float,
    include_gravity: bool = True,
    use_damping: bool = True,
) -> jnp.ndarray:
    """Forward-dynamics acceleration with IMPLICIT viscous joint damping.

    Explicit damping torques make semi-implicit Euler conditionally stable:
    for a low-inertia joint the discrete damping gain dt*d/H_ii exceeds 2
    (iiwa wrist: d=0.5, H_ii ~ 3e-3, dt=0.02 -> ~3.3) and the velocity
    oscillates divergently under any torque perturbation. The standard cure
    (as in production simulators) evaluates the damping force at qd_{k+1}:
        H qdd = tau - nle(q, qd) - d (qd + dt qdd)
     => (H + dt diag(d)) qdd = tau - nle_with_damping(q, qd),
    i.e. one extra diagonal term inside the same unrolled LDL^T solve —
    unconditionally stable in the damping term, O(D) extra work, and it
    converges to the explicit dynamics as dt -> 0. All-scalar like the rest
    of the dof-major path; accepts [D] or trailing-batched [D, B...].
    """
    from ..ops.dynamics_scalar import (
        ldl_solve_scalar,
        mass_matrix_scalar,
        rnea_scalar,
    )

    nle = rnea_scalar(
        robot, q, qd, jnp.zeros_like(q),
        include_gravity=include_gravity, use_damping=use_damping,
    )
    H = mass_matrix_scalar(robot, q)
    if use_damping:
        D_ = robot.n_dofs
        idx = jnp.arange(D_)
        damp = robot.damping.reshape(robot.damping.shape + (1,) * (q.ndim - 1))
        H = H.at[idx, idx].add(dt * damp)
    return ldl_solve_scalar(H, tau - nle)


def dynamic_rollout_dof_major(
    robot: RobotStruct,
    q0T: jnp.ndarray,  # [D, B]
    qd0T: jnp.ndarray,  # [D, B]
    tauT: jnp.ndarray,  # [H, D, B]
    dt: float,
    include_gravity: bool = True,
    use_damping: bool = True,
    unroll: int = 1,
    respect_effort_limits: bool = False,
    remat: bool = False,
):
    """Throughput twin of `dynamic_rollout` for dof-major scenario batches.

    Integrates all B scenarios at once with the trailing-batch scalar
    forward dynamics (ops/dynamics_scalar.py): every state tensor is
    [D, B] with the scenario batch minor, so the whole semi-implicit Euler
    step — RNEA bias torques, scalar CRB mass matrix (with implicit
    damping, see `fd_step_implicit_damping`), unrolled LDL^T solve — is
    fused elementwise VPU code on [B] lanes, inside one `lax.scan` over
    the horizon. Returns (qs, qds): each [H, D, B] (state AFTER each step,
    matching `dynamic_rollout`'s indexing).

    `unroll` is forwarded to the horizon scan: values > 1 let XLA fuse
    across consecutive integration steps at the cost of compile time
    (measure per shape; the solver default stays at the measured winner).

    `respect_effort_limits=True` clamps each applied torque to the URDF
    effort limits before integration (the actuator box constraint; clamp
    subgradients are exact, so saturated dofs stop attracting solver
    pressure — same mechanism as the velocity clamp below).

    `remat=True` checkpoints the integration step: reverse-mode
    differentiation then stores only the [D, B] carry per step and
    recomputes the forward-dynamics intermediates (RNEA bias, scalar CRB
    factors) during the backward sweep — the `jax.checkpoint` HBM-for-FLOPs
    trade. Same values and gradients either way (tests/test_trajopt.py);
    measure per shape on the chip before changing a solver default.
    """

    vmax = _velocity_bound(robot, q0T.ndim - 1)
    emax = (
        _effort_bound(robot, q0T.ndim - 1) if respect_effort_limits else None
    )

    def step(carry, tau_t):
        q, qd = carry
        if emax is not None:
            tau_t = jnp.clip(tau_t, -emax, emax)
        qdd = fd_step_implicit_damping(
            robot, q, qd, tau_t, dt,
            include_gravity=include_gravity, use_damping=use_damping,
        )
        qd_next = jnp.clip(qd + dt * qdd, -vmax, vmax)
        q_next = q + dt * qd_next
        return (q_next, qd_next), (q_next, qd_next)

    if remat:
        step = jax.checkpoint(step)
    _, (qs, qds) = jax.lax.scan(step, (q0T, qd0T), tauT, unroll=unroll)
    return qs, qds


def _velocity_bound(robot: RobotStruct, n_batch_dims: int):
    """Per-dof velocity clamp for dynamic rollouts, shaped [D, 1...].

    Joint velocities are clamped to the URDF velocity limits each step —
    the dynamic analogue of the reference's joint-POSITION clamping in its
    kinematic rollout (run_kinematic_trajectory_opt.py:33-42). Besides
    physical realism, this bounds the rollout unconditionally: without it,
    a batch of thousands of scenarios under solver-perturbed torques always
    contains a few that get driven past the explicit integrator's stability
    region and overflow to NaN (observed on-chip at B=1024), poisoning the
    whole Adam state. Clamp subgradients are exact, and saturated
    directions stop attracting further solver pressure. Non-positive or
    missing URDF limits are treated as unbounded.
    """
    v = robot.limit_velocity
    v = jnp.where(v > 0, v, jnp.inf)
    return v.reshape(v.shape + (1,) * n_batch_dims)
