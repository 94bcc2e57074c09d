"""Rigid-body dynamics on stacked link arrays, world-frame formulation.

TPU-native counterpart of the reference's recursive dynamics
(reference: robot_model.py:251-303 RNEA sweeps, :306-375 inverse dynamics,
:403-450 mass matrix via n+1 RNEA calls, :453-485 Euler-Lagrange forward
dynamics, :488-624 ABA).

The central idea: express every spatial quantity in one inertial frame at the
world origin ("absolute coordinates", Featherstone ch. 6). Then:

- velocities:      V_l   = sum_{j in anc*(l)} S_j qd_j
- accelerations:   A_l   = sum_{j in anc*(l)} (S_j qdd_j + (V_j x S_j) qd_j)
- joint forces:    F_j   = sum_{l in desc*(j)} (I_l A_l + V_l x* I_l V_l)
- torques:         tau_j = <S_j, F_j>
- mass matrix:     H_ij  = <S_i, I^C_j S_j>  for i in anc*(j), symmetrized,
                   with composite inertias I^C_j = sum_{l in desc*(j)} I_l.

Every "sum over ancestors/descendants" is a dense matmul with the static
ancestor mask — the two sequential sweeps of the reference become a handful
of MXU-shaped contractions; the only sequential stage left is the FK compose
(pointer-doubled, see ops/kinematics.py).

A scan-style Articulated Body Algorithm (`aba`) in link-local coordinates is
also provided: O(L) like the reference's, useful at very large L and as an
independent cross-check of the O(L^2)-flops (but all-matmul) CRB path.

All functions take a single unbatched sample (q: [D]) and vmap cleanly.
Gravity enters as a fictitious +9.81 z base acceleration (d'Alembert), exactly
like the reference (robot_model.py:344-347).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..models.structs import RobotStruct
from .kinematics import (
    body_velocities,
    fk_world,
    joint_local_transforms,
    world_joint_subspaces,
)
from .lie import skew
from .spatial import (
    inertia_times_motion,
    motion_cross_force,
    motion_cross_motion,
    spatial_inertia_matrix,
)

GRAVITY = 9.81  # matches reference robot_model.py:347


def _world_inertia_terms(robot: RobotStruct, R: jnp.ndarray, p: jnp.ndarray):
    """World-frame per-link COM position and rotational inertia about COM."""
    com_w = p + jnp.einsum("lij,lj->li", R, robot.com)
    i_cw = R @ robot.inertia_com @ jnp.swapaxes(R, -1, -2)
    return com_w, i_cw


def _gravity_acc(robot: RobotStruct, include_gravity: bool, gravity: float):
    a = jnp.zeros((6,), robot.dtype)
    if include_gravity:
        a = a.at[5].set(gravity)  # +g z linear acceleration of the base
    return a


def rnea(
    robot: RobotStruct,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    qdd: jnp.ndarray,
    include_gravity: bool = True,
    use_damping: bool = True,
    gravity: float = GRAVITY,
) -> jnp.ndarray:
    """Inverse dynamics: torques achieving qdd at state (q, qd). All [D].

    Counterpart of reference compute_inverse_dynamics (robot_model.py:306-375)
    + iterative_newton_euler (robot_model.py:251-303), reformulated so both
    tree sweeps are ancestor-mask matmuls.
    """
    R, p = fk_world(robot, q)
    return rnea_given_fk(
        robot, R, p, q, qd, qdd, include_gravity, use_damping, gravity
    )


def rnea_given_fk(
    robot,
    R: jnp.ndarray,
    p: jnp.ndarray,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    qdd: jnp.ndarray,
    include_gravity: bool = True,
    use_damping: bool = True,
    gravity: float = GRAVITY,
) -> jnp.ndarray:
    """World-frame RNEA from precomputed link poses.

    Topology enters ONLY through array leaves (anc_mask / dof_select /
    rev-prism masks), so this path also serves the heterogeneous-fleet
    program (models/fleet.py) where topology is data, not structure.
    """
    S = world_joint_subspaces(robot, R, p)
    qd_link = robot.dof_select @ qd
    qdd_link = robot.dof_select @ qdd
    V = body_velocities(robot, S, qd)

    # A = anc @ (S qdd + (V x S) qd) + a_gravity
    Sdot = motion_cross_motion(V, S)
    A_rel = S * qdd_link[:, None] + Sdot * qd_link[:, None]
    A = jnp.einsum("lj,jk->lk", robot.anc_mask, A_rel)
    A = A + _gravity_acc(robot, include_gravity, gravity)

    com_w, i_cw = _world_inertia_terms(robot, R, p)
    IV = inertia_times_motion(robot.mass, com_w, i_cw, V)
    F_body = inertia_times_motion(robot.mass, com_w, i_cw, A) + motion_cross_force(V, IV)

    # F_joint[j] = sum over descendants-incl-self l of F_body[l]
    F_joint = jnp.einsum("lj,lk->jk", robot.anc_mask, F_body)
    tau_link = jnp.sum(S * F_joint, axis=-1)
    tau = tau_link @ robot.dof_select  # [D]
    if use_damping:
        tau = tau + robot.damping * qd  # reference robot_model.py:368-373
    return tau


def nonlinear_effects(
    robot: RobotStruct,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    include_gravity: bool = True,
    use_damping: bool = True,
    gravity: float = GRAVITY,
) -> jnp.ndarray:
    """Coriolis + centrifugal + gravity (+ damping) torques.

    Counterpart of reference compute_non_linear_effects
    (robot_model.py:378-400).
    """
    return rnea(robot, q, jnp.zeros_like(q) + qd, jnp.zeros_like(q), include_gravity, use_damping, gravity)


def mass_matrix(robot: RobotStruct, q: jnp.ndarray) -> jnp.ndarray:
    """Joint-space inertia matrix H(q): [D, D], via world-frame composite
    rigid bodies.

    Counterpart of reference compute_lagrangian_inertia_matrix
    (robot_model.py:403-450), which runs RNEA n_dofs+1 times with unit
    accelerations; here the composite inertias are a single descendant-mask
    contraction and H is one masked gram matrix — no sequential sweeps at all.
    """
    R, p = fk_world(robot, q)
    return mass_matrix_given_fk(robot, R, p)


def mass_matrix_given_fk(robot, R: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """World-frame CRB mass matrix from precomputed link poses (topology as
    data — shared by the static and fleet paths)."""
    S = world_joint_subspaces(robot, R, p)
    com_w, i_cw = _world_inertia_terms(robot, R, p)
    I_w = spatial_inertia_matrix(robot.mass, com_w, i_cw)  # [L, 6, 6]

    # Composite inertia of the subtree rooted at j: Ic_j = sum_{l: j in anc*(l)} I_l
    Ic = jnp.einsum("lj,lab->jab", robot.anc_mask, I_w)
    F = jnp.einsum("jab,jb->ja", Ic, S)  # [L, 6]
    G = jnp.einsum("ia,ja->ij", S, F)  # G[i, j] = <S_i, Ic_j S_j>

    # H_ij = G_ij when i is an ancestor-or-self of j; symmetrize.
    mask_T = robot.anc_mask.T  # mask_T[i, j] = 1 iff i in anc*(j)
    Hl = G * mask_T
    H_link = Hl + jnp.swapaxes(Hl, -1, -2) - jnp.diag(jnp.diagonal(G))
    return robot.dof_select.T @ H_link @ robot.dof_select


def forward_dynamics_crb(
    robot: RobotStruct,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    f: jnp.ndarray,
    include_gravity: bool = True,
    use_damping: bool = False,
    gravity: float = GRAVITY,
) -> jnp.ndarray:
    """Forward dynamics via the Euler-Lagrange solve qdd = H^-1 (f - nle).

    Counterpart of reference compute_forward_dynamics_old
    (robot_model.py:453-485). Default flags match reference
    compute_forward_dynamics (robot_model.py:488-494: include_gravity=True,
    use_damping=False). Delegates to the fully scalar-expanded path
    (dynamics_scalar.forward_dynamics_scalar): under vmap the NLE, CRB mass
    matrix, and unrolled LDL^T solve all fuse into elementwise VPU kernels —
    ~6x faster at B=4096 than the [L,6,6]-einsum + batched-Cholesky
    formulation (kept above as mass_matrix/jax_sym_solve for the readable /
    fleet paths).
    """
    from .dynamics_scalar import forward_dynamics_scalar

    return forward_dynamics_scalar(
        robot, q, qd, f, include_gravity, use_damping, gravity
    )


def jax_sym_solve(H: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve H x = rhs for symmetric positive-definite H via Cholesky.

    Sub-float32 inputs (bfloat16 models) are upcast for the factorization —
    a bf16 Cholesky would be numerically meaningless (and is unsupported by
    the CPU backend) — and the solution is cast back.
    """
    import jax.scipy.linalg as jsl

    dtype = H.dtype
    compute_dtype = jnp.promote_types(dtype, jnp.float32)
    chol = jsl.cho_factor(H.astype(compute_dtype), lower=True)
    return jsl.cho_solve(chol, rhs.astype(compute_dtype)).astype(dtype)


def aba(
    robot: RobotStruct,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    f: jnp.ndarray,
    include_gravity: bool = True,
    use_damping: bool = False,
    gravity: float = GRAVITY,
) -> jnp.ndarray:
    """Articulated Body Algorithm forward dynamics, O(L), link-local frames.

    Counterpart of reference compute_forward_dynamics
    (robot_model.py:488-624, Featherstone p.132). The three sweeps are
    unrolled over the static topology (L <= ~30); under vmap each step is a
    batched 6x6 update. Keeps the reference's 1e-37 zero-mass smoothing
    (robot_model.py:570,582), which also uniformly handles fixed joints
    (S = 0 there, exactly like the reference's zero joint_axis).
    """
    if use_damping:
        f = f - robot.damping * qd  # reference robot_model.py:516-521

    L = robot.n_links
    R_loc, t_loc = joint_local_transforms(robot, q)
    qd_link = robot.dof_select @ qd
    f_link = robot.dof_select @ f

    # Local motion subspace: [axis, 0] for revolute, [0, axis] for prismatic.
    S = (
        robot.rev_mask[:, None] * jnp.concatenate([robot.axis, jnp.zeros_like(robot.axis)], -1)
        + robot.prism_mask[:, None]
        * jnp.concatenate([jnp.zeros_like(robot.axis), robot.axis], -1)
    )

    # Motion transform child <- parent: X = [[R^T, 0], [-R^T p~, R^T]].
    Rt = jnp.swapaxes(R_loc, -1, -2)
    zero3 = jnp.zeros_like(Rt)
    X_up = jnp.concatenate(
        [
            jnp.concatenate([Rt, zero3], axis=-1),
            jnp.concatenate([-Rt @ skew(t_loc), Rt], axis=-1),
        ],
        axis=-2,
    )  # [L, 6, 6]

    # Local spatial inertias about the link origin.
    I_sp = spatial_inertia_matrix(robot.mass, robot.com, robot.inertia_com)

    eps = 1e-37

    # Pass 1 (root -> leaves): local velocities, bias terms.
    v = [jnp.zeros((6,), robot.dtype)] * L
    c = [jnp.zeros((6,), robot.dtype)] * L
    pA = [jnp.zeros((6,), robot.dtype)] * L
    for l in range(1, L):
        vJ = S[l] * qd_link[l]
        v[l] = X_up[l] @ v[robot.parent[l]] + vJ
        c[l] = motion_cross_motion(v[l], vJ)
        pA[l] = motion_cross_force(v[l], I_sp[l] @ v[l])

    IA = [I_sp[l] for l in range(L)]
    U = [jnp.zeros((6,), robot.dtype)] * L
    d = [jnp.ones((), robot.dtype)] * L
    u = [jnp.zeros((), robot.dtype)] * L

    # Pass 2 (leaves -> root): articulated inertias.
    for l in range(L - 1, 0, -1):
        U[l] = IA[l] @ S[l]
        d[l] = S[l] @ U[l]
        u[l] = f_link[l] - S[l] @ pA[l]
        par = robot.parent[l]
        Ia = IA[l] - jnp.outer(U[l], U[l]) / (d[l] + eps)
        pa = pA[l] + Ia @ c[l] + U[l] * (u[l] / (d[l] + eps))
        IA[par] = IA[par] + X_up[l].T @ Ia @ X_up[l]
        pA[par] = pA[par] + X_up[l].T @ pa

    # Pass 3 (root -> leaves): accelerations.
    # d'Alembert: the base "accelerates" at +g z, same trick as in RNEA
    # (reference robot_model.py:527-532).
    a = [_gravity_acc(robot, include_gravity, gravity)] + [
        jnp.zeros((6,), robot.dtype)
    ] * (L - 1)
    qdd_link = [jnp.zeros((), robot.dtype)] * L
    for l in range(1, L):
        a_l = X_up[l] @ a[robot.parent[l]] + c[l]
        qdd_link[l] = (u[l] - U[l] @ a_l) / (d[l] + eps)
        a[l] = a_l + S[l] * qdd_link[l]

    return jnp.stack(qdd_link) @ robot.dof_select
