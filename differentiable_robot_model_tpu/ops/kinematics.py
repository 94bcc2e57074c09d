"""Kinematics on stacked link arrays: FK, world joint axes, Jacobians.

TPU-native counterpart of the reference's sequential Python link loops
(reference: robot_model.py:140-195 `update_kinematic_state`,
rigid_body.py:85-127 recursive FK, robot_model.py:627-667 Jacobian walk).

Key TPU-first design decisions:
- All per-link local transforms are computed in one batched op over links.
- Chain composition uses *pointer doubling* over the static parent array:
  O(ceil(log2(depth))) rounds of stacked 3x3 matmuls instead of an O(L)
  sequential walk — at batch B these are [B*L, 3, 3] matmul sweeps that XLA
  maps straight onto the MXU. An unrolled sequential variant is kept for
  cross-checking (`fk_compose_sequential`).
- The Jacobian is a masked, fully-vectorized gather — no tree walk: the
  column for dof j is the world motion subspace of joint j re-referenced to
  the end-effector point, zeroed by the ancestor mask for non-ancestors
  (branched trees come out right by construction; reference handles this via
  its child->root Python walk at robot_model.py:652-665).

Core functions are written for a single unbatched sample (q: [D]) and are
`vmap`-composable; batched convenience wrappers live in the model API layer.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..models.structs import RobotStruct
from .lie import axis_angle_to_matrix, rpy_to_matrix


def joint_local_transforms(robot: RobotStruct, q: jnp.ndarray):
    """Per-link local transform (parent <- link) for configuration q: [D].

    Returns (R_loc [L, 3, 3], t_loc [L, 3]).

    R_loc = R_rpy @ R_axis(a, q)     for revolute joints
    t_loc = xyz + R_rpy @ (a * q)    for prismatic joints
    matching the reference's joint pose update (rigid_body.py:130-157) and
    generalizing it to arbitrary axes and prismatic joints.
    """
    q_link = robot.dof_select @ q  # [L]
    R_fix = rpy_to_matrix(robot.rot_angles)  # [L, 3, 3]
    R_joint = axis_angle_to_matrix(robot.axis, q_link * robot.rev_mask)
    R_loc = R_fix @ R_joint
    t_prism = jnp.einsum(
        "lij,lj->li", R_fix, robot.axis * (q_link * robot.prism_mask)[:, None]
    )
    t_loc = robot.trans + t_prism
    return R_loc, t_loc


def fk_compose_doubling(robot: RobotStruct, R_loc: jnp.ndarray, t_loc: jnp.ndarray):
    """Compose local transforms into world poses by pointer doubling.

    Invariant: after k rounds, (R[i], t[i]) composes the local transforms on
    the path from the 2^k-th ancestor (exclusive) down to link i. The root
    (index 0) is its own parent with an identity local transform, so extra
    rounds are idempotent. Terminates in ceil(log2(max depth)) rounds —
    the loop structure is static (derived from the static parent tuple).
    """
    pi = np.asarray(robot.parent, dtype=np.int64)
    R, t = R_loc, t_loc
    while np.any(pi != 0):
        Rp = jnp.take(R, pi, axis=0)
        tp = jnp.take(t, pi, axis=0)
        t = jnp.einsum("lij,lj->li", Rp, t) + tp
        R = Rp @ R
        pi = pi[pi]
    return R, t


def fk_compose_sequential(robot: RobotStruct, R_loc: jnp.ndarray, t_loc: jnp.ndarray):
    """Reference-style sequential chain composition (unrolled, for cross-checks).

    Mirrors the reference's index-order propagation loop
    (robot_model.py:173-193) without the per-link Python objects.
    """
    L = robot.n_links
    Rs = [R_loc[0]]
    ts = [t_loc[0]]
    for i in range(1, L):
        p = robot.parent[i]
        Rs.append(Rs[p] @ R_loc[i])
        ts.append(Rs[p] @ t_loc[i] + ts[p])
    return jnp.stack(Rs, axis=0), jnp.stack(ts, axis=0)


def fk_world(robot: RobotStruct, q: jnp.ndarray, sequential: bool = False):
    """World pose of every link for q: [D]. Returns (R [L,3,3], p [L,3]).

    Counterpart of reference compute_forward_kinematics_all_links
    (robot_model.py:198-221) / update_kinematic_state poses
    (robot_model.py:173-187).
    """
    R_loc, t_loc = joint_local_transforms(robot, q)
    if sequential:
        return fk_compose_sequential(robot, R_loc, t_loc)
    return fk_compose_doubling(robot, R_loc, t_loc)


def world_joint_subspaces(robot: RobotStruct, R: jnp.ndarray, p: jnp.ndarray):
    """World-frame joint motion subspaces, one spatial vector per link.

    Returns S: [L, 6] in [ang, lin] ordering, referenced to the world origin:
      revolute joint at p with world axis z:  S = [z, p x z]
      prismatic joint with world axis z:      S = [0, z]
      fixed joint:                            S = 0
    The world axis is z = R @ axis (the axis lives in the child link frame,
    as in reference robot_model.py:660 `z_i = pose.rotation() @ axis`).
    """
    z = jnp.einsum("lij,lj->li", R, robot.axis)
    s_rev = jnp.concatenate([z, jnp.cross(p, z)], axis=-1)
    s_prism = jnp.concatenate([jnp.zeros_like(z), z], axis=-1)
    return robot.rev_mask[:, None] * s_rev + robot.prism_mask[:, None] * s_prism


def body_velocities(robot: RobotStruct, S: jnp.ndarray, qd: jnp.ndarray):
    """World-origin spatial velocity of every link: V = anc_mask @ (S * qd).

    The reference propagates velocities link-by-link in local frames
    (robot_model.py:188-193); in world-origin coordinates the velocity of
    link l is just the ancestor-masked sum of joint subspace contributions —
    a single [L, L] x [L, 6] matmul.
    """
    qd_link = robot.dof_select @ qd
    return jnp.einsum("lj,jk->lk", robot.anc_mask, S * qd_link[:, None])


def link_jacobian(robot: RobotStruct, q: jnp.ndarray, link_idx: int):
    """Geometric Jacobian of link `link_idx`: returns (J_lin, J_ang) [3, D].

    Counterpart of reference compute_endeffector_jacobian
    (robot_model.py:627-667), vectorized: every dof's column is computed at
    once and masked by ancestry, which handles branched trees exactly like
    the reference's explicit child->root walk.
    """
    R, p = fk_world(robot, q)
    S = world_joint_subspaces(robot, R, p)
    p_e = p[link_idx]
    # Velocity of the point p_e induced by unit motion of each joint:
    #   v(p_e) = S_lin + S_ang x p_e ; angular part is S_ang.
    j_ang_link = S[:, :3]
    j_lin_link = S[:, 3:] + jnp.cross(S[:, :3], jnp.broadcast_to(p_e, S[:, :3].shape))
    mask = robot.anc_mask[link_idx][:, None]  # [L, 1]
    dof_links = np.asarray(robot.dof_links, dtype=np.int64)
    j_ang = jnp.take(j_ang_link * mask, dof_links, axis=0).T  # [3, D]
    j_lin = jnp.take(j_lin_link * mask, dof_links, axis=0).T
    return j_lin, j_ang
