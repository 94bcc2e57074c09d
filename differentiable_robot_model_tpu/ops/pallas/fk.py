"""Fused batched chain-FK (one link's world position) as Pallas TPU kernels.

Why this exists: the MPC cost path evaluates ONE link's world position for
B*H ~ 200k configurations per solver iteration. The XLA scalar-expanded path
(ops/kinematics.py fk_link_position) is mathematically right but XLA splits
its ~400 elementwise ops into dozens of small fusions, and at ~30us kernel
dispatch latency the solve becomes launch-bound, not compute-bound. Here the
whole chain — and its backward pass — is ONE kernel each.

Backward pass: instead of taping reverse-mode through the chain, the kernel
uses the geometric Jacobian identity (reference robot_model.py:652-665 uses
the same identity host-side): for a revolute joint l with world axis z_l
through world point o_l,  dp/dq_l = z_l x (p - o_l); for a prismatic joint
dp/dq_l = z_l. So the VJP is one forward replay plus D dot products — no
stored residuals beyond q itself.

Layout: batch is laid out as [8, LANE_B] tiles per dof row (full 8x128
sublane-lane utilization on the VPU; a [1, B] row would idle 7/8 sublanes).
Batch index b maps to (tile i, sublane s, lane t): b = i*8*LANE_B + s*LANE_B + t,
consistently in both kernels and the host-side reshapes, so the mapping
cancels out.

Reference parity: same math as reference robot_model.py:224-248 restricted
to one kinematic chain; validated against ops/kinematics.fk_link_position in
tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.structs import JOINT_PRISMATIC, JOINT_REVOLUTE, RobotStruct

SUB = 8  # sublanes per tile
LANE_B = 1024  # lanes per tile (8 physical 128-lane tiles)
TILE_B = SUB * LANE_B  # batch elements per grid step


def _chain_to(robot: RobotStruct, link_idx: int):
    """Static ancestor chain root -> link_idx (root excluded)."""
    chain = []
    l = link_idx
    while l != 0:
        chain.append(l)
        l = robot.parent[l]
    return chain[::-1]


def _rpy_entries(rpy_ref, l):
    roll, pitch, yaw = rpy_ref[l, 0], rpy_ref[l, 1], rpy_ref[l, 2]
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    # R_rpy = Rz(yaw) @ Ry(pitch) @ Rx(roll), row-major 9-tuple of scalars.
    return (
        cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr,
        sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr,
        -sp, cp * sr, cp * cr,
    )


def _rot_scalar(R, v):
    """Apply row-major 9-tuple rotation (scalars) to a 3-tuple."""
    return (
        R[0] * v[0] + R[1] * v[1] + R[2] * v[2],
        R[3] * v[0] + R[4] * v[1] + R[5] * v[2],
        R[6] * v[0] + R[7] * v[1] + R[8] * v[2],
    )


def _rot_vec(Rw, v):
    """Apply rotation with [8, LANE_B]-vector entries to a vector 3-tuple."""
    return (
        Rw[0] * v[0] + Rw[1] * v[1] + Rw[2] * v[2],
        Rw[3] * v[0] + Rw[4] * v[1] + Rw[5] * v[2],
        Rw[6] * v[0] + Rw[7] * v[1] + Rw[8] * v[2],
    )


def _chain_sweep(robot, chain, q_ref, trans_ref, rpy_ref, axis_ref, record):
    """Shared forward sweep. `record(l, jt, d, z, o_pre, pw, Rw)` is called per
    chain link after pw/Rw are updated; z is the world joint axis, o_pre the
    world joint origin (both None for fixed links)."""
    link_dof = {l: d for d, l in enumerate(robot.dof_links)}
    dtype = q_ref.dtype
    shape = q_ref.shape[1:]  # [SUB, LANE_B]
    one = jnp.ones(shape, dtype)
    zero = jnp.zeros(shape, dtype)

    Rw = (one, zero, zero, zero, one, zero, zero, zero, one)
    pw = (zero, zero, zero)

    for l in chain:
        jt = robot.joint_types[l]
        F = _rpy_entries(rpy_ref, l)
        ax, ay, az = axis_ref[l, 0], axis_ref[l, 1], axis_ref[l, 2]
        t = (trans_ref[l, 0], trans_ref[l, 1], trans_ref[l, 2])
        Fa = _rot_scalar(F, (ax, ay, az))  # axis in the post-rpy joint frame

        if jt == JOINT_REVOLUTE:
            d = link_dof[l]
            qv = q_ref[d]
            c, s = jnp.cos(qv), jnp.sin(qv)
            C = 1.0 - c
            J = (
                c + ax * ax * C, ax * ay * C - az * s, ax * az * C + ay * s,
                ay * ax * C + az * s, c + ay * ay * C, ay * az * C - ax * s,
                az * ax * C - ay * s, az * ay * C + ax * s, c + az * az * C,
            )
            # R_loc = F @ J (scalar x vector entries)
            R = (
                F[0] * J[0] + F[1] * J[3] + F[2] * J[6],
                F[0] * J[1] + F[1] * J[4] + F[2] * J[7],
                F[0] * J[2] + F[1] * J[5] + F[2] * J[8],
                F[3] * J[0] + F[4] * J[3] + F[5] * J[6],
                F[3] * J[1] + F[4] * J[4] + F[5] * J[7],
                F[3] * J[2] + F[4] * J[5] + F[5] * J[8],
                F[6] * J[0] + F[7] * J[3] + F[8] * J[6],
                F[6] * J[1] + F[7] * J[4] + F[8] * J[7],
                F[6] * J[2] + F[7] * J[5] + F[8] * J[8],
            )
            tt = (t[0] + zero, t[1] + zero, t[2] + zero)
        elif jt == JOINT_PRISMATIC:
            d = link_dof[l]
            qv = q_ref[d]
            R = tuple(Fi + zero for Fi in F)
            tt = (t[0] + Fa[0] * qv, t[1] + Fa[1] * qv, t[2] + Fa[2] * qv)
        else:
            d = None
            R = tuple(Fi + zero for Fi in F)
            tt = (t[0] + zero, t[1] + zero, t[2] + zero)

        # world joint axis and origin use Rw/pw BEFORE this link's update
        if jt != 0:
            z = (
                Rw[0] * Fa[0] + Rw[1] * Fa[1] + Rw[2] * Fa[2],
                Rw[3] * Fa[0] + Rw[4] * Fa[1] + Rw[5] * Fa[2],
                Rw[6] * Fa[0] + Rw[7] * Fa[1] + Rw[8] * Fa[2],
            )
        else:
            z = None

        dt = _rot_vec(Rw, tt)
        pw = (pw[0] + dt[0], pw[1] + dt[1], pw[2] + dt[2])
        o_pre = pw if jt == JOINT_REVOLUTE else None

        # Rw = Rw @ R
        Rw = (
            Rw[0] * R[0] + Rw[1] * R[3] + Rw[2] * R[6],
            Rw[0] * R[1] + Rw[1] * R[4] + Rw[2] * R[7],
            Rw[0] * R[2] + Rw[1] * R[5] + Rw[2] * R[8],
            Rw[3] * R[0] + Rw[4] * R[3] + Rw[5] * R[6],
            Rw[3] * R[1] + Rw[4] * R[4] + Rw[5] * R[7],
            Rw[3] * R[2] + Rw[4] * R[5] + Rw[5] * R[8],
            Rw[6] * R[0] + Rw[7] * R[3] + Rw[8] * R[6],
            Rw[6] * R[1] + Rw[7] * R[4] + Rw[8] * R[7],
            Rw[6] * R[2] + Rw[7] * R[5] + Rw[8] * R[8],
        )
        record(l, jt, d, z, o_pre, pw, Rw)
    return pw


def _fwd_kernel(robot, chain, q_ref, trans_ref, rpy_ref, axis_ref, p_ref):
    pw = _chain_sweep(
        robot, chain, q_ref, trans_ref, rpy_ref, axis_ref,
        lambda *a: None,
    )
    p_ref[0] = pw[0]
    p_ref[1] = pw[1]
    p_ref[2] = pw[2]


def _bwd_kernel(robot, chain, D, q_ref, trans_ref, rpy_ref, axis_ref, g_ref, dq_ref):
    recs = []  # (dof, joint_type, z, o_pre)

    def record(l, jt, d, z, o_pre, pw, Rw):
        if jt != 0:
            recs.append((d, jt, z, o_pre))

    pw = _chain_sweep(robot, chain, q_ref, trans_ref, rpy_ref, axis_ref, record)

    g = (g_ref[0], g_ref[1], g_ref[2])
    zero = jnp.zeros(q_ref.shape[1:], q_ref.dtype)
    rows = {d: None for d in range(D)}
    for d, jt, z, o in recs:
        if jt == JOINT_REVOLUTE:
            r = (pw[0] - o[0], pw[1] - o[1], pw[2] - o[2])
            # dq = g . (z x r)
            rows[d] = (
                g[0] * (z[1] * r[2] - z[2] * r[1])
                + g[1] * (z[2] * r[0] - z[0] * r[2])
                + g[2] * (z[0] * r[1] - z[1] * r[0])
            )
        else:  # prismatic: dq = g . z
            rows[d] = g[0] * z[0] + g[1] * z[1] + g[2] * z[2]
    for d in range(D):
        dq_ref[d] = rows[d] if rows[d] is not None else zero


def _pack(x, Nt):
    """[N_pad, K] -> [K, Nt, SUB, LANE_B] with b = i*TILE_B + s*LANE_B + t."""
    K = x.shape[-1]
    return x.T.reshape(K, Nt, SUB, LANE_B)


def _unpack(xT):
    """[K, Nt, SUB, LANE_B] -> [N_pad, K]."""
    K = xT.shape[0]
    return xT.reshape(K, -1).T


def _fk_pallas_fwd_impl(robot: RobotStruct, q: jnp.ndarray, link_idx: int):
    N, D = q.shape
    chain = _chain_to(robot, link_idx)
    pad = (-N) % TILE_B
    Nt = (N + pad) // TILE_B
    qT = _pack(jnp.pad(q, ((0, pad), (0, 0))), Nt)
    pT = _call_fwd(robot, chain, qT)
    return _unpack(pT)[:N]


def _fk_pallas_bwd_impl(robot: RobotStruct, q: jnp.ndarray, g: jnp.ndarray, link_idx: int):
    N, D = q.shape
    chain = _chain_to(robot, link_idx)
    pad = (-N) % TILE_B
    Nt = (N + pad) // TILE_B
    qT = _pack(jnp.pad(q, ((0, pad), (0, 0))), Nt)
    gT = _pack(jnp.pad(g, ((0, pad), (0, 0))), Nt)
    dqT = _call_bwd(robot, chain, D, qT, gT)
    return _unpack(dqT)[:N]


# ---------------------------------------------------------------------------
# Packed (dof-major) variant: zero-relayout entry for the batched MPC solver.
# ---------------------------------------------------------------------------


def _call_fwd(robot, chain, qP):
    """qP: [D, Nt, SUB, LANE_B] packed configs -> p [3, Nt, SUB, LANE_B]."""
    D, Nt = qP.shape[0], qP.shape[1]
    batch = lambda K: pl.BlockSpec(
        (K, 1, SUB, LANE_B), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    def kernel(q_ref, trans_ref, rpy_ref, axis_ref, p_ref):
        _fwd_kernel(
            robot, chain, q_ref.at[:, 0], trans_ref, rpy_ref, axis_ref, p_ref.at[:, 0]
        )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, Nt, SUB, LANE_B), qP.dtype),
        grid=(Nt,),
        in_specs=[
            batch(D),
            const((robot.n_links, 3)),
            const((robot.n_links, 3)),
            const((robot.n_links, 3)),
        ],
        out_specs=batch(3),
    )(qP, robot.trans, robot.rot_angles, robot.axis)


def _call_bwd(robot, chain, D, qP, gP):
    Nt = qP.shape[1]
    batch = lambda K: pl.BlockSpec(
        (K, 1, SUB, LANE_B), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    def kernel(q_ref, trans_ref, rpy_ref, axis_ref, g_ref, dq_ref):
        _bwd_kernel(
            robot, chain, D,
            q_ref.at[:, 0], trans_ref, rpy_ref, axis_ref,
            g_ref.at[:, 0], dq_ref.at[:, 0],
        )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((D, Nt, SUB, LANE_B), qP.dtype),
        grid=(Nt,),
        in_specs=[
            batch(D),
            const((robot.n_links, 3)),
            const((robot.n_links, 3)),
            const((robot.n_links, 3)),
            batch(3),
        ],
        out_specs=batch(D),
    )(qP, robot.trans, robot.rot_angles, robot.axis, gP)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fk_position_dof_major(robot: RobotStruct, qM: jnp.ndarray, link_idx: int):
    """World position of link `link_idx` for dof-major configs qM: [D, M].

    Returns [3, M]. Unlike `fk_link_position_pallas`, the batch axis is
    already minor, so entering the kernel layout is a reshape + minor-dim
    pad — no transpose relayout on either side (the relayouts cost ~1.5x the
    kernel itself at MPC sizes). This is the hot entry used by the batched
    MPC solver (trajopt/solvers.py solve_kinematic_adam_batch).

    VJP is w.r.t. qM only (geometric-Jacobian kernel); robot-parameter
    cotangents are zero — use ops/kinematics.fk_link_position for
    identification paths that differentiate w.r.t. robot parameters.
    """
    D, M = qM.shape
    chain = _chain_to(robot, link_idx)
    pad = (-M) % TILE_B
    Nt = (M + pad) // TILE_B
    qP = jnp.pad(qM, ((0, 0), (0, pad))).reshape(D, Nt, SUB, LANE_B)
    pP = _call_fwd(robot, chain, qP)
    return pP.reshape(3, -1)[:, :M]


def _dm_vjp_fwd(robot, qM, link_idx):
    return fk_position_dof_major(robot, qM, link_idx), (robot, qM)


def _dm_vjp_bwd(link_idx, res, g):
    robot, qM = res
    D, M = qM.shape
    chain = _chain_to(robot, link_idx)
    pad = (-M) % TILE_B
    Nt = (M + pad) // TILE_B
    qP = jnp.pad(qM, ((0, 0), (0, pad))).reshape(D, Nt, SUB, LANE_B)
    gP = jnp.pad(g, ((0, 0), (0, pad))).reshape(3, Nt, SUB, LANE_B)
    dqP = _call_bwd(robot, chain, D, qP, gP)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, robot)
    return zeros, dqP.reshape(D, -1)[:, :M]


fk_position_dof_major.defvjp(_dm_vjp_fwd, _dm_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fk_link_position_pallas(robot: RobotStruct, q: jnp.ndarray, link_idx: int):
    """World position of link `link_idx` for a flat config batch q: [N, D].

    Fused single-kernel forward; geometric-Jacobian single-kernel backward
    (w.r.t. q only — robot parameters get zero cotangents on this path; use
    the XLA scalar path for parameter identification).
    """
    return _fk_pallas_fwd_impl(robot, q, link_idx)


def _vjp_fwd(robot, q, link_idx):
    return _fk_pallas_fwd_impl(robot, q, link_idx), (robot, q)


def _vjp_bwd(link_idx, res, g):
    robot, q = res
    dq = _fk_pallas_bwd_impl(robot, q, g, link_idx)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, robot)
    return zeros, dq


fk_link_position_pallas.defvjp(_vjp_fwd, _vjp_bwd)
