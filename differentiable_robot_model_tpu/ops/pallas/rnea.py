"""Fused batched RNEA as a single Pallas TPU kernel.

One kernel launch computes inverse dynamics for a whole scenario batch: the
two link sweeps (velocity/acceleration propagation root->leaf, force
accumulation leaf->root — reference robot_model.py:251-303) run entirely in
VMEM with the batch laid out along lanes. Every per-link quantity is a
[1, TILE_B] lane vector; the link loops unroll over the static topology.
This removes the XLA kernel-launch/fusion-boundary overhead that dominates
the (already scalar-expanded) XLA path at these tiny per-sample FLOP counts.

Differentiation: `rnea_pallas` carries a custom VJP whose backward pass is
the XLA scalar implementation's VJP (ops/dynamics_scalar.py) — bit-identical
math, so gradients are exact and the kernel never blocks training.

Layout: inputs are transposed to [D, B] (dof-major, batch in lanes) so each
dof row is a lane-aligned [1, B] vector; B is padded to the tile size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.structs import JOINT_PRISMATIC, JOINT_REVOLUTE, RobotStruct
from ..dynamics import GRAVITY
from ..dynamics_scalar import rnea_scalar

TILE_B = 1024


def _kernel(
    robot: RobotStruct,
    include_gravity: bool,
    use_damping: bool,
    gravity: float,
    # refs:
    q_ref,  # [D, TILE_B]
    qd_ref,
    qdd_ref,
    trans_ref,  # [L, 3]
    rpy_ref,  # [L, 3]
    axis_ref,  # [L, 3]
    mass_ref,  # [L, 1]
    com_ref,  # [L, 3]
    inertia_ref,  # [L, 6]  (xx, xy, xz, yy, yz, zz about COM)
    damping_ref,  # [D, 1]
    tau_ref,  # [D, TILE_B] output
):
    L = robot.n_links
    link_dof = {l: d for d, l in enumerate(robot.dof_links)}
    dtype = tau_ref.dtype
    zero_row = jnp.zeros((1, q_ref.shape[-1]), dtype)

    def row(ref, d):
        return ref[d : d + 1, :]  # [1, B] lane vector

    def cross(a, b):
        return (
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        )

    def add(a, b):
        return (a[0] + b[0], a[1] + b[1], a[2] + b[2])

    def scale(a, s):
        return (a[0] * s, a[1] * s, a[2] * s)

    def rot(R, v):
        return (
            R[0] * v[0] + R[1] * v[1] + R[2] * v[2],
            R[3] * v[0] + R[4] * v[1] + R[5] * v[2],
            R[6] * v[0] + R[7] * v[1] + R[8] * v[2],
        )

    def rot_t(R, v):
        return (
            R[0] * v[0] + R[3] * v[1] + R[6] * v[2],
            R[1] * v[0] + R[4] * v[1] + R[7] * v[2],
            R[2] * v[0] + R[5] * v[1] + R[8] * v[2],
        )

    # ---- forward sweep ----
    w = [None] * L
    v = [None] * L
    dw = [None] * L
    dv = [None] * L
    Rl = [None] * L
    tl = [None] * L
    zero3 = (zero_row, zero_row, zero_row)
    w[0], v[0], dw[0] = zero3, zero3, zero3
    g_row = jnp.full_like(zero_row, gravity) if include_gravity else zero_row
    dv[0] = (zero_row, zero_row, g_row)

    for l in range(1, L):
        par = robot.parent[l]
        jt = robot.joint_types[l]
        # fixed rotation from rpy (scalars, constant over batch)
        roll, pitch, yaw = rpy_ref[l, 0], rpy_ref[l, 1], rpy_ref[l, 2]
        cr, sr = jnp.cos(roll), jnp.sin(roll)
        cp, sp = jnp.cos(pitch), jnp.sin(pitch)
        cy, sy = jnp.cos(yaw), jnp.sin(yaw)
        F = (
            cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr,
            sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr,
            -sp, cp * sr, cp * cr,
        )
        ax, ay, az = axis_ref[l, 0], axis_ref[l, 1], axis_ref[l, 2]
        t = (trans_ref[l, 0], trans_ref[l, 1], trans_ref[l, 2])

        if jt == JOINT_REVOLUTE:
            d = link_dof[l]
            qv, qdv, qddv = row(q_ref, d), row(qd_ref, d), row(qdd_ref, d)
            c, s = jnp.cos(qv), jnp.sin(qv)
            C = 1.0 - c
            J = (
                c + ax * ax * C, ax * ay * C - az * s, ax * az * C + ay * s,
                ay * ax * C + az * s, c + ay * ay * C, ay * az * C - ax * s,
                az * ax * C - ay * s, az * ay * C + ax * s, c + az * az * C,
            )
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
            tt = (t[0] + zero_row, t[1] + zero_row, t[2] + zero_row)
        elif jt == JOINT_PRISMATIC:
            d = link_dof[l]
            qv, qdv, qddv = row(q_ref, d), row(qd_ref, d), row(qdd_ref, d)
            R = tuple(Fi + zero_row for Fi in F)
            sl = rot(F, (ax, ay, az))
            tt = (t[0] + sl[0] * qv, t[1] + sl[1] * qv, t[2] + sl[2] * qv)
        else:
            qdv = qddv = None
            R = tuple(Fi + zero_row for Fi in F)
            tt = (t[0] + zero_row, t[1] + zero_row, t[2] + zero_row)
        Rl[l], tl[l] = R, tt

        w_p, v_p, dw_p, dv_p = w[par], v[par], dw[par], dv[par]
        w_c = rot_t(R, w_p)
        v_c = rot_t(R, add(v_p, cross(w_p, tt)))
        dw_c = rot_t(R, dw_p)
        dv_c = rot_t(R, add(dv_p, add(cross(dw_p, tt), cross(w_p, cross(w_p, tt)))))

        a3 = (ax + zero_row, ay + zero_row, az + zero_row)
        if jt == JOINT_REVOLUTE:
            wj = scale(a3, qdv)
            w[l] = add(w_c, wj)
            v[l] = v_c
            dw[l] = add(dw_c, add(scale(a3, qddv), cross(w_c, wj)))
            dv[l] = dv_c
        elif jt == JOINT_PRISMATIC:
            vj = scale(a3, qdv)
            w[l] = w_c
            v[l] = add(v_c, vj)
            dw[l] = dw_c
            dv[l] = add(dv_c, add(scale(a3, qddv), scale(cross(w_c, vj), 2.0)))
        else:
            w[l], v[l], dw[l], dv[l] = w_c, v_c, dw_c, dv_c

    # ---- backward sweep ----
    n_acc = [zero3] * L
    f_acc = [zero3] * L
    for l in range(L - 1, 0, -1):
        m = mass_ref[l, 0]
        c3 = (com_ref[l, 0], com_ref[l, 1], com_ref[l, 2])
        ixx, ixy, ixz = inertia_ref[l, 0], inertia_ref[l, 1], inertia_ref[l, 2]
        iyy, iyz, izz = inertia_ref[l, 3], inertia_ref[l, 4], inertia_ref[l, 5]

        def symm(vv):
            return (
                ixx * vv[0] + ixy * vv[1] + ixz * vv[2],
                ixy * vv[0] + iyy * vv[1] + iyz * vv[2],
                ixz * vv[0] + iyz * vv[1] + izz * vv[2],
            )

        a_c = add(dv[l], add(cross(dw[l], c3), cross(w[l], cross(w[l], c3))))
        f_new = scale(a_c, m)
        n_new = add(add(symm(dw[l]), cross(w[l], symm(w[l]))), cross(c3, f_new))
        f_tot = add(f_acc[l], f_new)
        n_tot = add(n_acc[l], n_new)

        jt = robot.joint_types[l]
        if jt != 0:
            d = link_dof[l]
            ax, ay, az = axis_ref[l, 0], axis_ref[l, 1], axis_ref[l, 2]
            src = n_tot if jt == JOINT_REVOLUTE else f_tot
            tau = ax * src[0] + ay * src[1] + az * src[2]
            if use_damping:
                tau = tau + damping_ref[d, 0] * row(qd_ref, d)
            tau_ref[d : d + 1, :] = tau

        par = robot.parent[l]
        f_p = rot(Rl[l], f_tot)
        n_p = add(rot(Rl[l], n_tot), cross(tl[l], f_p))
        f_acc[par] = add(f_acc[par], f_p)
        n_acc[par] = add(n_acc[par], n_p)


def _rnea_pallas_fwd_impl(
    robot: RobotStruct,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    qdd: jnp.ndarray,
    include_gravity: bool,
    use_damping: bool,
    gravity: float,
) -> jnp.ndarray:
    B, D = q.shape
    L = robot.n_links
    pad = (-B) % TILE_B
    qT = jnp.pad(q.T, ((0, 0), (0, pad)))
    qdT = jnp.pad(qd.T, ((0, 0), (0, pad)))
    qddT = jnp.pad(qdd.T, ((0, 0), (0, pad)))
    Bp = B + pad

    inertia6 = jnp.stack(
        [
            robot.inertia_com[:, 0, 0],
            robot.inertia_com[:, 0, 1],
            robot.inertia_com[:, 0, 2],
            robot.inertia_com[:, 1, 1],
            robot.inertia_com[:, 1, 2],
            robot.inertia_com[:, 2, 2],
        ],
        axis=-1,
    )

    kernel = functools.partial(_kernel, robot, include_gravity, use_damping, gravity)
    grid = (Bp // TILE_B,)
    batch_spec = pl.BlockSpec((D, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    tauT = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((D, Bp), q.dtype),
        grid=grid,
        in_specs=[
            batch_spec,
            batch_spec,
            batch_spec,
            const((L, 3)),
            const((L, 3)),
            const((L, 3)),
            const((L, 1)),
            const((L, 3)),
            const((L, 6)),
            const((D, 1)),
        ],
        out_specs=batch_spec,
    )(
        qT,
        qdT,
        qddT,
        robot.trans,
        robot.rot_angles,
        robot.axis,
        robot.mass[:, None],
        robot.com,
        inertia6,
        robot.damping[:, None],
    )
    return tauT[:, :B].T


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def rnea_pallas(
    robot: RobotStruct,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    qdd: jnp.ndarray,
    include_gravity: bool = True,
    use_damping: bool = True,
    gravity: float = GRAVITY,
) -> jnp.ndarray:
    """Batched inverse dynamics [B, D] -> [B, D], fused Pallas kernel.

    Forward runs the single-launch VMEM kernel; backward reuses the exact
    XLA scalar path's VJP (same math, gradients exact to roundoff).
    """
    return _rnea_pallas_fwd_impl(
        robot, q, qd, qdd, include_gravity, use_damping, gravity
    )


def _fwd(robot, q, qd, qdd, include_gravity, use_damping, gravity):
    out = _rnea_pallas_fwd_impl(
        robot, q, qd, qdd, include_gravity, use_damping, gravity
    )
    return out, (robot, q, qd, qdd)


def _bwd(include_gravity, use_damping, gravity, res, g):
    robot, q, qd, qdd = res

    def ref_fn(robot, q, qd, qdd):
        return jax.vmap(
            lambda a, b, c: rnea_scalar(
                robot, a, b, c, include_gravity, use_damping, gravity
            )
        )(q, qd, qdd)

    _, vjp = jax.vjp(ref_fn, robot, q, qd, qdd)
    return vjp(g)


rnea_pallas.defvjp(_fwd, _bwd)
