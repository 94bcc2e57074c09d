"""Scalar-expanded recursive Newton-Euler (the VPU-fusion fast path).

Same algorithm as the reference's iterative_newton_euler
(reference: robot_model.py:251-303) — textbook link-local RNEA — but every
3-vector/rotation lives as a tuple of scalars and the link loops unroll over
the static topology. Under `vmap` each scalar becomes a [B] lane vector and
XLA fuses the whole two-sweep recursion into a handful of elementwise VPU
kernels: no tiny matmuls, no [L,...] gathers, no layout churn. This is the
same transformation that made the rollout FK 42x faster
(ops/kinematics.py:fk_link_position).

The generic world-frame masked-matmul implementation (ops/dynamics.py:rnea)
remains as the readable/reference path; both are tested to agree to 1e-8.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.structs import JOINT_PRISMATIC, JOINT_REVOLUTE, RobotStruct
from .dynamics import GRAVITY

# Joint values are read with STATIC link->dof indexing (robot.dof_links is a
# hashable tuple), not a dof_select matmul: indexing is exact in any float
# mode (a [L,D]@[D] contraction would ride the MXU on TPU, where default-
# precision f32 matmuls round through bfloat16 passes), avoids a tiny-matmul
# dispatch, and — because the link loops unroll over the static topology —
# costs nothing at trace time. It also lets every function here take
# TRAILING batch axes (q: [D] or [D, B...]): all the scalar-tuple math is
# elementwise, so a dof-major [D, B] call runs the whole algorithm on [B]
# lanes with zero layout churn (the batched-MPC fast path).


def _link_dof_map(robot: RobotStruct):
    return {l: d for d, l in enumerate(robot.dof_links)}


# ---- scalar-triple helpers (tuples of traced scalars / [B] lanes) ----------


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _rot(R, v):
    """R @ v with R a 9-tuple (row major)."""
    return (
        R[0] * v[0] + R[1] * v[1] + R[2] * v[2],
        R[3] * v[0] + R[4] * v[1] + R[5] * v[2],
        R[6] * v[0] + R[7] * v[1] + R[8] * v[2],
    )


def _rot_t(R, v):
    """R^T @ v."""
    return (
        R[0] * v[0] + R[3] * v[1] + R[6] * v[2],
        R[1] * v[0] + R[4] * v[1] + R[7] * v[2],
        R[2] * v[0] + R[5] * v[1] + R[8] * v[2],
    )


def _symm(M, v):
    """Symmetric 3x3 (6-tuple xx,xy,xz,yy,yz,zz) @ v."""
    xx, xy, xz, yy, yz, zz = M
    return (
        xx * v[0] + xy * v[1] + xz * v[2],
        xy * v[0] + yy * v[1] + yz * v[2],
        xz * v[0] + yz * v[1] + zz * v[2],
    )


def _local_rotation(robot: RobotStruct, l: int, q_l):
    """Local joint rotation R_rpy @ R_axis(q) as a 9-tuple of scalars.

    Mirrors the joint pose construction at reference rigid_body.py:138-156,
    generalized to arbitrary axes.
    """
    roll, pitch, yaw = (
        robot.rot_angles[l, 0],
        robot.rot_angles[l, 1],
        robot.rot_angles[l, 2],
    )
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    F = (
        cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr,
        sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr,
        -sp, cp * sr, cp * cr,
    )
    if robot.joint_types[l] != JOINT_REVOLUTE:
        return F
    ax, ay, az = robot.axis[l, 0], robot.axis[l, 1], robot.axis[l, 2]
    c, s = jnp.cos(q_l), jnp.sin(q_l)
    C = 1.0 - c
    J = (
        c + ax * ax * C, ax * ay * C - az * s, ax * az * C + ay * s,
        ay * ax * C + az * s, c + ay * ay * C, ay * az * C - ax * s,
        az * ax * C - ay * s, az * ay * C + ax * s, c + az * az * C,
    )
    return (
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


def rnea_scalar(
    robot: RobotStruct,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    qdd: jnp.ndarray,
    include_gravity: bool = True,
    use_damping: bool = True,
    gravity: float = GRAVITY,
) -> jnp.ndarray:
    """Inverse dynamics ([D] -> [D], or dof-major [D, B...] -> [D, B...]),
    fully scalar-expanded.

    Behavioral parity with reference compute_inverse_dynamics
    (robot_model.py:306-375): gravity as +g z base acceleration (d'Alembert,
    :344-347), damping added to torques (:368-373).
    """
    L = robot.n_links
    dtype = q.dtype
    zero = jnp.zeros(q.shape[1:], dtype)
    ld = _link_dof_map(robot)
    q_link = [q[ld[l]] if l in ld else zero for l in range(L)]
    qd_link = [qd[ld[l]] if l in ld else zero for l in range(L)]
    qdd_link = [qdd[ld[l]] if l in ld else zero for l in range(L)]

    # Forward sweep: local-frame velocities/accelerations per link.
    w = [(zero, zero, zero)] * L  # angular velocity
    v = [(zero, zero, zero)] * L  # linear velocity
    dw = [(zero, zero, zero)] * L  # angular acceleration
    dv = [(zero, zero, zero)] * L  # linear acceleration
    Rl = [None] * L  # local rotations (for the backward sweep)
    tl = [None] * L

    g = (zero, zero, jnp.asarray(gravity, dtype)) if include_gravity else (zero, zero, zero)
    dv[0] = g

    for l in range(1, L):
        par = robot.parent[l]
        jt = robot.joint_types[l]
        R = _local_rotation(robot, l, q_link[l])
        t = (robot.trans[l, 0], robot.trans[l, 1], robot.trans[l, 2])
        a = (robot.axis[l, 0], robot.axis[l, 1], robot.axis[l, 2])
        if jt == JOINT_PRISMATIC:
            # prismatic offset slides along the joint-frame axis
            F = _local_rotation(robot, l, zero)  # R_rpy only
            t = _add(t, _scale(_rot(F, a), q_link[l]))
        Rl[l], tl[l] = R, t

        # motion transform child <- parent: w_c = R^T w_p ;
        # v_c = R^T (v_p + w_p x t)   [linear velocity of the child origin]
        w_p, v_p = w[par], v[par]
        w_c = _rot_t(R, w_p)
        v_c = _rot_t(R, _add(v_p, _cross(w_p, t)))
        dw_p, dv_p = dw[par], dv[par]
        dw_c = _rot_t(R, dw_p)
        dv_c = _rot_t(R, _add(dv_p, _add(_cross(dw_p, t), _cross(w_p, _cross(w_p, t)))))

        if jt == JOINT_REVOLUTE:
            wj = _scale(a, qd_link[l])
            w[l] = _add(w_c, wj)
            v[l] = v_c
            dw[l] = _add(dw_c, _add(_scale(a, qdd_link[l]), _cross(w_c, wj)))
            dv[l] = dv_c
        elif jt == JOINT_PRISMATIC:
            vj = _scale(a, qd_link[l])
            w[l] = w_c
            v[l] = _add(v_c, vj)
            dw[l] = dw_c
            dv[l] = _add(dv_c, _add(_scale(a, qdd_link[l]), _scale(_cross(w_c, vj), 2.0)))
        else:  # fixed
            w[l], v[l], dw[l], dv[l] = w_c, v_c, dw_c, dv_c

    # Backward sweep: forces about each link origin, accumulated to parents.
    n_f = [(zero, zero, zero)] * L  # moment
    f_f = [(zero, zero, zero)] * L  # force
    tau_link = [zero] * L
    for l in range(L - 1, 0, -1):
        m = robot.mass[l]
        c = (robot.com[l, 0], robot.com[l, 1], robot.com[l, 2])
        I6 = (
            robot.inertia_com[l, 0, 0], robot.inertia_com[l, 0, 1],
            robot.inertia_com[l, 0, 2], robot.inertia_com[l, 1, 1],
            robot.inertia_com[l, 1, 2], robot.inertia_com[l, 2, 2],
        )
        # Newton: f = m (a_c) with a_c = dv + dw x c + w x (w x c)
        a_c = _add(dv[l], _add(_cross(dw[l], c), _cross(w[l], _cross(w[l], c))))
        f_new = _scale(a_c, m)
        # Euler about COM, then shift to the link origin:
        # n = I_c dw + w x I_c w + c x f
        n_new = _add(
            _add(_symm(I6, dw[l]), _cross(w[l], _symm(I6, w[l]))),
            _cross(c, f_new),
        )
        f_tot = _add(f_f[l], f_new)
        n_tot = _add(n_f[l], n_new)

        jt = robot.joint_types[l]
        a = (robot.axis[l, 0], robot.axis[l, 1], robot.axis[l, 2])
        if jt == JOINT_REVOLUTE:
            tau_link[l] = _dot(a, n_tot)
        elif jt == JOINT_PRISMATIC:
            tau_link[l] = _dot(a, f_tot)

        par = robot.parent[l]
        R, t = Rl[l], tl[l]
        f_p = _rot(R, f_tot)
        n_p = _add(_rot(R, n_tot), _cross(t, f_p))
        f_f[par] = _add(f_f[par], f_p)
        n_f[par] = _add(n_f[par], n_p)

    # Gather dof torques with the one-hot contraction instead of stacking the
    # per-dof chains directly: the dot is a fusion BARRIER for XLA:CPU, whose
    # fusion emitter goes pathological on a concatenate root whose operands
    # share the deep backward-sweep subgraph (measured: 217 s vs 2 s compile
    # for this one line on the 1-core host). HIGHEST precision keeps the
    # one-hot select exact on the TPU MXU (default-precision f32 dots round
    # through bfloat16 passes).
    tau = jnp.einsum(
        "l...,ld->d...",
        jnp.stack(tau_link),
        robot.dof_select,
        precision=jax.lax.Precision.HIGHEST,
    )
    if use_damping:
        damping = robot.damping.reshape(robot.damping.shape + (1,) * (qd.ndim - 1))
        tau = tau + damping * qd
    return tau


# ---------------------------------------------------------------------------
# Scalar-expanded CRB mass matrix + unrolled LDL^T solve + forward dynamics
# ---------------------------------------------------------------------------


def _world_poses_scalar(robot: RobotStruct, q):
    """World (Rw 9-tuple, pw 3-tuple) per link via a topological sweep.

    q is dof-indexed: [D] or dof-major [D, B...] (scalars become [B] lanes).
    """
    L = robot.n_links
    dtype = q.dtype
    one = jnp.ones(q.shape[1:], dtype)
    zero = jnp.zeros(q.shape[1:], dtype)
    ld = _link_dof_map(robot)
    q_link = [q[ld[l]] if l in ld else zero for l in range(L)]
    Rw = [None] * L
    pw = [None] * L
    Rw[0] = (one, zero, zero, zero, one, zero, zero, zero, one)
    pw[0] = (zero, zero, zero)
    for l in range(1, L):
        par = robot.parent[l]
        R = _local_rotation(robot, l, q_link[l])
        t = (robot.trans[l, 0], robot.trans[l, 1], robot.trans[l, 2])
        if robot.joint_types[l] == JOINT_PRISMATIC:
            F = _local_rotation(robot, l, zero)
            t = _add(t, _scale(_rot(F, (robot.axis[l, 0], robot.axis[l, 1], robot.axis[l, 2])), q_link[l]))
        Rp, pp = Rw[par], pw[par]
        pw[l] = _add(pp, _rot(Rp, t))
        Rw[l] = (
            Rp[0] * R[0] + Rp[1] * R[3] + Rp[2] * R[6],
            Rp[0] * R[1] + Rp[1] * R[4] + Rp[2] * R[7],
            Rp[0] * R[2] + Rp[1] * R[5] + Rp[2] * R[8],
            Rp[3] * R[0] + Rp[4] * R[3] + Rp[5] * R[6],
            Rp[3] * R[1] + Rp[4] * R[4] + Rp[5] * R[7],
            Rp[3] * R[2] + Rp[4] * R[5] + Rp[5] * R[8],
            Rp[6] * R[0] + Rp[7] * R[3] + Rp[8] * R[6],
            Rp[6] * R[1] + Rp[7] * R[4] + Rp[8] * R[7],
            Rp[6] * R[2] + Rp[7] * R[5] + Rp[8] * R[8],
        )
    return Rw, pw


def _rot_symm_rot_t(R, I6):
    """R @ I @ R^T for symmetric I (6-tuple), returning the 6-tuple."""
    # A = R @ I  (A[i][j] = sum_k R[i,k] I[k,j])
    rows = []
    for i in range(3):
        r = (R[3 * i], R[3 * i + 1], R[3 * i + 2])
        rows.append(_symm(I6, r))  # I sym => I @ r == row i of R @ I
    # B = A @ R^T, upper triangle only
    def entry(i, j):
        return (
            rows[i][0] * R[3 * j]
            + rows[i][1] * R[3 * j + 1]
            + rows[i][2] * R[3 * j + 2]
        )

    return (entry(0, 0), entry(0, 1), entry(0, 2), entry(1, 1), entry(1, 2), entry(2, 2))


def mass_matrix_scalar(robot: RobotStruct, q: jnp.ndarray) -> jnp.ndarray:
    """Joint-space inertia matrix H(q): [D, D] (or [D, D, B...] for dof-major
    q [D, B...]), scalar-expanded world-frame composite-rigid-body.

    Same math as dynamics.mass_matrix_given_fk (reference
    compute_lagrangian_inertia_matrix, robot_model.py:403-450) with every
    quantity held as scalars: under vmap (or trailing [B] lanes) the whole
    CRB is a few fused elementwise VPU kernels, ~10x faster than the
    [L,6,6]-stacked einsum formulation at MPC batch sizes.
    """
    L = robot.n_links
    D = robot.n_dofs
    dtype = q.dtype
    zero = jnp.zeros(q.shape[1:], dtype)
    Rw, pw = _world_poses_scalar(robot, q)

    # Per-link composite params about the WORLD ORIGIN: (m, h = m*com_w,
    # I_o = i_cw + m (|c|^2 E - c c^T)); composites accumulate child->parent.
    m_c = [zero] * L
    h_c = [(zero, zero, zero)] * L
    I_c = [(zero,) * 6] * L
    for l in range(L):
        m = robot.mass[l]
        c_loc = (robot.com[l, 0], robot.com[l, 1], robot.com[l, 2])
        cw = _add(pw[l], _rot(Rw[l], c_loc))
        I6_loc = (
            robot.inertia_com[l, 0, 0], robot.inertia_com[l, 0, 1],
            robot.inertia_com[l, 0, 2], robot.inertia_com[l, 1, 1],
            robot.inertia_com[l, 1, 2], robot.inertia_com[l, 2, 2],
        )
        icw = _rot_symm_rot_t(Rw[l], I6_loc)
        cx, cy, cz = cw
        I_o = (
            icw[0] + m * (cy * cy + cz * cz),
            icw[1] - m * cx * cy,
            icw[2] - m * cx * cz,
            icw[3] + m * (cx * cx + cz * cz),
            icw[4] - m * cy * cz,
            icw[5] + m * (cx * cx + cy * cy),
        )
        m_c[l] = m + zero
        h_c[l] = _scale(cw, m)
        I_c[l] = I_o

    for l in range(L - 1, 0, -1):
        par = robot.parent[l]
        m_c[par] = m_c[par] + m_c[l]
        h_c[par] = _add(h_c[par], h_c[l])
        I_c[par] = tuple(a + b for a, b in zip(I_c[par], I_c[l]))

    # World joint subspaces (referenced to the world origin) per dof.
    dof_of = list(robot.dof_links)
    S_w = []
    anc_dofs = []  # per dof: list of dof indices on its root-chain (incl self)
    for d, l in enumerate(dof_of):
        a = (robot.axis[l, 0], robot.axis[l, 1], robot.axis[l, 2])
        z = _rot(Rw[l], a)
        if robot.joint_types[l] == JOINT_REVOLUTE:
            S_w.append((z, _cross(pw[l], z)))
        else:  # prismatic
            S_w.append(((zero, zero, zero), z))
        chain_dofs = []
        k = l
        while k != 0:
            if robot.joint_types[k] != 0:
                chain_dofs.append(dof_of.index(k))
            k = robot.parent[k]
        anc_dofs.append(chain_dofs)

    # F_j = Ic_j S_j ;  H_ij = <S_i, F_j> for i in anc*(j).
    rows = [[zero] * D for _ in range(D)]
    for j in range(D):
        lj = dof_of[j]
        wv, vv = S_w[j]
        n = _add(_symm(I_c[lj], wv), _cross(h_c[lj], vv))
        f = _sub(_scale(vv, m_c[lj]), _cross(h_c[lj], wv))
        for i in anc_dofs[j]:
            wi, vi = S_w[i]
            hij = _dot(wi, n) + _dot(vi, f)
            rows[i][j] = hij
            rows[j][i] = hij
    return jnp.stack([jnp.stack(r) for r in rows])


def ldl_solve_scalar(H: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve H x = b for symmetric positive-definite H: [D, D], b: [D]
    (or trailing-batched H [D, D, B...], b [D, B...]) — fully unrolled
    LDL^T (no sqrt, no pivoting).

    XLA's batched Cholesky on [B, D, D] stacks measures ~3.5 ms at B=4096
    D=7 on v5e; this unrolled form is pure elementwise math that fuses under
    vmap like everything else in this module (~50x cheaper).
    """
    D = H.shape[0]
    out_dtype = H.dtype
    # sub-float32 (bfloat16) elimination is numerically meaningless; compute
    # in float32 and cast back (same policy as dynamics.jax_sym_solve).
    compute_dtype = jnp.promote_types(out_dtype, jnp.float32)
    H = H.astype(compute_dtype)
    b = b.astype(compute_dtype)
    Hl = [[H[i, j] for j in range(D)] for i in range(D)]
    bl = [b[i] for i in range(D)]
    L_ = [[None] * D for _ in range(D)]
    d = [None] * D
    for j in range(D):
        s = Hl[j][j]
        for k in range(j):
            s = s - L_[j][k] * L_[j][k] * d[k]
        d[j] = s
        inv_dj = 1.0 / s
        for i in range(j + 1, D):
            s2 = Hl[i][j]
            for k in range(j):
                s2 = s2 - L_[i][k] * L_[j][k] * d[k]
            L_[i][j] = s2 * inv_dj
    # forward: L z = b
    z = [None] * D
    for i in range(D):
        s = bl[i]
        for k in range(i):
            s = s - L_[i][k] * z[k]
        z[i] = s
    # diag + backward: L^T x = D^-1 z
    x = [None] * D
    for i in range(D - 1, -1, -1):
        s = z[i] / d[i]
        for k in range(i + 1, D):
            s = s - L_[k][i] * x[k]
        x[i] = s
    return jnp.stack(x).astype(out_dtype)


def forward_dynamics_scalar(
    robot: RobotStruct,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    f: jnp.ndarray,
    include_gravity: bool = True,
    use_damping: bool = False,
    gravity: float = GRAVITY,
) -> jnp.ndarray:
    """Forward dynamics qdd = H^-1 (f - nle), all three stages scalar-expanded
    (NLE via rnea_scalar, H via mass_matrix_scalar, solve via unrolled LDL^T).

    Same semantics as dynamics.forward_dynamics_crb / reference
    compute_forward_dynamics_old (robot_model.py:453-485); ~6x faster at
    B=4096 on v5e (the batched-Cholesky and [L,6,6]-einsum stages dominate
    the generic path).
    """
    nle = rnea_scalar(robot, q, qd, jnp.zeros_like(q), include_gravity, use_damping, gravity)
    H = mass_matrix_scalar(robot, q)
    return ldl_solve_scalar(H, f - nle)
