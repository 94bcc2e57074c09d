"""Fused dynamic-rollout Pallas kernel: H forward-dynamics integration steps
in ONE kernel launch (and the whole reverse sweep in one more).

This is the SURVEY.md §7 step-4 artifact ("rollout kernel: integrate H steps
without HBM round-trips") and the round-2 verdict's top lever: the lax.scan
rollout emits ~20-40 XLA fusions per integration step, each round-tripping
[D, B] intermediates through HBM, so a B=1 replan is dispatch-latency-bound
(~1000 dependent kernels). Here the whole horizon runs inside one Pallas
kernel: joint state lives in registers/VMEM as per-dof [SUB, LANE] lanes, a
`lax.fori_loop` walks the horizon (link loops unroll over the static
topology), and every robot constant is baked in as a float32 immediate via
the trace-time folding helpers (ops/pallas/_fold.py).

The step math is an exact port of the scan path's
`trajopt.rollout.fd_step_implicit_damping` + velocity clamp
(trajopt/rollout.py:190-311): NLE via RNEA (reference robot_model.py:251-303
with qdd=0), world-frame composite-rigid-body mass matrix (reference
compute_lagrangian_inertia_matrix semantics, robot_model.py:403-450),
implicit viscous damping on the diagonal, unrolled LDL^T solve, semi-implicit
Euler with the URDF velocity clamp. Constants are rounded to float32 BEFORE
Python-side folding so single constant*array products equal the device's
f32 multiplies exactly.

Backward pass: a second kernel runs the adjoint recursion in one launch —
per step it replays the forward step from the SAVED state trajectory and
applies `jax.vjp` of the step function *inside the kernel trace* (the step
is pure jnp math on [SUB, LANE] blocks, so its VJP lowers to Mosaic like
any other ops). Exact gradients, no hand-derived adjoint, one launch for
all H reverse steps. When the caller also demands cotangents w.r.t. the
velocity trajectory (the MPC cost never does), the VJP falls back to the
scan path's gradient (same math) rather than paying a second kernel's VMEM.

Frozen-robot (concrete float32 struct) mode only — a traced robot (robot-
parameter differentiation) falls back to the scan path, which differentiates
w.r.t. everything.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.structs import JOINT_PRISMATIC, JOINT_REVOLUTE, RobotStruct
from ..dynamics import GRAVITY
from . import _fold as f
from .fk import _axis_entries, _rpy_entries, _trans_entries
from .rnea import _concrete_consts as _rnea_consts

# The rollout keeps [H, D] per-dof state blocks resident, so the batch tile
# is the minimum f32 tile (8 sublanes x 128 lanes) rather than fk.py's wide
# 8x1024: at H=50, D=7 the saved trajectories are ~1.4 MB per array per tile
# and the backward kernel holds five of them double-buffered.
SUB_R = 8
LANE_R = 128
TILE_R = SUB_R * LANE_R


def _consts(robot: RobotStruct):
    """Frozen-robot constants (rnea's dict + velocity bounds), or None."""
    c = _rnea_consts(robot)
    if c is None:
        return None
    v = np.asarray(robot.limit_velocity, np.float32)
    c = dict(c)
    c["vmax"] = np.where(v > 0, v, np.inf)
    return c


def _f32(v) -> float:
    return float(np.float32(v))


def _fd_step_folded(
    robot: RobotStruct,
    c: dict,
    dt: float,
    include_gravity: bool,
    use_damping: bool,
    gravity: float,
    q,  # tuple of D [SUB, LANE] arrays
    qd,
    tau,
):
    """One semi-implicit Euler forward-dynamics step on per-dof lanes.

    Port of `fd_step_implicit_damping` + the velocity clamp of
    `dynamic_rollout_dof_major` (trajopt/rollout.py) with every robot
    constant folded as a float32 immediate. Returns (q_next, qd_next)
    tuples. Pure jnp math — differentiable at trace time (the backward
    kernel takes jax.vjp of this function).
    """
    L = robot.n_links
    D = robot.n_dofs
    link_dof = {l: d for d, l in enumerate(robot.dof_links)}
    dtf = _f32(dt)

    # ---- local joint rotations/translations (shared by NLE and CRB) ----
    Rl = [None] * L
    tl = [None] * L
    for l in range(1, L):
        jt = robot.joint_types[l]
        F = _rpy_entries(robot, None, l, c)
        a3 = _axis_entries(robot, None, l, c)
        t = _trans_entries(robot, None, l, c)
        if jt == JOINT_REVOLUTE:
            qv = q[link_dof[l]]
            cs, sn = jnp.cos(qv), jnp.sin(qv)
            R = f.mat3(F, f.rodrigues(a3[0], a3[1], a3[2], cs, sn))
        elif jt == JOINT_PRISMATIC:
            R = F
            sl = f.rot(F, a3)
            t = f.v_add(t, f.v_scale(sl, q[link_dof[l]]))
        else:
            R = F
        Rl[l], tl[l] = R, t

    # ---- NLE: RNEA with qdd = 0 (reference robot_model.py:251-303) ----
    zero3 = (0.0, 0.0, 0.0)
    w = [zero3] * L
    v = [zero3] * L
    dw = [zero3] * L
    dv = [zero3] * L
    dv[0] = (0.0, 0.0, _f32(gravity) if include_gravity else 0.0)

    for l in range(1, L):
        par = robot.parent[l]
        jt = robot.joint_types[l]
        R, tt = Rl[l], tl[l]
        a3 = _axis_entries(robot, None, l, c)

        w_p, v_p, dw_p, dv_p = w[par], v[par], dw[par], dv[par]
        w_c = f.rot_t(R, w_p)
        v_c = f.rot_t(R, f.v_add(v_p, f.v_cross(w_p, tt)))
        dw_c = f.rot_t(R, dw_p)
        dv_c = f.rot_t(
            R,
            f.v_add(
                dv_p,
                f.v_add(f.v_cross(dw_p, tt), f.v_cross(w_p, f.v_cross(w_p, tt))),
            ),
        )
        if jt == JOINT_REVOLUTE:
            wj = f.v_scale(a3, qd[link_dof[l]])
            w[l] = f.v_add(w_c, wj)
            v[l] = v_c
            dw[l] = f.v_add(dw_c, f.v_cross(w_c, wj))
            dv[l] = dv_c
        elif jt == JOINT_PRISMATIC:
            vj = f.v_scale(a3, qd[link_dof[l]])
            w[l] = w_c
            v[l] = f.v_add(v_c, vj)
            dw[l] = dw_c
            dv[l] = f.v_add(dv_c, f.v_scale(f.v_cross(w_c, vj), 2.0))
        else:
            w[l], v[l], dw[l], dv[l] = w_c, v_c, dw_c, dv_c

    n_acc = [zero3] * L
    f_acc = [zero3] * L
    nle = [0.0] * D
    for l in range(L - 1, 0, -1):
        mass = _f32(c["mass"][l])
        c3 = tuple(_f32(x) for x in c["com"][l])
        I6 = tuple(_f32(x) for x in c["inertia6"][l])

        a_c = f.v_add(
            dv[l], f.v_add(f.v_cross(dw[l], c3), f.v_cross(w[l], f.v_cross(w[l], c3)))
        )
        f_new = f.v_scale(a_c, mass)
        n_new = f.v_add(
            f.v_add(f.symm3(I6, dw[l]), f.v_cross(w[l], f.symm3(I6, w[l]))),
            f.v_cross(c3, f_new),
        )
        f_tot = f.v_add(f_acc[l], f_new)
        n_tot = f.v_add(n_acc[l], n_new)

        jt = robot.joint_types[l]
        if jt != 0:
            d = link_dof[l]
            a3 = _axis_entries(robot, None, l, c)
            src = n_tot if jt == JOINT_REVOLUTE else f_tot
            t_d = f.v_dot(a3, src)
            if use_damping:
                t_d = f.add(t_d, f.m(_f32(c["damping"][d]), qd[d]))
            nle[d] = t_d

        par = robot.parent[l]
        f_p = f.rot(Rl[l], f_tot)
        n_p = f.v_add(f.rot(Rl[l], n_tot), f.v_cross(tl[l], f_p))
        f_acc[par] = f.v_add(f_acc[par], f_p)
        n_acc[par] = f.v_add(n_acc[par], n_p)

    # ---- CRB mass matrix (port of dynamics_scalar.mass_matrix_scalar) ----
    ident9 = f._IDENTITY9
    Rw = [None] * L
    pw = [None] * L
    Rw[0], pw[0] = ident9, zero3
    for l in range(1, L):
        par = robot.parent[l]
        pw[l] = f.v_add(pw[par], f.rot(Rw[par], tl[l]))
        Rw[l] = f.mat3(Rw[par], Rl[l])

    def rot_symm_rot_t(R, I6):
        rows = [f.symm3(I6, (R[3 * i], R[3 * i + 1], R[3 * i + 2])) for i in range(3)]

        def entry(i, j):
            return f.add(
                f.m(rows[i][0], R[3 * j]),
                f.m(rows[i][1], R[3 * j + 1]),
                f.m(rows[i][2], R[3 * j + 2]),
            )

        return (entry(0, 0), entry(0, 1), entry(0, 2), entry(1, 1), entry(1, 2), entry(2, 2))

    m_c = [0.0] * L
    h_c = [zero3] * L
    I_c = [(0.0,) * 6] * L
    for l in range(L):
        mass = _f32(c["mass"][l])
        com = tuple(_f32(x) for x in c["com"][l])
        I6loc = tuple(_f32(x) for x in c["inertia6"][l])
        cw = f.v_add(pw[l], f.rot(Rw[l], com))
        icw = rot_symm_rot_t(Rw[l], I6loc)
        cx, cy, cz = cw
        I_c[l] = (
            f.add(icw[0], f.m(mass, f.add(f.m(cy, cy), f.m(cz, cz)))),
            f.sub(icw[1], f.m(mass, f.m(cx, cy))),
            f.sub(icw[2], f.m(mass, f.m(cx, cz))),
            f.add(icw[3], f.m(mass, f.add(f.m(cx, cx), f.m(cz, cz)))),
            f.sub(icw[4], f.m(mass, f.m(cy, cz))),
            f.add(icw[5], f.m(mass, f.add(f.m(cx, cx), f.m(cy, cy)))),
        )
        m_c[l] = mass
        h_c[l] = f.v_scale(cw, mass)

    for l in range(L - 1, 0, -1):
        par = robot.parent[l]
        m_c[par] = f.add(m_c[par], m_c[l])
        h_c[par] = f.v_add(h_c[par], h_c[l])
        I_c[par] = tuple(f.add(a, b) for a, b in zip(I_c[par], I_c[l]))

    dof_of = list(robot.dof_links)
    S_w = []
    anc_dofs = []
    for d, l in enumerate(dof_of):
        a3 = _axis_entries(robot, None, l, c)
        z = f.rot(Rw[l], a3)
        if robot.joint_types[l] == JOINT_REVOLUTE:
            S_w.append((z, f.v_cross(pw[l], z)))
        else:
            S_w.append((zero3, z))
        chain = []
        k = l
        while k != 0:
            if robot.joint_types[k] != 0:
                chain.append(dof_of.index(k))
            k = robot.parent[k]
        anc_dofs.append(chain)

    rows = [[0.0] * D for _ in range(D)]
    for j in range(D):
        lj = dof_of[j]
        wv, vv = S_w[j]
        n = f.v_add(f.symm3(I_c[lj], wv), f.v_cross(h_c[lj], vv))
        fo = f.v_sub(f.v_scale(vv, m_c[lj]), f.v_cross(h_c[lj], wv))
        for i in anc_dofs[j]:
            wi, vi = S_w[i]
            hij = f.add(f.v_dot(wi, n), f.v_dot(vi, fo))
            rows[i][j] = hij
            rows[j][i] = hij

    if use_damping:
        for d in range(D):
            rows[d][d] = f.add(rows[d][d], _f32(dtf * _f32(c["damping"][d])))

    # ---- unrolled LDL^T solve (port of dynamics_scalar.ldl_solve_scalar) ----
    b = [f.sub(tau[d], nle[d]) for d in range(D)]
    Lf = [[None] * D for _ in range(D)]
    dg = [None] * D
    for j in range(D):
        s = rows[j][j]
        for k in range(j):
            s = f.sub(s, f.m(f.m(Lf[j][k], Lf[j][k]), dg[k]))
        dg[j] = s
        inv_dj = 1.0 / s
        for i in range(j + 1, D):
            s2 = rows[i][j]
            for k in range(j):
                s2 = f.sub(s2, f.m(f.m(Lf[i][k], Lf[j][k]), dg[k]))
            Lf[i][j] = f.m(s2, inv_dj)
    z = [None] * D
    for i in range(D):
        s = b[i]
        for k in range(i):
            s = f.sub(s, f.m(Lf[i][k], z[k]))
        z[i] = s
    qdd = [None] * D
    for i in range(D - 1, -1, -1):
        s = z[i] / dg[i]
        for k in range(i + 1, D):
            s = f.sub(s, f.m(Lf[k][i], qdd[k]))
        qdd[i] = s

    # ---- integrate + URDF velocity clamp ----
    q_next = []
    qd_next = []
    for d in range(D):
        x = f.add(qd[d], f.m(dtf, qdd[d]))
        vm = float(c["vmax"][d])
        if np.isfinite(vm):
            vmf = _f32(vm)
            x = jnp.clip(x, -vmf, vmf)
        qd_next.append(x)
        q_next.append(f.add(q[d], f.m(dtf, x)))
    return tuple(q_next), tuple(qd_next)


def _ee_fk_folded(robot: RobotStruct, c: dict, q, ee_link_idx: int):
    """World position of one link's frame origin at config `q` (per-dof
    [SUB, LANE] lanes), ancestor chain only — the same composition as
    ops/kinematics.fk_link_position_dof_first, with robot constants folded
    as float32 immediates. Used to emit the end-effector trajectory from
    inside the rollout kernel (fuses the MPC cost's FK into the kernel)."""
    link_dof = {l: d for d, l in enumerate(robot.dof_links)}
    chain = []
    k = ee_link_idx
    while k != 0:
        chain.append(k)
        k = robot.parent[k]
    chain.reverse()

    Rw = f._IDENTITY9
    pw = (0.0, 0.0, 0.0)
    for l in chain:
        jt = robot.joint_types[l]
        F = _rpy_entries(robot, None, l, c)
        a3 = _axis_entries(robot, None, l, c)
        t = _trans_entries(robot, None, l, c)
        if jt == JOINT_REVOLUTE:
            qv = q[link_dof[l]]
            cs, sn = jnp.cos(qv), jnp.sin(qv)
            R = f.mat3(F, f.rodrigues(a3[0], a3[1], a3[2], cs, sn))
        elif jt == JOINT_PRISMATIC:
            R = F
            t = f.v_add(t, f.v_scale(f.rot(F, a3), q[link_dof[l]]))
        else:
            R = F
        pw = f.v_add(pw, f.rot(Rw, t))
        Rw = f.mat3(Rw, R)
    # A planar robot (e.g. the 2-link) folds one or more WORLD coordinates
    # to a trace-time constant — the folding helpers collapse them because
    # no joint on the chain moves that axis. Materialize constants to lane
    # tiles: the kernel stores pe[j] into (SUB, LANE) slots, and the
    # backward kernel's jax.vjp receives tile-shaped cotangents for every
    # pe component, so a scalar here is a shape error in both directions
    # (found by the round-4 fleet fast path, the first non-iiwa user of
    # the EE-fused kernel).
    zero = 0.0 * q[0]

    def tile(p):
        return p if getattr(p, "shape", None) == zero.shape else p + zero

    return tuple(tile(p) for p in pw)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _spec(K):
    return pl.BlockSpec(
        (K, 1, SUB_R, LANE_R), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )


def _fwd_kernel(
    robot, c, H, dt, include_gravity, use_damping, gravity,
    q0_ref, qd0_ref, tau_ref, qs_ref, qds_ref,
):
    D = robot.n_dofs
    q0 = tuple(q0_ref[d] for d in range(D))
    qd0 = tuple(qd0_ref[d] for d in range(D))

    def body(h, carry):
        q, qd = carry
        tau = tuple(tau_ref[h * D + d] for d in range(D))
        qn, qdn = _fd_step_folded(
            robot, c, dt, include_gravity, use_damping, gravity, q, qd, tau
        )
        for d in range(D):
            qs_ref[h * D + d] = qn[d]
            qds_ref[h * D + d] = qdn[d]
        return (qn, qdn)

    jax.lax.fori_loop(0, H, body, (q0, qd0))


def _bwd_kernel(
    robot, c, H, dt, include_gravity, use_damping, gravity,
    q0_ref, qd0_ref, tau_ref, qs_ref, qds_ref, gqs_ref,
    gtau_ref, gq0_ref, gqd0_ref,
):
    """Adjoint recursion, one launch: replay step h from the saved state
    trajectory, pull the accumulated cotangent back through `jax.vjp` of the
    step function (traced inside the kernel), emit dtau[h], carry (gq, gqd).
    Only position-trajectory cotangents enter (the MPC cost reads qs only);
    velocity-trajectory cotangents route to the scan-path fallback."""
    D = robot.n_dofs
    shape = (SUB_R, LANE_R)
    dtype = gtau_ref.dtype

    def step_fn(q, qd, tau):
        return _fd_step_folded(
            robot, c, dt, include_gravity, use_damping, gravity, q, qd, tau
        )

    zeros = tuple(jnp.zeros(shape, dtype) for _ in range(D))

    def body(i, carry):
        gq, gqd = carry
        h = H - 1 - i
        hm = jnp.maximum(h - 1, 0)
        is0 = h == 0
        qp, qdp, tau = [], [], []
        for d in range(D):
            qp.append(jnp.where(is0, q0_ref[d], qs_ref[hm * D + d]))
            qdp.append(jnp.where(is0, qd0_ref[d], qds_ref[hm * D + d]))
            tau.append(tau_ref[h * D + d])
        gq_in = tuple(gq[d] + gqs_ref[h * D + d] for d in range(D))
        _, pull = jax.vjp(step_fn, tuple(qp), tuple(qdp), tuple(tau))
        dq, dqd, dtau = pull((gq_in, gqd))
        for d in range(D):
            gtau_ref[h * D + d] = dtau[d]
        return (dq, dqd)

    gq, gqd = jax.lax.fori_loop(0, H, body, (zeros, zeros))
    for d in range(D):
        gq0_ref[d] = gq[d]
        gqd0_ref[d] = gqd[d]


def _fwd_ee_kernel(
    robot, c, H, dt, include_gravity, use_damping, gravity, ee,
    q0_ref, qd0_ref, tau_ref, qs_ref, qds_ref, ps_ref,
):
    """Forward rollout + per-step end-effector position, one launch."""
    D = robot.n_dofs
    q0 = tuple(q0_ref[d] for d in range(D))
    qd0 = tuple(qd0_ref[d] for d in range(D))

    def body(h, carry):
        q, qd = carry
        tau = tuple(tau_ref[h * D + d] for d in range(D))
        qn, qdn = _fd_step_folded(
            robot, c, dt, include_gravity, use_damping, gravity, q, qd, tau
        )
        pe = _ee_fk_folded(robot, c, qn, ee)
        for d in range(D):
            qs_ref[h * D + d] = qn[d]
            qds_ref[h * D + d] = qdn[d]
        for j in range(3):
            ps_ref[h * 3 + j] = pe[j]
        return (qn, qdn)

    jax.lax.fori_loop(0, H, body, (q0, qd0))


def _bwd_ee_kernel(
    robot, c, H, dt, include_gravity, use_damping, gravity, ee,
    q0_ref, qd0_ref, tau_ref, qs_ref, qds_ref, gps_ref,
    gtau_ref, gq0_ref, gqd0_ref,
):
    """Adjoint of the EE-fused rollout for the MPC hot path: the only
    incoming cotangent is on the end-effector trajectory (the cost reads
    positions of the ee link only); replay step h from the saved state
    trajectory and pull (gq, gqd, gpe[h]) back through jax.vjp of the
    step+ee-FK function."""
    D = robot.n_dofs
    shape = (SUB_R, LANE_R)
    dtype = gtau_ref.dtype

    def step_fn(q, qd, tau):
        qn, qdn = _fd_step_folded(
            robot, c, dt, include_gravity, use_damping, gravity, q, qd, tau
        )
        return qn, qdn, _ee_fk_folded(robot, c, qn, ee)

    zeros = tuple(jnp.zeros(shape, dtype) for _ in range(D))

    def body(i, carry):
        gq, gqd = carry
        h = H - 1 - i
        hm = jnp.maximum(h - 1, 0)
        is0 = h == 0
        qp, qdp, tau, gpe = [], [], [], []
        for d in range(D):
            qp.append(jnp.where(is0, q0_ref[d], qs_ref[hm * D + d]))
            qdp.append(jnp.where(is0, qd0_ref[d], qds_ref[hm * D + d]))
            tau.append(tau_ref[h * D + d])
        for j in range(3):
            gpe.append(gps_ref[h * 3 + j])
        _, pull = jax.vjp(step_fn, tuple(qp), tuple(qdp), tuple(tau))
        dq, dqd, dtau = pull((gq, gqd, tuple(gpe)))
        for d in range(D):
            gtau_ref[h * D + d] = dtau[d]
        return (dq, dqd)

    gq, gqd = jax.lax.fori_loop(0, H, body, (zeros, zeros))
    for d in range(D):
        gq0_ref[d] = gq[d]
        gqd0_ref[d] = gqd[d]


# ---------------------------------------------------------------------------
# Host wrappers
# ---------------------------------------------------------------------------


def _run_fwd(robot, c, H, dt, ig, ud, g, q0P, qd0P, tauP):
    D, Nt = q0P.shape[0], q0P.shape[1]
    dtype = q0P.dtype

    def kernel(q0_ref, qd0_ref, tau_ref, qs_ref, qds_ref):
        _fwd_kernel(
            robot, c, H, dt, ig, ud, g,
            q0_ref.at[:, 0], qd0_ref.at[:, 0], tau_ref.at[:, 0],
            qs_ref.at[:, 0], qds_ref.at[:, 0],
        )

    out = jax.ShapeDtypeStruct((H * D, Nt, SUB_R, LANE_R), dtype)
    return pl.pallas_call(
        kernel,
        out_shape=(out, out),
        grid=(Nt,),
        in_specs=[_spec(D), _spec(D), _spec(H * D)],
        out_specs=(_spec(H * D), _spec(H * D)),
    )(q0P, qd0P, tauP)


def _run_bwd(robot, c, H, dt, ig, ud, g, q0P, qd0P, tauP, qsP, qdsP, gqsP):
    D, Nt = q0P.shape[0], q0P.shape[1]
    dtype = q0P.dtype

    def kernel(q0_ref, qd0_ref, tau_ref, qs_ref, qds_ref, gqs_ref,
               gtau_ref, gq0_ref, gqd0_ref):
        _bwd_kernel(
            robot, c, H, dt, ig, ud, g,
            q0_ref.at[:, 0], qd0_ref.at[:, 0], tau_ref.at[:, 0],
            qs_ref.at[:, 0], qds_ref.at[:, 0], gqs_ref.at[:, 0],
            gtau_ref.at[:, 0], gq0_ref.at[:, 0], gqd0_ref.at[:, 0],
        )

    outs = (
        jax.ShapeDtypeStruct((H * D, Nt, SUB_R, LANE_R), dtype),
        jax.ShapeDtypeStruct((D, Nt, SUB_R, LANE_R), dtype),
        jax.ShapeDtypeStruct((D, Nt, SUB_R, LANE_R), dtype),
    )
    return pl.pallas_call(
        kernel,
        out_shape=outs,
        grid=(Nt,),
        in_specs=[_spec(D), _spec(D), _spec(H * D), _spec(H * D), _spec(H * D), _spec(H * D)],
        out_specs=(_spec(H * D), _spec(D), _spec(D)),
        # gtau reuses gqs's buffer: step h reads gqs[h*D+d] strictly before
        # writing gtau[h*D+d] and never re-reads it, so in-place is safe.
        input_output_aliases={5: 0},
        # At H=50, D=7 the double-buffered trajectory blocks + the step-VJP's
        # residual spills total ~16.05 MB — 52 KB over the default 16 MB
        # scoped-vmem budget. v5e cores have headroom above that default;
        # raise the kernel's limit rather than shrinking the (already
        # minimum-tile) batch block.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024
        ),
    )(q0P, qd0P, tauP, qsP, qdsP, gqsP)


def _run_fwd_ee(robot, c, H, dt, ig, ud, g, ee, q0P, qd0P, tauP):
    D, Nt = q0P.shape[0], q0P.shape[1]
    dtype = q0P.dtype

    def kernel(q0_ref, qd0_ref, tau_ref, qs_ref, qds_ref, ps_ref):
        _fwd_ee_kernel(
            robot, c, H, dt, ig, ud, g, ee,
            q0_ref.at[:, 0], qd0_ref.at[:, 0], tau_ref.at[:, 0],
            qs_ref.at[:, 0], qds_ref.at[:, 0], ps_ref.at[:, 0],
        )

    out = jax.ShapeDtypeStruct((H * D, Nt, SUB_R, LANE_R), dtype)
    out_p = jax.ShapeDtypeStruct((H * 3, Nt, SUB_R, LANE_R), dtype)
    return pl.pallas_call(
        kernel,
        out_shape=(out, out, out_p),
        grid=(Nt,),
        in_specs=[_spec(D), _spec(D), _spec(H * D)],
        out_specs=(_spec(H * D), _spec(H * D), _spec(H * 3)),
    )(q0P, qd0P, tauP)


def _run_bwd_ee(robot, c, H, dt, ig, ud, g, ee, q0P, qd0P, tauP, qsP, qdsP, gpsP):
    D, Nt = q0P.shape[0], q0P.shape[1]
    dtype = q0P.dtype

    def kernel(q0_ref, qd0_ref, tau_ref, qs_ref, qds_ref, gps_ref,
               gtau_ref, gq0_ref, gqd0_ref):
        _bwd_ee_kernel(
            robot, c, H, dt, ig, ud, g, ee,
            q0_ref.at[:, 0], qd0_ref.at[:, 0], tau_ref.at[:, 0],
            qs_ref.at[:, 0], qds_ref.at[:, 0], gps_ref.at[:, 0],
            gtau_ref.at[:, 0], gq0_ref.at[:, 0], gqd0_ref.at[:, 0],
        )

    outs = (
        jax.ShapeDtypeStruct((H * D, Nt, SUB_R, LANE_R), dtype),
        jax.ShapeDtypeStruct((D, Nt, SUB_R, LANE_R), dtype),
        jax.ShapeDtypeStruct((D, Nt, SUB_R, LANE_R), dtype),
    )
    return pl.pallas_call(
        kernel,
        out_shape=outs,
        grid=(Nt,),
        in_specs=[_spec(D), _spec(D), _spec(H * D), _spec(H * D), _spec(H * D),
                  _spec(H * 3)],
        out_specs=(_spec(H * D), _spec(D), _spec(D)),
        # Same VMEM rationale as _run_bwd: trajectory blocks + step-VJP
        # residual spills overflow the 16 MB default at H=50.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024
        ),
    )(q0P, qd0P, tauP, qsP, qdsP, gpsP)


def _pack_db(x, Nt):
    """[D, B_pad] -> [D, Nt, SUB, LANE] (batch mapping b = i*TILE + s*LANE + t,
    same as ops/pallas/fk.py's dof-major packing)."""
    return x.reshape(x.shape[0], Nt, SUB_R, LANE_R)


def _pack_hdb(x, Nt):
    """[H, D, B_pad] -> [H*D, Nt, SUB, LANE]."""
    H_, D_ = x.shape[0], x.shape[1]
    return x.reshape(H_ * D_, Nt, SUB_R, LANE_R)


def _unpack_hdb(xP, H, D, B):
    return xP.reshape(H, D, -1)[..., :B]


def _rollout_frozen(robot, H, dt, include_gravity, use_damping, gravity):
    """custom_vjp factory — the struct stays in CLOSURE so it is concrete at
    trace time (custom_vjp lifts array arguments to tracers, which would
    silently lose the immediates path; same shape as ops/pallas/fk.py)."""
    c = _consts(robot)
    D = robot.n_dofs

    def run_fwd(q0T, qd0T, tauT):
        B = q0T.shape[1]
        pad = (-B) % TILE_R
        Nt = (B + pad) // TILE_R
        padb = lambda x: jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, pad),))
        q0P = _pack_db(padb(q0T), Nt)
        qd0P = _pack_db(padb(qd0T), Nt)
        tauP = _pack_hdb(padb(tauT), Nt)
        qsP, qdsP = _run_fwd(
            robot, c, H, dt, include_gravity, use_damping, gravity, q0P, qd0P, tauP
        )
        return (
            _unpack_hdb(qsP, H, D, B),
            _unpack_hdb(qdsP, H, D, B),
            (q0P, qd0P, tauP, qsP, qdsP, Nt, B),
        )

    @jax.custom_vjp
    def fn(q0T, qd0T, tauT):
        qs, qds, _ = run_fwd(q0T, qd0T, tauT)
        return qs, qds

    def fwd(q0T_p, qd0T_p, tauT_p):
        from .fk import _unwrap_primal

        q0T, _ = _unwrap_primal(q0T_p)
        qd0T, _ = _unwrap_primal(qd0T_p)
        tauT, _ = _unwrap_primal(tauT_p)
        qs, qds, packed = run_fwd(q0T, qd0T, tauT)
        return (qs, qds), (q0T, qd0T, tauT, packed)

    def bwd(res, g):
        from jax.custom_derivatives import SymbolicZero

        q0T, qd0T, tauT, (q0P, qd0P, tauP, qsP, qdsP, Nt, B) = res
        gqs, gqds = g
        if isinstance(gqds, SymbolicZero) and not isinstance(gqs, SymbolicZero):
            # Hot path (MPC cost reads positions only): one backward launch.
            pad = Nt * TILE_R - B
            gqsP = _pack_hdb(jnp.pad(gqs, ((0, 0), (0, 0), (0, pad))), Nt)
            gtauP, gq0P, gqd0P = _run_bwd(
                robot, c, H, dt, include_gravity, use_damping, gravity,
                q0P, qd0P, tauP, qsP, qdsP, gqsP,
            )
            return (
                gq0P.reshape(D, -1)[:, :B],
                gqd0P.reshape(D, -1)[:, :B],
                _unpack_hdb(gtauP, H, D, B),
            )
        # General cotangents (velocity-trajectory gradients demanded):
        # differentiate the scan path — identical math, exact gradients.
        from ...trajopt.rollout import dynamic_rollout_dof_major

        def ref(a, b, t):
            return dynamic_rollout_dof_major(
                robot, a, b, t, dt,
                include_gravity=include_gravity, use_damping=use_damping,
            )

        gqs_v = jnp.zeros((H, D, B), q0T.dtype) if isinstance(gqs, SymbolicZero) else gqs
        gqds_v = jnp.zeros((H, D, B), q0T.dtype) if isinstance(gqds, SymbolicZero) else gqds
        _, vjp = jax.vjp(ref, q0T, qd0T, tauT)
        return vjp((gqs_v, gqds_v))

    fn.defvjp(fwd, bwd, symbolic_zeros=True)
    return fn


def _rollout_ee_frozen(robot, H, dt, include_gravity, use_damping, gravity, ee):
    """custom_vjp factory for the EE-fused rollout (struct in closure, same
    rationale as _rollout_frozen)."""
    c = _consts(robot)
    D = robot.n_dofs

    def run_fwd(q0T, qd0T, tauT):
        B = q0T.shape[1]
        pad = (-B) % TILE_R
        Nt = (B + pad) // TILE_R
        padb = lambda x: jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, pad),))
        q0P = _pack_db(padb(q0T), Nt)
        qd0P = _pack_db(padb(qd0T), Nt)
        tauP = _pack_hdb(padb(tauT), Nt)
        qsP, qdsP, psP = _run_fwd_ee(
            robot, c, H, dt, include_gravity, use_damping, gravity, ee,
            q0P, qd0P, tauP,
        )
        return (
            _unpack_hdb(qsP, H, D, B),
            _unpack_hdb(qdsP, H, D, B),
            _unpack_hdb(psP, H, 3, B),
            (q0P, qd0P, tauP, qsP, qdsP, Nt, B),
        )

    @jax.custom_vjp
    def fn(q0T, qd0T, tauT):
        qs, qds, ps, _ = run_fwd(q0T, qd0T, tauT)
        return qs, qds, ps

    def fwd(q0T_p, qd0T_p, tauT_p):
        from .fk import _unwrap_primal

        q0T, _ = _unwrap_primal(q0T_p)
        qd0T, _ = _unwrap_primal(qd0T_p)
        tauT, _ = _unwrap_primal(tauT_p)
        qs, qds, ps, packed = run_fwd(q0T, qd0T, tauT)
        return (qs, qds, ps), (q0T, qd0T, tauT, packed)

    def bwd(res, g):
        from jax.custom_derivatives import SymbolicZero

        q0T, qd0T, tauT, (q0P, qd0P, tauP, qsP, qdsP, Nt, B) = res
        gqs, gqds, gps = g
        only_ee = (
            isinstance(gqs, SymbolicZero)
            and isinstance(gqds, SymbolicZero)
            and not isinstance(gps, SymbolicZero)
        )
        if only_ee:
            # Hot path (the MPC cost reads the ee trajectory only).
            pad = Nt * TILE_R - B
            gpsP = _pack_hdb(jnp.pad(gps, ((0, 0), (0, 0), (0, pad))), Nt)
            gtauP, gq0P, gqd0P = _run_bwd_ee(
                robot, c, H, dt, include_gravity, use_damping, gravity, ee,
                q0P, qd0P, tauP, qsP, qdsP, gpsP,
            )
            return (
                gq0P.reshape(D, -1)[:, :B],
                gqd0P.reshape(D, -1)[:, :B],
                _unpack_hdb(gtauP, H, D, B),
            )
        # General cotangents: differentiate the scan-path twin (identical
        # math: scan rollout + scalar-sweep FK).
        from ...ops.kinematics import fk_link_position_dof_first
        from ...trajopt.rollout import dynamic_rollout_dof_major

        def ref(a, b, t):
            qs, qds = dynamic_rollout_dof_major(
                robot, a, b, t, dt,
                include_gravity=include_gravity, use_damping=use_damping,
            )
            ps = fk_link_position_dof_first(
                robot, qs.transpose(1, 0, 2).reshape(D, -1), ee
            ).reshape(3, H, -1).transpose(1, 0, 2)
            return qs, qds, ps

        z = lambda gv, sh: (
            jnp.zeros(sh, q0T.dtype) if isinstance(gv, SymbolicZero) else gv
        )
        _, vjp = jax.vjp(ref, q0T, qd0T, tauT)
        return vjp((
            z(gqs, (H, D, B)), z(gqds, (H, D, B)), z(gps, (H, 3, B)),
        ))

    fn.defvjp(fwd, bwd, symbolic_zeros=True)
    return fn


def dynamic_rollout_ee_pallas(
    robot: RobotStruct,
    q0T: jnp.ndarray,  # [D, B]
    qd0T: jnp.ndarray,  # [D, B]
    tauT: jnp.ndarray,  # [H, D, B]
    dt: float,
    ee_link_idx: int,
    include_gravity: bool = True,
    use_damping: bool = True,
    gravity: float = GRAVITY,
    respect_effort_limits: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """EE-fused twin of `dynamic_rollout_pallas`: additionally emits the
    world position of `ee_link_idx` after every integration step,
    pee [H, 3, B], computed INSIDE the kernel (the MPC cost's FK fused into
    the rollout — zero separate FK dispatches per solver iteration). When
    only pee is differentiated (the MPC hot path), the adjoint runs as one
    fused backward launch; other cotangent patterns and traced robots fall
    back to the scan+FK twin.
    """
    c = _consts(robot)
    if c is None or robot.n_dofs == 0:
        from ...ops.kinematics import fk_link_position_dof_first
        from ...trajopt.rollout import dynamic_rollout_dof_major

        qs, qds = dynamic_rollout_dof_major(
            robot, q0T, qd0T, tauT, dt,
            include_gravity=include_gravity, use_damping=use_damping,
            respect_effort_limits=respect_effort_limits,
        )
        H_, D_ = tauT.shape[0], tauT.shape[1]
        ps = fk_link_position_dof_first(
            robot, qs.transpose(1, 0, 2).reshape(D_, -1), ee_link_idx
        ).reshape(3, H_, -1).transpose(1, 0, 2)
        return qs, qds, ps
    if respect_effort_limits:
        from ...trajopt.rollout import _effort_bound

        emax = _effort_bound(robot, 1)
        tauT = jnp.clip(tauT, -emax, emax)
    H = tauT.shape[0]
    fn = _rollout_ee_frozen(
        robot, H, dt, include_gravity, use_damping, gravity, ee_link_idx
    )
    return fn(q0T, qd0T, tauT)


def dynamic_rollout_pallas(
    robot: RobotStruct,
    q0T: jnp.ndarray,  # [D, B]
    qd0T: jnp.ndarray,  # [D, B]
    tauT: jnp.ndarray,  # [H, D, B]
    dt: float,
    include_gravity: bool = True,
    use_damping: bool = True,
    gravity: float = GRAVITY,
    respect_effort_limits: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in fused-kernel twin of `trajopt.rollout.dynamic_rollout_dof_major`:
    integrates all B scenarios through all H semi-implicit-Euler forward-
    dynamics steps in ONE kernel launch, returning (qs, qds) each [H, D, B].

    Requires a concrete float32 struct (the production deployment mode — the
    robot is a compile-time constant closed over by the jitted solver); a
    traced or non-f32 robot transparently falls back to the scan path, which
    also provides robot-parameter gradients for identification. Gradients
    w.r.t. (q0, qd0, tau) flow through the fused backward kernel when only
    the position trajectory is differentiated (the MPC cost path), and
    through the scan path's VJP otherwise.
    """
    c = _consts(robot)
    if c is None or robot.n_dofs == 0:
        from ...trajopt.rollout import dynamic_rollout_dof_major

        return dynamic_rollout_dof_major(
            robot, q0T, qd0T, tauT, dt,
            include_gravity=include_gravity, use_damping=use_damping,
            respect_effort_limits=respect_effort_limits,
        )
    if respect_effort_limits:
        from ...trajopt.rollout import _effort_bound

        emax = _effort_bound(robot, 1)
        tauT = jnp.clip(tauT, -emax, emax)
    H = tauT.shape[0]
    fn = _rollout_frozen(robot, H, dt, include_gravity, use_damping, gravity)
    return fn(q0T, qd0T, tauT)
