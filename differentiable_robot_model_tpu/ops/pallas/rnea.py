"""Fused batched RNEA as a single Pallas TPU kernel.

One kernel launch computes inverse dynamics for a whole scenario batch: the
two link sweeps (velocity/acceleration propagation root->leaf, force
accumulation leaf->root — reference robot_model.py:251-303) run entirely in
VMEM. Per-dof quantities are [SUB, LANE_B] full tiles (8x128-aligned), link
loops unroll over the static topology, and — in the frozen-robot mode, when
the RobotStruct is concrete at trace time — every kinematic/inertial
constant is baked in as a float immediate via the trace-time folding helpers
(ops/pallas/_fold.py), which removes all Mosaic scalar-broadcast multiplies
from the kernel. A traced robot falls back to reading constants from refs.

Differentiation: custom VJP whose backward pass is the XLA scalar
implementation's VJP (ops/dynamics_scalar.py) — bit-identical math, so
gradients are exact and the kernel never blocks training.
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
from . import _fold as f
from .fk import (
    LANE_B,
    SUB,
    TILE_B,
    _axis_entries,
    _batch_spec,
    _const_spec,
    _rpy_entries,
    _trans_entries,
)


def _concrete_consts(robot):
    """numpy copies of all per-link constants, or None if traced (or when
    the struct is not float32 — immediates bake as f32 and would silently
    downcast a float64 robot; the refs path keeps array precision)."""
    try:
        if np.dtype(robot.dtype) != np.float32:
            return None
        f32 = lambda x: np.asarray(x, np.float32)
        inertia = np.asarray(robot.inertia_com, np.float32)
        return {
            "trans": f32(robot.trans),
            "rpy": f32(robot.rot_angles),
            "axis": f32(robot.axis),
            "mass": f32(robot.mass),
            "com": f32(robot.com),
            "inertia6": np.stack(
                [
                    inertia[:, 0, 0], inertia[:, 0, 1], inertia[:, 0, 2],
                    inertia[:, 1, 1], inertia[:, 1, 2], inertia[:, 2, 2],
                ],
                axis=-1,
            ),
            "damping": f32(robot.damping),
        }
    except Exception:
        return None


def _kernel(
    robot: RobotStruct,
    consts,
    include_gravity: bool,
    use_damping: bool,
    gravity: float,
    # refs:
    q_ref,  # [D, SUB, LANE_B]
    qd_ref,
    qdd_ref,
    trans_ref,  # [L, 3] or None in frozen mode
    rpy_ref,
    axis_ref,
    mass_ref,  # [L, 1]
    com_ref,  # [L, 3]
    inertia_ref,  # [L, 6]  (xx, xy, xz, yy, yz, zz about COM)
    damping_ref,  # [D, 1]
    tau_ref,  # [D, SUB, LANE_B] output
):
    L = robot.n_links
    D = robot.n_dofs
    link_dof = {l: d for d, l in enumerate(robot.dof_links)}
    shape, dtype = tau_ref.shape[1:], tau_ref.dtype

    def mass_of(l):
        return float(consts["mass"][l]) if consts is not None else mass_ref[l, 0]

    def com_of(l):
        if consts is not None:
            return tuple(float(v) for v in consts["com"][l])
        return (com_ref[l, 0], com_ref[l, 1], com_ref[l, 2])

    def inertia_of(l):
        if consts is not None:
            return tuple(float(v) for v in consts["inertia6"][l])
        return tuple(inertia_ref[l, j] for j in range(6))

    def damping_of(d):
        return float(consts["damping"][d]) if consts is not None else damping_ref[d, 0]

    # ---- forward sweep ----
    w = [None] * L
    v = [None] * L
    dw = [None] * L
    dv = [None] * L
    Rl = [None] * L
    tl = [None] * L
    zero3 = (0.0, 0.0, 0.0)
    w[0], v[0], dw[0] = zero3, zero3, zero3
    dv[0] = (0.0, 0.0, gravity if include_gravity else 0.0)

    for l in range(1, L):
        par = robot.parent[l]
        jt = robot.joint_types[l]
        F = _rpy_entries(robot, rpy_ref, l, consts)
        a3 = _axis_entries(robot, axis_ref, l, consts)
        t = _trans_entries(robot, trans_ref, l, consts)

        if jt == JOINT_REVOLUTE:
            d = link_dof[l]
            qv, qdv, qddv = q_ref[d], qd_ref[d], qdd_ref[d]
            c, s = jnp.cos(qv), jnp.sin(qv)
            R = f.mat3(F, f.rodrigues(a3[0], a3[1], a3[2], c, s))
            tt = t
        elif jt == JOINT_PRISMATIC:
            d = link_dof[l]
            qv, qdv, qddv = q_ref[d], qd_ref[d], qdd_ref[d]
            R = F
            sl = f.rot(F, a3)
            tt = (
                f.add(t[0], f.m(sl[0], qv)),
                f.add(t[1], f.m(sl[1], qv)),
                f.add(t[2], f.m(sl[2], qv)),
            )
        else:
            qdv = qddv = None
            R = F
            tt = t
        Rl[l], tl[l] = R, tt

        w_p, v_p, dw_p, dv_p = w[par], v[par], dw[par], dv[par]
        w_c = f.rot_t(R, w_p)
        v_c = f.rot_t(R, f.v_add(v_p, f.v_cross(w_p, tt)))
        dw_c = f.rot_t(R, dw_p)
        dv_c = f.rot_t(
            R,
            f.v_add(dv_p, f.v_add(f.v_cross(dw_p, tt), f.v_cross(w_p, f.v_cross(w_p, tt)))),
        )

        if jt == JOINT_REVOLUTE:
            wj = f.v_scale(a3, qdv)
            w[l] = f.v_add(w_c, wj)
            v[l] = v_c
            dw[l] = f.v_add(dw_c, f.v_add(f.v_scale(a3, qddv), f.v_cross(w_c, wj)))
            dv[l] = dv_c
        elif jt == JOINT_PRISMATIC:
            vj = f.v_scale(a3, qdv)
            w[l] = w_c
            v[l] = f.v_add(v_c, vj)
            dw[l] = dw_c
            dv[l] = f.v_add(
                dv_c, f.v_add(f.v_scale(a3, qddv), f.v_scale(f.v_cross(w_c, vj), 2.0))
            )
        else:
            w[l], v[l], dw[l], dv[l] = w_c, v_c, dw_c, dv_c

    # ---- backward sweep ----
    n_acc = [zero3] * L
    f_acc = [zero3] * L
    for l in range(L - 1, 0, -1):
        mass = mass_of(l)
        c3 = com_of(l)
        I6 = inertia_of(l)

        a_c = f.v_add(dv[l], f.v_add(f.v_cross(dw[l], c3), f.v_cross(w[l], f.v_cross(w[l], c3))))
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
            a3 = _axis_entries(robot, axis_ref, l, consts)
            src = n_tot if jt == JOINT_REVOLUTE else f_tot
            tau = f.v_dot(a3, src)
            if use_damping:
                tau = f.add(tau, f.m(damping_of(d), qd_ref[d]))
            tau_ref[d] = f.as_block(tau, shape, dtype)

        par = robot.parent[l]
        f_p = f.rot(Rl[l], f_tot)
        n_p = f.v_add(f.rot(Rl[l], n_tot), f.v_cross(tl[l], f_p))
        f_acc[par] = f.v_add(f_acc[par], f_p)
        n_acc[par] = f.v_add(n_acc[par], n_p)


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
    Nt = (B + pad) // TILE_B
    packb = lambda x: jnp.pad(x, ((0, pad), (0, 0))).T.reshape(D, Nt, SUB, LANE_B)
    qT, qdT, qddT = packb(q), packb(qd), packb(qdd)
    consts = _concrete_consts(robot)
    out_shape = jax.ShapeDtypeStruct((D, Nt, SUB, LANE_B), q.dtype)

    if consts is not None:
        def kernel(q_ref, qd_ref, qdd_ref, tau_ref):
            _kernel(
                robot, consts, include_gravity, use_damping, gravity,
                q_ref.at[:, 0], qd_ref.at[:, 0], qdd_ref.at[:, 0],
                None, None, None, None, None, None, None,
                tau_ref.at[:, 0],
            )

        tauT = pl.pallas_call(
            kernel, out_shape=out_shape, grid=(Nt,),
            in_specs=[_batch_spec(D)] * 3, out_specs=_batch_spec(D),
        )(qT, qdT, qddT)
    else:
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

        def kernel(
            q_ref, qd_ref, qdd_ref, trans_ref, rpy_ref, axis_ref,
            mass_ref, com_ref, inertia_ref, damping_ref, tau_ref,
        ):
            _kernel(
                robot, None, include_gravity, use_damping, gravity,
                q_ref.at[:, 0], qd_ref.at[:, 0], qdd_ref.at[:, 0],
                trans_ref, rpy_ref, axis_ref,
                mass_ref, com_ref, inertia_ref, damping_ref,
                tau_ref.at[:, 0],
            )

        tauT = pl.pallas_call(
            kernel, out_shape=out_shape, grid=(Nt,),
            in_specs=[
                _batch_spec(D), _batch_spec(D), _batch_spec(D),
                _const_spec((L, 3)), _const_spec((L, 3)), _const_spec((L, 3)),
                _const_spec((L, 1)), _const_spec((L, 3)), _const_spec((L, 6)),
                _const_spec((max(D, 1), 1)),
            ],
            out_specs=_batch_spec(D),
        )(
            qT, qdT, qddT,
            robot.trans, robot.rot_angles, robot.axis,
            robot.mass[:, None], robot.com, inertia6, robot.damping[:, None],
        )
    return tauT.reshape(D, -1).T[:B]


def _scalar_vjp(robot, q, qd, qdd, include_gravity, use_damping, gravity, g):
    def ref_fn(robot, q, qd, qdd):
        return jax.vmap(
            lambda a, b, c: rnea_scalar(
                robot, a, b, c, include_gravity, use_damping, gravity
            )
        )(q, qd, qdd)

    _, vjp = jax.vjp(ref_fn, robot, q, qd, qdd)
    return vjp(g)


def _rnea_frozen(robot, include_gravity, use_damping, gravity):
    """Frozen-robot custom_vjp factory: the struct stays in closure so it is
    concrete inside the kernel builder (custom_vjp lifts array ARGUMENTS to
    tracers, which would silently lose the immediates path)."""

    @jax.custom_vjp
    def fn(q, qd, qdd):
        return _rnea_pallas_fwd_impl(
            robot, q, qd, qdd, include_gravity, use_damping, gravity
        )

    def fwd(q, qd, qdd):
        return fn(q, qd, qdd), (q, qd, qdd)

    def bwd(res, g):
        q, qd, qdd = res
        _, dq, dqd, dqdd = _scalar_vjp(
            robot, q, qd, qdd, include_gravity, use_damping, gravity, g
        )
        return dq, dqd, dqdd

    fn.defvjp(fwd, bwd)
    return fn


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _rnea_traced(
    robot: RobotStruct,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    qdd: jnp.ndarray,
    include_gravity: bool = True,
    use_damping: bool = True,
    gravity: float = GRAVITY,
) -> jnp.ndarray:
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
    return _scalar_vjp(robot, q, qd, qdd, include_gravity, use_damping, gravity, g)


_rnea_traced.defvjp(_fwd, _bwd)


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

    Forward runs the single-launch VMEM kernel (with all robot constants as
    float immediates when the struct is concrete at trace time — the
    deployment mode); backward reuses the exact XLA scalar path's VJP (same
    math, gradients exact to roundoff).
    """
    if _concrete_consts(robot) is not None:
        return _rnea_frozen(robot, include_gravity, use_damping, gravity)(q, qd, qdd)
    return _rnea_traced(robot, q, qd, qdd, include_gravity, use_damping, gravity)
