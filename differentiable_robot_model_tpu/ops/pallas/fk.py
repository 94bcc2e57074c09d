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


# Trace-time constant folding helpers shared across the Pallas kernels — see
# ops/pallas/_fold.py for the rationale (scalar-broadcast multiplies are
# ~25x a vector-immediate op on Mosaic, so folding constants is the
# difference between constant-bound and compute-bound kernels).
from ._fold import (
    _IDENTITY9,
    add as _add,
    as_block as _as_block,
    m as _m,
    mat3 as _mat3,
    rodrigues as _rodrigues,
    rot as _rot_scalar,
    rpy_matrix as _rpy_matrix,
    sub as _sub2,
)

_rot_vec = _rot_scalar


def _concrete_consts(robot):
    """numpy copies of the per-link kinematic constants, or None if traced.

    When the RobotStruct reaches the kernel builder CONCRETE (the production
    deployment mode: the robot is a compile-time constant closed over by the
    jitted solver), every per-link constant is baked into the kernel as a
    float IMMEDIATE. This matters enormously on TPU: a Mosaic scalar-load x
    vector broadcast multiply measures ~25x slower than a vector op with a
    float immediate (0.43 ms vs 0.018 ms for ~200 ops over 200k configs), so
    immediates turn the whole chain into full-rate VPU code. When the robot
    is a tracer (e.g. differentiating w.r.t. robot parameters), the kernels
    read constants from refs instead. Gated to float32 structs: immediates
    are baked as float32, which would silently downcast a float64 robot
    (round-1 advisor finding) — non-f32 structs use the refs path, which
    keeps the arrays' own precision.
    """
    try:
        import numpy as _np

        if _np.dtype(robot.dtype) != _np.float32:
            return None
        f32 = lambda x: _np.asarray(x, _np.float32)
        return {
            "trans": f32(robot.trans),
            "rpy": f32(robot.rot_angles),
            "axis": f32(robot.axis),
        }
    except Exception:
        return None


def _rpy_entries(robot, rpy_ref, l, consts):
    if consts is not None:
        import numpy as _np

        roll, pitch, yaw = (float(v) for v in consts["rpy"][l])
        f32cs = lambda a: (
            float(_np.float32(_np.cos(a))), float(_np.float32(_np.sin(a)))
        )
        return _rpy_matrix(f32cs(roll), f32cs(pitch), f32cs(yaw))
    if robot.rpy_zero[l]:
        return _IDENTITY9
    roll, pitch, yaw = rpy_ref[l, 0], rpy_ref[l, 1], rpy_ref[l, 2]
    return _rpy_matrix(
        (jnp.cos(roll), jnp.sin(roll)),
        (jnp.cos(pitch), jnp.sin(pitch)),
        (jnp.cos(yaw), jnp.sin(yaw)),
    )


def _axis_entries(robot, axis_ref, l, consts):
    if consts is not None:
        return tuple(float(v) for v in consts["axis"][l])
    code = robot.axis_code[l]
    if code is not None:
        i, s = code
        a = [0.0, 0.0, 0.0]
        a[i] = float(s)
        return tuple(a)
    return (axis_ref[l, 0], axis_ref[l, 1], axis_ref[l, 2])


def _trans_entries(robot, trans_ref, l, consts):
    if consts is not None:
        return tuple(float(v) for v in consts["trans"][l])
    tz = robot.trans_zero[l]
    return tuple(0.0 if tz[j] else trans_ref[l, j] for j in range(3))


def _chain_sweep(robot, chain, q_ref, trans_ref, rpy_ref, axis_ref, record, consts=None):
    """Shared forward sweep. `record(l, jt, d, z, o_pre, pw, Rw)` is called per
    chain link after pw/Rw are updated; z is the world joint axis, o_pre the
    world joint origin (both None for fixed links)."""
    link_dof = {l: d for d, l in enumerate(robot.dof_links)}

    Rw = _IDENTITY9
    pw = (0.0, 0.0, 0.0)

    for l in chain:
        jt = robot.joint_types[l]
        F = _rpy_entries(robot, rpy_ref, l, consts)
        a3 = _axis_entries(robot, axis_ref, l, consts)
        t = _trans_entries(robot, trans_ref, l, consts)
        Fa = _rot_scalar(F, a3)  # axis in the post-rpy joint frame

        if jt == JOINT_REVOLUTE:
            d = link_dof[l]
            qv = q_ref[d]
            c, s = jnp.cos(qv), jnp.sin(qv)
            R = _mat3(F, _rodrigues(a3[0], a3[1], a3[2], c, s))
            tt = t
        elif jt == JOINT_PRISMATIC:
            d = link_dof[l]
            qv = q_ref[d]
            R = F
            tt = (
                _add(t[0], _m(Fa[0], qv)),
                _add(t[1], _m(Fa[1], qv)),
                _add(t[2], _m(Fa[2], qv)),
            )
        else:
            d = None
            R = F
            tt = t

        # world joint axis and origin use Rw/pw BEFORE this link's update
        z = _rot_scalar(Rw, Fa) if jt != 0 else None

        dt = _rot_vec(Rw, tt)
        pw = (_add(pw[0], dt[0]), _add(pw[1], dt[1]), _add(pw[2], dt[2]))
        o_pre = pw if jt == JOINT_REVOLUTE else None

        Rw = _mat3(Rw, R)
        record(l, jt, d, z, o_pre, pw, Rw)
    return pw


def _fwd_kernel(robot, chain, consts, q_ref, trans_ref, rpy_ref, axis_ref, p_ref):
    pw = _chain_sweep(
        robot, chain, q_ref, trans_ref, rpy_ref, axis_ref,
        lambda *a: None, consts=consts,
    )
    shape, dtype = q_ref.shape[1:], q_ref.dtype
    p_ref[0] = _as_block(pw[0], shape, dtype)
    p_ref[1] = _as_block(pw[1], shape, dtype)
    p_ref[2] = _as_block(pw[2], shape, dtype)


def _bwd_kernel(robot, chain, D, consts, q_ref, trans_ref, rpy_ref, axis_ref, g_ref, dq_ref):
    recs = []  # (dof, joint_type, z, o_pre)

    def record(l, jt, d, z, o_pre, pw, Rw):
        if jt != 0:
            recs.append((d, jt, z, o_pre))

    pw = _chain_sweep(
        robot, chain, q_ref, trans_ref, rpy_ref, axis_ref, record, consts=consts
    )

    g = (g_ref[0], g_ref[1], g_ref[2])
    shape, dtype = q_ref.shape[1:], q_ref.dtype
    rows = {d: None for d in range(D)}
    for d, jt, z, o in recs:
        if jt == JOINT_REVOLUTE:
            r = (_sub2(pw[0], o[0]), _sub2(pw[1], o[1]), _sub2(pw[2], o[2]))
            # dq = g . (z x r)
            rows[d] = _add(
                _m(g[0], _sub2(_m(z[1], r[2]), _m(z[2], r[1]))),
                _m(g[1], _sub2(_m(z[2], r[0]), _m(z[0], r[2]))),
                _m(g[2], _sub2(_m(z[0], r[1]), _m(z[1], r[0]))),
            )
        else:  # prismatic: dq = g . z
            rows[d] = _add(_m(g[0], z[0]), _m(g[1], z[1]), _m(g[2], z[2]))
    for d in range(D):
        dq_ref[d] = _as_block(rows[d] if rows[d] is not None else 0.0, shape, dtype)


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


def _batch_spec(K):
    return pl.BlockSpec(
        (K, 1, SUB, LANE_B), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


def _call_fwd(robot, chain, qP):
    """qP: [D, Nt, SUB, LANE_B] packed configs -> p [3, Nt, SUB, LANE_B]."""
    D, Nt = qP.shape[0], qP.shape[1]
    consts = _concrete_consts(robot)
    out_shape = jax.ShapeDtypeStruct((3, Nt, SUB, LANE_B), qP.dtype)

    if consts is not None:
        def kernel(q_ref, p_ref):
            _fwd_kernel(
                robot, chain, consts, q_ref.at[:, 0], None, None, None, p_ref.at[:, 0]
            )

        return pl.pallas_call(
            kernel, out_shape=out_shape, grid=(Nt,),
            in_specs=[_batch_spec(D)], out_specs=_batch_spec(3),
        )(qP)

    def kernel(q_ref, trans_ref, rpy_ref, axis_ref, p_ref):
        _fwd_kernel(
            robot, chain, None,
            q_ref.at[:, 0], trans_ref, rpy_ref, axis_ref, p_ref.at[:, 0],
        )

    return pl.pallas_call(
        kernel, out_shape=out_shape, grid=(Nt,),
        in_specs=[
            _batch_spec(D),
            _const_spec((robot.n_links, 3)),
            _const_spec((robot.n_links, 3)),
            _const_spec((robot.n_links, 3)),
        ],
        out_specs=_batch_spec(3),
    )(qP, robot.trans, robot.rot_angles, robot.axis)


def _call_bwd(robot, chain, D, qP, gP):
    Nt = qP.shape[1]
    consts = _concrete_consts(robot)
    out_shape = jax.ShapeDtypeStruct((D, Nt, SUB, LANE_B), qP.dtype)

    if consts is not None:
        def kernel(q_ref, g_ref, dq_ref):
            _bwd_kernel(
                robot, chain, D, consts,
                q_ref.at[:, 0], None, None, None, g_ref.at[:, 0], dq_ref.at[:, 0],
            )

        return pl.pallas_call(
            kernel, out_shape=out_shape, grid=(Nt,),
            in_specs=[_batch_spec(D), _batch_spec(3)], out_specs=_batch_spec(D),
        )(qP, gP)

    def kernel(q_ref, trans_ref, rpy_ref, axis_ref, g_ref, dq_ref):
        _bwd_kernel(
            robot, chain, D, None,
            q_ref.at[:, 0], trans_ref, rpy_ref, axis_ref,
            g_ref.at[:, 0], dq_ref.at[:, 0],
        )

    return pl.pallas_call(
        kernel, out_shape=out_shape, grid=(Nt,),
        in_specs=[
            _batch_spec(D),
            _const_spec((robot.n_links, 3)),
            _const_spec((robot.n_links, 3)),
            _const_spec((robot.n_links, 3)),
            _batch_spec(3),
        ],
        out_specs=_batch_spec(D),
    )(qP, robot.trans, robot.rot_angles, robot.axis, gP)


def _dm_run_fwd(robot, chain, qM):
    D, M = qM.shape
    pad = (-M) % TILE_B
    Nt = (M + pad) // TILE_B
    qP = jnp.pad(qM, ((0, 0), (0, pad))).reshape(D, Nt, SUB, LANE_B)
    return _call_fwd(robot, chain, qP).reshape(3, -1)[:, :M]


def _dm_run_bwd(robot, chain, qM, g):
    D, M = qM.shape
    pad = (-M) % TILE_B
    Nt = (M + pad) // TILE_B
    qP = jnp.pad(qM, ((0, 0), (0, pad))).reshape(D, Nt, SUB, LANE_B)
    gP = jnp.pad(g, ((0, 0), (0, pad))).reshape(3, Nt, SUB, LANE_B)
    return _call_bwd(robot, chain, D, qP, gP).reshape(D, -1)[:, :M]


def _fk_dof_major_frozen(robot: RobotStruct, link_idx: int):
    """Frozen-robot variant: the struct stays in CLOSURE (concrete at trace
    time) so every kinematic constant reaches the kernels as a float
    immediate (f32 robots) or as VMEM refs (non-f32 robots — _call_fwd and
    _call_bwd re-check _concrete_consts internally and pick the refs layout).
    custom_vjp lifts its array *arguments* to tracers — which would silently
    drop the immediates path — hence this factory shape."""
    chain = _chain_to(robot, link_idx)

    @jax.custom_vjp
    def f(qM):
        return _dm_run_fwd(robot, chain, qM)

    f.defvjp(
        lambda qM: (_dm_run_fwd(robot, chain, qM), qM),
        lambda qM, g: (_dm_run_bwd(robot, chain, qM, g),),
    )
    return f


def _unwrap_primal(p):
    """CustomVJPPrimal pytree -> (values pytree, any-leaf-perturbed).

    Used by the symbolic_zeros custom_vjp factories in ops/pallas/rollout.py,
    whose fwd receives CustomVJPPrimal-wrapped arguments. (Their residual
    structure is branch-INdependent — only cotangent SymbolicZeros vary — so
    they do not hit the scan-linearization failure that forced the FK entry
    points below to decide robot concreteness before the custom_vjp
    boundary.)"""
    leaves = jax.tree_util.tree_leaves(
        p, is_leaf=lambda x: hasattr(x, "perturbed")
    )
    vals = jax.tree_util.tree_map(
        lambda x: x.value, p, is_leaf=lambda x: hasattr(x, "perturbed")
    )
    return vals, any(l.perturbed for l in leaves)


def _robot_is_concrete(robot: RobotStruct) -> bool:
    """True iff every kernel-read array of the struct is a trace-time
    constant (i.e. the robot reached this call via closure, not as a traced
    argument). Tracers raise on numpy conversion."""
    try:
        import numpy as _np

        _np.asarray(robot.trans)
        _np.asarray(robot.rot_angles)
        _np.asarray(robot.axis)
        return True
    except Exception:
        return False


def fk_position_dof_major(robot: RobotStruct, qM: jnp.ndarray, link_idx: int):
    """World position of link `link_idx` for dof-major configs qM: [D, M].

    Returns [3, M]. Unlike `fk_link_position_pallas`, the batch axis is
    already minor, so entering the kernel layout is a reshape + minor-dim
    pad — no transpose relayout on either side (the relayouts cost ~1.5x the
    kernel itself at MPC sizes). This is the hot entry used by the batched
    MPC solver (trajopt/solvers.py solve_kinematic_adam_batch).

    When `robot` is concrete (closed over by the jitted caller — the
    production deployment mode) the kernels bake all kinematic constants as
    float immediates (f32 structs, see _concrete_consts) or read them from
    VMEM refs (non-f32 structs, preserving their precision), with the
    geometric-Jacobian kernel backward covering qM.

    A TRACED robot (e.g. identification: differentiating w.r.t. robot
    parameters through an fk_impl="pallas" solve, or a robot passed as a jit
    argument) routes to the fully differentiable scalar FK *before* any
    custom_vjp boundary, so robot-parameter cotangents flow through plain
    autodiff. The previous design detected perturbed-ness inside a
    symbolic_zeros custom_vjp fwd, but branch-dependent residual structures
    break `jax.grad`-of-`lax.scan` linearization ("Linearization failed to
    produce known values for all output primals") — deciding concreteness
    once at trace time is both simpler and robust (round-4 verdict #1).
    """
    if _robot_is_concrete(robot):
        return _fk_dof_major_frozen(robot, link_idx)(qM)
    from ..kinematics import fk_link_position_dof_first

    return fk_link_position_dof_first(robot, qM, link_idx)


def _fk_flat_frozen(robot: RobotStruct, link_idx: int):
    """Flat-batch twin of _fk_dof_major_frozen (robot concrete, in closure)."""

    @jax.custom_vjp
    def f(q):
        return _fk_pallas_fwd_impl(robot, q, link_idx)

    f.defvjp(
        lambda q: (_fk_pallas_fwd_impl(robot, q, link_idx), q),
        lambda q, g: (_fk_pallas_bwd_impl(robot, q, g, link_idx),),
    )
    return f


def fk_link_position_pallas(robot: RobotStruct, q: jnp.ndarray, link_idx: int):
    """World position of link `link_idx` for a flat config batch q: [N, D].

    Fused single-kernel forward; geometric-Jacobian single-kernel backward
    w.r.t. q when the robot is concrete (closed over). A traced robot (robot
    gradients demanded, or robot passed as a jit argument) routes to the
    fully differentiable scalar FK before the custom_vjp boundary — same
    rationale as `fk_position_dof_major`.
    """
    if _robot_is_concrete(robot):
        return _fk_flat_frozen(robot, link_idx)(q)
    from ..kinematics import fk_link_position

    return fk_link_position(robot, q, link_idx)
