"""Trace-time constant folding for Pallas kernels with mixed float/array math.

Kernel quantities are mixed Python floats (static robot constants baked as
immediates) and traced [SUB, LANE] arrays. These helpers fold float*float,
+-0 and *±1 at TRACE time, so links with identity rpy, axis-aligned joints,
zero translation components — or, in frozen-robot mode, EVERY constant —
emit a fraction of the vector ops of the generic path. XLA/Mosaic cannot do
this folding itself (0*x and x+0 are not identities under IEEE NaN/signed-
zero rules), and a Mosaic scalar-load x vector broadcast multiply measures
~25x slower than a vector op with a float immediate, so the folding is the
difference between constant-bound and compute-bound kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

_IDENTITY9 = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)


def m(a, b):
    """Multiply with folding (operands: float or array)."""
    if isinstance(a, float) and isinstance(b, float):
        return a * b
    if isinstance(a, float):
        if a == 0.0:
            return 0.0
        if a == 1.0:
            return b
        if a == -1.0:
            return -b
    if isinstance(b, float):
        if b == 0.0:
            return 0.0
        if b == 1.0:
            return a
        if b == -1.0:
            return -a
    return a * b


def add(*terms):
    """Sum with folding; float terms accumulate in Python."""
    out = None
    acc_f = 0.0
    for t in terms:
        if isinstance(t, float):
            acc_f += t
        else:
            out = t if out is None else out + t
    if out is None:
        return acc_f
    return out if acc_f == 0.0 else out + acc_f


def sub(a, b):
    return add(a, m(-1.0, b))


def neg(a):
    return m(-1.0, a)


# ---- 3-tuples ---------------------------------------------------------------


def v_add(a, b):
    return (add(a[0], b[0]), add(a[1], b[1]), add(a[2], b[2]))


def v_sub(a, b):
    return (sub(a[0], b[0]), sub(a[1], b[1]), sub(a[2], b[2]))


def v_scale(a, s):
    return (m(a[0], s), m(a[1], s), m(a[2], s))


def v_cross(a, b):
    return (
        sub(m(a[1], b[2]), m(a[2], b[1])),
        sub(m(a[2], b[0]), m(a[0], b[2])),
        sub(m(a[0], b[1]), m(a[1], b[0])),
    )


def v_dot(a, b):
    return add(m(a[0], b[0]), m(a[1], b[1]), m(a[2], b[2]))


# ---- 3x3 row-major 9-tuples --------------------------------------------------


def mat3(Ra, Rb):
    """Ra @ Rb with folding."""
    return (
        add(m(Ra[0], Rb[0]), m(Ra[1], Rb[3]), m(Ra[2], Rb[6])),
        add(m(Ra[0], Rb[1]), m(Ra[1], Rb[4]), m(Ra[2], Rb[7])),
        add(m(Ra[0], Rb[2]), m(Ra[1], Rb[5]), m(Ra[2], Rb[8])),
        add(m(Ra[3], Rb[0]), m(Ra[4], Rb[3]), m(Ra[5], Rb[6])),
        add(m(Ra[3], Rb[1]), m(Ra[4], Rb[4]), m(Ra[5], Rb[7])),
        add(m(Ra[3], Rb[2]), m(Ra[4], Rb[5]), m(Ra[5], Rb[8])),
        add(m(Ra[6], Rb[0]), m(Ra[7], Rb[3]), m(Ra[8], Rb[6])),
        add(m(Ra[6], Rb[1]), m(Ra[7], Rb[4]), m(Ra[8], Rb[7])),
        add(m(Ra[6], Rb[2]), m(Ra[7], Rb[5]), m(Ra[8], Rb[8])),
    )


def rot(R, v):
    """R @ v."""
    return (
        add(m(R[0], v[0]), m(R[1], v[1]), m(R[2], v[2])),
        add(m(R[3], v[0]), m(R[4], v[1]), m(R[5], v[2])),
        add(m(R[6], v[0]), m(R[7], v[1]), m(R[8], v[2])),
    )


def rot_t(R, v):
    """R^T @ v."""
    return (
        add(m(R[0], v[0]), m(R[3], v[1]), m(R[6], v[2])),
        add(m(R[1], v[0]), m(R[4], v[1]), m(R[7], v[2])),
        add(m(R[2], v[0]), m(R[5], v[1]), m(R[8], v[2])),
    )


def symm3(S6, v):
    """Symmetric 3x3 (xx, xy, xz, yy, yz, zz) times vector, with folding."""
    xx, xy, xz, yy, yz, zz = S6
    return (
        add(m(xx, v[0]), m(xy, v[1]), m(xz, v[2])),
        add(m(xy, v[0]), m(yy, v[1]), m(yz, v[2])),
        add(m(xz, v[0]), m(yz, v[1]), m(zz, v[2])),
    )


def rodrigues(ax, ay, az, c, s):
    """Rotation about unit axis (entries may be static floats) by angle with
    cos/sin vectors (c, s). For an axis-aligned joint this emits only a
    negation beyond cos/sin."""
    C_cell = []

    def C():
        if not C_cell:
            C_cell.append(1.0 - c)
        return C_cell[0]

    def offd(a1, a2, a3, sign):  # a1*a2*(1-c) + sign*a3*s
        prod = m(a1, a2)
        first = 0.0 if (isinstance(prod, float) and prod == 0.0) else m(prod, C())
        return add(first, m(m(sign, a3), s))

    def diag(a):
        aa = m(a, a)
        if isinstance(aa, float):
            if aa == 1.0:
                return 1.0
            if aa == 0.0:
                return c
        return add(c, m(aa, C()))

    return (
        diag(ax), offd(ax, ay, az, -1.0), offd(ax, az, ay, 1.0),
        offd(ay, ax, az, 1.0), diag(ay), offd(ay, az, ax, -1.0),
        offd(az, ax, ay, -1.0), offd(az, ay, ax, 1.0), diag(az),
    )


def rpy_matrix(roll_cs, pitch_cs, yaw_cs):
    """R_rpy = Rz(yaw) @ Ry(pitch) @ Rx(roll) from (cos, sin) pairs (floats
    or arrays), row-major 9-tuple with folding."""
    cr, sr = roll_cs
    cp, sp = pitch_cs
    cy, sy = yaw_cs
    return (
        m(cy, cp), sub(m(m(cy, sp), sr), m(sy, cr)), add(m(m(cy, sp), cr), m(sy, sr)),
        m(sy, cp), add(m(m(sy, sp), sr), m(cy, cr)), sub(m(m(sy, sp), cr), m(cy, sr)),
        neg(sp), m(cp, sr), m(cp, cr),
    )


def as_block(x, shape, dtype):
    """Broadcast a possibly-folded (float / 0-d scalar) entry to a full block."""
    if isinstance(x, float):
        return jnp.full(shape, x, dtype)
    return jnp.broadcast_to(x.astype(dtype), shape)
