"""Independent float64 NumPy oracle for kinematics/dynamics correctness.

Deliberately implemented with the *opposite* formulation from the framework:
the framework uses world-frame masked-matmul algorithms (ops/dynamics.py);
this oracle uses textbook link-local recursive algorithms (Featherstone RNEA /
homogeneous-matrix FK), in float64 numpy, unbatched. Agreement between the two
is strong evidence of correctness of both; the same role the pybullet oracle
plays in the reference test suite (reference:
tests/test_kinematics_dynamics.py:112-131 builds a pybullet DIRECT instance).

Conventions match the reference (and URDF): joint fused into child link,
gravity as +9.81 z base acceleration (d'Alembert), damping added to torques.
"""

from __future__ import annotations

import numpy as np

from differentiable_robot_model_tpu.models.structs import (
    JOINT_PRISMATIC,
    JOINT_REVOLUTE,
    RobotStruct,
)

GRAVITY = 9.81


def _np(x):
    return np.asarray(x, dtype=np.float64)


def _skew(v):
    return np.array(
        [[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]], dtype=np.float64
    )


def _rpy(rpy):
    r, p, y = rpy
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def _axis_rot(axis, angle):
    a = _np(axis)
    K = _skew(a)
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def local_transforms(robot: RobotStruct, q):
    """Per-link (R, t), parent <- child, float64."""
    q = _np(q)
    L = robot.n_links
    trans, rot_angles, axis = _np(robot.trans), _np(robot.rot_angles), _np(robot.axis)
    q_link = np.zeros(L)
    for d, l in enumerate(robot.dof_links):
        q_link[l] = q[d]
    Rs, ts = [], []
    for l in range(L):
        R = _rpy(rot_angles[l])
        t = trans[l].copy()
        if robot.joint_types[l] == JOINT_REVOLUTE:
            R = R @ _axis_rot(axis[l], q_link[l])
        elif robot.joint_types[l] == JOINT_PRISMATIC:
            t = t + _rpy(rot_angles[l]) @ (axis[l] * q_link[l])
        Rs.append(R)
        ts.append(t)
    return Rs, ts


def fk(robot: RobotStruct, q):
    """World poses via sequential homogeneous-matrix chain. Returns (R[L], p[L])."""
    R_loc, t_loc = local_transforms(robot, q)
    L = robot.n_links
    R = [None] * L
    p = [None] * L
    R[0], p[0] = R_loc[0], t_loc[0]
    for l in range(1, L):
        par = robot.parent[l]
        R[l] = R[par] @ R_loc[l]
        p[l] = R[par] @ t_loc[l] + p[par]
    return R, p


def quaternion(R):
    """Shepperd's method, branch-explicit (mirrors reference sva.py:108-136),
    (x, y, z, w)."""
    M = np.asarray(R, dtype=np.float64)
    t = np.trace(M)
    q = np.zeros(4)
    if t > 0:
        tn = t + 1.0
        q[3] = tn
        q[2] = M[1, 0] - M[0, 1]
        q[1] = M[0, 2] - M[2, 0]
        q[0] = M[2, 1] - M[1, 2]
    else:
        i, j, k = 0, 1, 2
        if M[1, 1] > M[0, 0]:
            i, j, k = 1, 2, 0
        if M[2, 2] > M[i, i]:
            i, j, k = 2, 0, 1
        tn = M[i, i] - (M[j, j] + M[k, k]) + 1.0
        q[i] = tn
        q[j] = M[i, j] + M[j, i]
        q[k] = M[k, i] + M[i, k]
        q[3] = M[k, j] - M[j, k]
    return q * 0.5 / np.sqrt(tn)


def jacobian(robot: RobotStruct, q, link_idx):
    """Geometric Jacobian via explicit child->root tree walk
    (mirrors reference robot_model.py:652-665)."""
    R, p = fk(robot, q)
    D = robot.n_dofs
    lin = np.zeros((3, D))
    ang = np.zeros((3, D))
    p_e = p[link_idx]
    l = link_idx
    while True:
        if robot.joint_types[l] != 0:
            d = robot.dof_links.index(l)
            z = R[l] @ _np(robot.axis)[l]
            if robot.joint_types[l] == JOINT_REVOLUTE:
                lin[:, d] = np.cross(z, p_e - p[l])
                ang[:, d] = z
            else:  # prismatic
                lin[:, d] = z
        if l == 0:
            break
        l = robot.parent[l]
    return lin, ang


def _spatial_inertia(robot: RobotStruct, l):
    m = float(_np(robot.mass)[l])
    c = _np(robot.com)[l]
    Ic = _np(robot.inertia_com)[l]
    cs = _skew(c)
    I = np.zeros((6, 6))
    I[:3, :3] = Ic + m * (cs @ cs.T)
    I[:3, 3:] = m * cs
    I[3:, :3] = -m * cs
    I[3:, 3:] = m * np.eye(3)
    return I


def _xup(R, t):
    """Motion transform child <- parent from the local pose (R, t)."""
    X = np.zeros((6, 6))
    X[:3, :3] = R.T
    X[3:, 3:] = R.T
    X[3:, :3] = -R.T @ _skew(t)
    return X


def _crm(v):
    out = np.zeros((6, 6))
    out[:3, :3] = _skew(v[:3])
    out[3:, 3:] = _skew(v[:3])
    out[3:, :3] = _skew(v[3:])
    return out


def _crf(v):
    return -_crm(v).T


def _local_S(robot: RobotStruct, l):
    a = _np(robot.axis)[l]
    S = np.zeros(6)
    if robot.joint_types[l] == JOINT_REVOLUTE:
        S[:3] = a
    elif robot.joint_types[l] == JOINT_PRISMATIC:
        S[3:] = a
    return S


def rnea(robot: RobotStruct, q, qd, qdd, include_gravity=True, use_damping=True):
    """Textbook recursive Newton-Euler in link-local coordinates, float64."""
    q, qd, qdd = _np(q), _np(qd), _np(qdd)
    L = robot.n_links
    R_loc, t_loc = local_transforms(robot, q)
    qd_link = np.zeros(L)
    qdd_link = np.zeros(L)
    for d, l in enumerate(robot.dof_links):
        qd_link[l] = qd[d]
        qdd_link[l] = qdd[d]

    a_base = np.zeros(6)
    if include_gravity:
        a_base[5] = GRAVITY

    v = [np.zeros(6) for _ in range(L)]
    a = [np.zeros(6) for _ in range(L)]
    fb = [np.zeros(6) for _ in range(L)]
    a[0] = a_base
    for l in range(1, L):
        par = robot.parent[l]
        X = _xup(R_loc[l], t_loc[l])
        S = _local_S(robot, l)
        vJ = S * qd_link[l]
        v[l] = X @ v[par] + vJ
        a[l] = X @ a[par] + S * qdd_link[l] + _crm(v[l]) @ vJ
        I = _spatial_inertia(robot, l)
        fb[l] = I @ a[l] + _crf(v[l]) @ (I @ v[l])

    tau_link = np.zeros(L)
    for l in range(L - 1, 0, -1):
        S = _local_S(robot, l)
        tau_link[l] = S @ fb[l]
        par = robot.parent[l]
        X = _xup(R_loc[l], t_loc[l])
        fb[par] = fb[par] + X.T @ fb[l]

    tau = np.array([tau_link[l] for l in robot.dof_links])
    if use_damping:
        tau = tau + _np(robot.damping) * qd
    return tau


def mass_matrix(robot: RobotStruct, q):
    """H via unit-acceleration RNEA columns (mirrors reference
    robot_model.py:427-449)."""
    D = robot.n_dofs
    H = np.zeros((D, D))
    zero = np.zeros(D)
    for j in range(D):
        e = np.zeros(D)
        e[j] = 1.0
        H[:, j] = rnea(robot, q, zero, e, include_gravity=False, use_damping=False)
    return H


def nonlinear_effects(robot: RobotStruct, q, qd, include_gravity=True, use_damping=True):
    return rnea(robot, q, qd, np.zeros(robot.n_dofs), include_gravity, use_damping)


def forward_dynamics(robot: RobotStruct, q, qd, f, include_gravity=True, use_damping=False):
    nle = nonlinear_effects(robot, q, qd, include_gravity, use_damping)
    H = mass_matrix(robot, q)
    return np.linalg.solve(H, _np(f) - nle)
