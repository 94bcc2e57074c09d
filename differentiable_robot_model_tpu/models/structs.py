"""RobotStruct: a robot as a static pytree of stacked per-link arrays.

This is the TPU-native inversion of the reference's object-per-link design
(reference: differentiable_robot_model/rigid_body.py:24-76 keeps one
nn.Module per link and walks Python pointers; reference
robot_model.py:104-137 builds the tree). Here the whole robot is a single
dataclass pytree:

- *Differentiable leaves* (jnp arrays, stacked over links/dofs): kinematic and
  dynamic constants. Because algorithms are pure functions of this pytree,
  `jax.grad` w.r.t. any physical parameter works with no module surgery —
  this subsumes the reference's `make_link_param_learnable` mechanism
  (reference robot_model.py:682-689), see models/learnable.py.
- *Static aux data* (hashable tuples): topology (parent indices, joint types,
  names). These drive trace-time loop structure (pointer-doubling FK) and are
  part of the jit cache key.

Topology encodings precomputed here:
- `anc_mask[l, j] = 1` iff link j is on the path root..l (inclusive of l).
  With it, every tree recursion in the dynamics algorithms becomes a dense
  [L, L] matmul (MXU-friendly) instead of a sequential link walk.
- `dof_select[l, d] = 1` iff dof d actuates link l's joint (one-hot scatter /
  gather between dof- and link-indexed arrays).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

JOINT_FIXED = 0
JOINT_REVOLUTE = 1  # includes URDF 'continuous'
JOINT_PRISMATIC = 2

_JOINT_TYPE_CODES = {
    "fixed": JOINT_FIXED,
    "revolute": JOINT_REVOLUTE,
    "continuous": JOINT_REVOLUTE,
    "prismatic": JOINT_PRISMATIC,
}


def joint_type_code(urdf_type: str) -> int:
    if urdf_type not in _JOINT_TYPE_CODES:
        raise NotImplementedError(f"Unsupported URDF joint type: {urdf_type}")
    return _JOINT_TYPE_CODES[urdf_type]


def _is_concrete(x) -> bool:
    return not isinstance(x, jax.core.Tracer)


def _axis_codes_of(axis) -> tuple:
    """(axis_index, sign) per link when the axis is exactly an axis-aligned
    unit vector, else None; all-None when traced."""
    if not _is_concrete(axis):
        return (None,) * axis.shape[0]
    axis_np = np.asarray(axis, np.float64)
    codes = []
    for l in range(axis_np.shape[0]):
        code = None
        for i in range(3):
            for s in (1.0, -1.0):
                unit = np.zeros(3)
                unit[i] = s
                if np.array_equal(axis_np[l], unit):
                    code = (i, int(s))
        codes.append(code)
    return tuple(codes)


def _rpy_zero_of(rot_angles) -> tuple:
    if not _is_concrete(rot_angles):
        return (False,) * rot_angles.shape[0]
    rpy_np = np.asarray(rot_angles, np.float64)
    return tuple(bool((rpy_np[l] == 0.0).all()) for l in range(rpy_np.shape[0]))


def _trans_zero_of(trans) -> tuple:
    if not _is_concrete(trans):
        return ((False,) * 3,) * trans.shape[0]
    trans_np = np.asarray(trans, np.float64)
    return tuple(
        tuple(bool(trans_np[l, j] == 0.0) for j in range(3))
        for l in range(trans_np.shape[0])
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RobotStruct:
    # --- differentiable leaves, stacked over links (L) / dofs (D) ---
    trans: Any  # [L, 3] joint origin xyz in parent frame (urdf_utils.py:51-53)
    rot_angles: Any  # [L, 3] joint origin rpy (urdf_utils.py:48-50)
    axis: Any  # [L, 3] joint axis in the joint frame (urdf_utils.py:73-75)
    mass: Any  # [L] (urdf_utils.py:86-88)
    com: Any  # [L, 3] inertial origin xyz in link frame (urdf_utils.py:89-97)
    inertia_com: Any  # [L, 3, 3] about COM, link frame, inertial rpy folded in
    damping: Any  # [D] joint damping (urdf_utils.py:66-72)
    limit_lower: Any  # [D]
    limit_upper: Any  # [D]
    limit_effort: Any  # [D]
    limit_velocity: Any  # [D]
    # --- constant topology encodings (leaves so they live on-device) ---
    anc_mask: Any  # [L, L] float, anc_mask[l, j] = 1 iff j on path root..l
    dof_select: Any  # [L, D] float one-hot link <-> dof scatter
    rev_mask: Any  # [L] float, 1 where revolute/continuous
    prism_mask: Any  # [L] float, 1 where prismatic
    # --- static aux (hashable; part of the jit cache key) ---
    parent: tuple = dataclasses.field(metadata=dict(static=True))
    joint_types: tuple = dataclasses.field(metadata=dict(static=True))
    dof_links: tuple = dataclasses.field(metadata=dict(static=True))  # per dof -> link idx
    # Static specialization hints for the Pallas kernels (computed from the
    # URDF constants at build time; cleared by learnable overlays that touch
    # the corresponding arrays so specialized code paths never see stale
    # hints). `axis_code[l]` is (axis_index, sign) when the joint axis is
    # EXACTLY an axis-aligned unit vector (true for every reference URDF —
    # SURVEY.md §2 C11), else None. `rpy_zero[l]` is True when the joint
    # origin rpy is exactly (0,0,0).
    axis_code: tuple = dataclasses.field(metadata=dict(static=True))
    rpy_zero: tuple = dataclasses.field(metadata=dict(static=True))
    # Per-link (bool, bool, bool): which joint-origin xyz components are
    # exactly 0.0 (folds translation terms out of the kernels).
    trans_zero: tuple = dataclasses.field(metadata=dict(static=True))
    link_names: tuple = dataclasses.field(metadata=dict(static=True))
    joint_names: tuple = dataclasses.field(metadata=dict(static=True))
    name: str = dataclasses.field(metadata=dict(static=True))

    # ------------------------------------------------------------------
    @property
    def n_links(self) -> int:
        return len(self.parent)

    @property
    def n_dofs(self) -> int:
        return len(self.dof_links)

    @property
    def dtype(self):
        return self.trans.dtype

    def astype(self, dtype) -> "RobotStruct":
        leaves = {
            f.name: getattr(self, f.name)
            for f in dataclasses.fields(self)
            if not f.metadata.get("static", False)
        }
        cast = {k: jnp.asarray(v, dtype) for k, v in leaves.items()}
        return dataclasses.replace(self, **cast)

    def with_arrays(self, **updates) -> "RobotStruct":
        """dataclasses.replace that keeps the static kernel-specialization
        hints consistent with the new arrays.

        Replacing `axis`, `rot_angles`, or `trans` via bare
        `dataclasses.replace` leaves `axis_code`/`rpy_zero`/`trans_zero`
        stale, and the trace-time-specialized Pallas kernels would silently
        bake the OLD values (round-1 advisor finding). This is the
        sanctioned mutation path: hints are recomputed from concrete new
        arrays, or cleared (no specialization) when the new array is traced.
        """
        struct = dataclasses.replace(self, **updates)
        hints = {}
        if "axis" in updates:
            hints["axis_code"] = _axis_codes_of(struct.axis)
        if "rot_angles" in updates:
            hints["rpy_zero"] = _rpy_zero_of(struct.rot_angles)
        if "trans" in updates:
            hints["trans_zero"] = _trans_zero_of(struct.trans)
        return dataclasses.replace(struct, **hints) if hints else struct

    def link_index(self, link_name: str) -> int:
        try:
            return self.link_names.index(link_name)
        except ValueError:
            raise KeyError(
                f"Unknown link '{link_name}' for robot '{self.name}'. "
                f"Available links: {list(self.link_names)}"
            ) from None


def build_struct(
    name: str,
    link_names: list,
    joint_names: list,
    parent: list,
    joint_types: list,
    trans: np.ndarray,
    rot_angles: np.ndarray,
    axis: np.ndarray,
    mass: np.ndarray,
    com: np.ndarray,
    inertia_com: np.ndarray,
    damping_per_link: np.ndarray,
    limits_per_link: np.ndarray,  # [L, 4] lower, upper, effort, velocity
    dtype=jnp.float32,
) -> RobotStruct:
    """Assemble a RobotStruct from per-link numpy data (topo-ordered, root first)."""
    L = len(link_names)
    parent = list(parent)
    assert parent[0] == 0, "root link must be index 0 with self-loop parent"
    for i in range(1, L):
        assert 0 <= parent[i] < i, "links must be topologically ordered"

    # Ancestor mask (inclusive of self; root row/col handled by the self-loop).
    anc = np.zeros((L, L), dtype=np.float64)
    for l in range(L):
        j = l
        anc[l, j] = 1.0
        while j != 0:
            j = parent[j]
            anc[l, j] = 1.0

    dof_links = [l for l in range(L) if joint_types[l] != JOINT_FIXED]
    D = len(dof_links)
    dof_select = np.zeros((L, D), dtype=np.float64)
    for d, l in enumerate(dof_links):
        dof_select[l, d] = 1.0

    rev = np.array([1.0 if t == JOINT_REVOLUTE else 0.0 for t in joint_types])
    prism = np.array([1.0 if t == JOINT_PRISMATIC else 0.0 for t in joint_types])

    damping = damping_per_link[dof_links] if D else np.zeros((0,))
    limits = limits_per_link[dof_links] if D else np.zeros((0, 4))

    axis_code = _axis_codes_of(np.asarray(axis, np.float64))
    rpy_zero = _rpy_zero_of(np.asarray(rot_angles, np.float64))
    trans_zero = _trans_zero_of(np.asarray(trans, np.float64))

    as_arr = lambda x: jnp.asarray(np.asarray(x), dtype)
    return RobotStruct(
        trans=as_arr(trans),
        rot_angles=as_arr(rot_angles),
        axis=as_arr(axis),
        mass=as_arr(mass),
        com=as_arr(com),
        inertia_com=as_arr(inertia_com),
        damping=as_arr(damping),
        limit_lower=as_arr(limits[:, 0]),
        limit_upper=as_arr(limits[:, 1]),
        limit_effort=as_arr(limits[:, 2]),
        limit_velocity=as_arr(limits[:, 3]),
        anc_mask=as_arr(anc),
        dof_select=as_arr(dof_select),
        rev_mask=as_arr(rev),
        prism_mask=as_arr(prism),
        parent=tuple(parent),
        joint_types=tuple(joint_types),
        dof_links=tuple(dof_links),
        axis_code=axis_code,
        rpy_zero=rpy_zero,
        trans_zero=trans_zero,
        link_names=tuple(link_names),
        joint_names=tuple(joint_names),
        name=name,
    )
