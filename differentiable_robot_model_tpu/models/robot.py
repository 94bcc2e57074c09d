"""High-level robot model API: drop-in surface for the reference library.

Mirrors the public API of the reference's DifferentiableRobotModel
(reference: differentiable_robot_model/robot_model.py:87-754 and the named
robots at :757-791) on top of the functional TPU-native core (ops/). Every
compute_* method is backed by a jit-compiled, vmapped pure function over the
RobotStruct pytree; methods accept unbatched [D] or batched [B, D] (or any
leading batch shape) inputs, mirroring the reference's `tensor_check`
normalization (robot_model.py:25-84).

Differences from the reference, by design:
- Stateless: `update_kinematic_state` returns a KinematicState pytree instead
  of mutating per-link objects (there is no hidden device state to keep in
  sync — required for jit/vmap/grad composability).
- Learnable parameters are functional overlays: `make_link_param_learnable`
  registers a constrained parametrization; training code gets explicit
  parameter pytrees from `.parameters()` and passes them back via `params=`
  on any compute_* call (see models/learnable.py). This replaces the
  reference's nn.Module surgery (robot_model.py:682-713).
"""

from __future__ import annotations

import os
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import dynamics as D
from ..ops import kinematics as K
from ..ops.lie import matrix_to_quaternion
from .learnable import LearnableSet
from .structs import RobotStruct
from .urdf import robot_struct_from_urdf

robot_description_folder = os.path.join(os.path.dirname(__file__), "..", "robot_data")
robot_description_folder = os.path.abspath(robot_description_folder)


class KinematicState(NamedTuple):
    """World-frame kinematic state of all links (stacked over links).

    Functional replacement for the state the reference smears across its
    per-link objects in update_kinematic_state (robot_model.py:140-195).
    """

    rot: jnp.ndarray  # [..., L, 3, 3] link world rotations
    pos: jnp.ndarray  # [..., L, 3] link world positions
    subspace: jnp.ndarray  # [..., L, 6] world joint motion subspaces
    vel: jnp.ndarray  # [..., L, 6] world-origin spatial velocities


# ---------------------------------------------------------------------------
# Module-level jitted kernels (cached across model instances by jax.jit).
# ---------------------------------------------------------------------------


@jax.jit
def _fk_all(robot: RobotStruct, q: jnp.ndarray):
    R, p = jax.vmap(lambda qq: K.fk_world_scalar(robot, qq))(q)
    quat = matrix_to_quaternion(R)
    return p, quat


@jax.jit
def _fk_all_tree(robot: RobotStruct, q: jnp.ndarray):
    """Tree-composition FK: pointer-doubling over the parent array (the
    log-depth matmul form, ops/kinematics.fk_compose_doubling). Same
    results as _fk_all's scalar sweep; kept as a genuinely distinct
    implementation behind `recursive=True`, mirroring the reference's dual
    FK surface (tree-recursive robot_model.py:198-221 vs flat :241-248)."""
    R, p = jax.vmap(lambda qq: K.fk_world(robot, qq))(q)
    quat = matrix_to_quaternion(R)
    return p, quat


@jax.jit
def _kin_state(robot: RobotStruct, q: jnp.ndarray, qd: jnp.ndarray) -> KinematicState:
    def one(qq, qqd):
        R, p = K.fk_world_scalar(robot, qq)
        S = K.world_joint_subspaces(robot, R, p)
        V = K.body_velocities(robot, S, qqd)
        return KinematicState(R, p, S, V)

    return jax.vmap(one)(q, qd)


def _jacobian_impl(robot: RobotStruct, q: jnp.ndarray, link_idx: int):
    return jax.vmap(lambda qq: K.link_jacobian(robot, qq, link_idx))(q)


_jacobian = jax.jit(_jacobian_impl, static_argnames=("link_idx",))


def _inverse_dynamics_impl(robot, q, qd, qdd, include_gravity, use_damping):
    from ..ops.dynamics_scalar import rnea_scalar

    # Dof-major layout ([D, B] lanes through the scalar recursion) is the
    # measured winner over per-sample vmap on the chip at small-to-medium
    # batch (DYNOPS_r02.json: +31% at B=1024, parity within noise above).
    return rnea_scalar(robot, q.T, qd.T, qdd.T, include_gravity, use_damping).T


_inverse_dynamics = jax.jit(
    _inverse_dynamics_impl, static_argnames=("include_gravity", "use_damping")
)


def _inverse_dynamics_pallas_impl(robot, q, qd, qdd, include_gravity, use_damping):
    from ..ops.pallas.rnea import rnea_pallas

    return rnea_pallas(robot, q, qd, qdd, include_gravity, use_damping)


# Traced-robot Pallas path (no frozen immediates, robot gradients flow via the
# kernel's scalar VJP); used for explicit id_impl="pallas" with overlays.
_inverse_dynamics_pallas = jax.jit(
    _inverse_dynamics_pallas_impl, static_argnames=("include_gravity", "use_damping")
)

# Auto-dispatch threshold: the compiled Mosaic RNEA kernel only beats the
# scalar-XLA path decisively once the batch is large enough to amortize its
# launch/layout overhead (DYNOPS_r02.json on v5e: +30% at B=65536, mixed or
# losing at B<=16384).
_ID_PALLAS_MIN_BATCH = 32768


def _runs_on_tpu(x) -> bool:
    """Whether `x` will execute on a TPU device: its committed placement when
    it is a concrete on-device array (so `jax.default_device(cpu)` pins on a
    TPU host are respected), else the default backend. Tracers (inside jit)
    have no devices and fall through to the backend check."""
    devs = getattr(x, "devices", None)
    if callable(devs):
        try:
            return next(iter(devs())).platform == "tpu"
        except Exception:
            pass
    return jax.default_backend() == "tpu"


@jax.jit
def _mass_matrix(robot, q):
    from ..ops.dynamics_scalar import mass_matrix_scalar

    return jax.vmap(lambda a: mass_matrix_scalar(robot, a))(q)


def _fd_crb_impl(robot, q, qd, f, include_gravity, use_damping):
    def one(a, b, c):
        return D.forward_dynamics_crb(robot, a, b, c, include_gravity, use_damping)

    return jax.vmap(one)(q, qd, f)


def _fd_aba_impl(robot, q, qd, f, include_gravity, use_damping):
    def one(a, b, c):
        return D.aba(robot, a, b, c, include_gravity, use_damping)

    return jax.vmap(one)(q, qd, f)


_fd_crb = jax.jit(_fd_crb_impl, static_argnames=("include_gravity", "use_damping"))
_fd_aba = jax.jit(_fd_aba_impl, static_argnames=("include_gravity", "use_damping"))


class DifferentiableRobotModel:
    """Drop-in counterpart of reference DifferentiableRobotModel
    (robot_model.py:87)."""

    def __init__(self, urdf_path: str, name: str = "", dtype=jnp.float32):
        self.name = name
        self.urdf_path = urdf_path
        self._struct = robot_struct_from_urdf(urdf_path, name=name, dtype=dtype)
        self._dtype = dtype
        self._learnables = LearnableSet(self._struct)

    # -- struct / parameter plumbing ------------------------------------
    @property
    def struct(self) -> RobotStruct:
        """The robot as a pytree of stacked arrays (with learnable overlays
        applied from stored values)."""
        return self._learnables.apply(None)

    @property
    def _n_dofs(self) -> int:  # reference-compatible attribute name
        return self._struct.n_dofs

    @property
    def n_dofs(self) -> int:
        return self._struct.n_dofs

    def _resolved(self, params) -> RobotStruct:
        return self._learnables.apply(params)

    # -- input normalization (reference tensor_check, robot_model.py:25-84) --
    def _norm(self, *arrays):
        arrs = [jnp.asarray(a, self._dtype) for a in arrays]
        batch_shape = arrs[0].shape[:-1]
        for a in arrs:
            assert a.shape[:-1] == batch_shape, "Batch size mismatch between inputs."
        flat = [a.reshape((-1, a.shape[-1])) for a in arrs]
        return flat, batch_shape

    @staticmethod
    def _denorm(x, batch_shape):
        return x.reshape(batch_shape + x.shape[1:])

    # -- kinematics ------------------------------------------------------
    def update_kinematic_state(self, q, qd, params=None) -> KinematicState:
        """Compute (stateless) world poses/velocities of all links.

        Counterpart of reference update_kinematic_state
        (robot_model.py:140-195), returning the state instead of mutating it.
        """
        (q2, qd2), bs = self._norm(q, qd)
        ks = _kin_state(self._resolved(params), q2, qd2)
        return KinematicState(*[self._denorm(x, bs) for x in ks])

    def compute_forward_kinematics(
        self, q, link_name: str, recursive: bool = False, params=None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Translation and rotation (quaternion, (x,y,z,w)) of one link.

        Counterpart of reference compute_forward_kinematics
        (robot_model.py:224-248). Like the reference, `recursive` selects a
        genuinely distinct implementation producing identical results: the
        tree-composition (pointer-doubling matmul) FK vs the default scalar
        topological sweep (cross-checked in tests/test_structs.py and both
        oracle-tested).
        """
        (q2,), bs = self._norm(q)
        idx = self._struct.link_index(link_name)
        fk = _fk_all_tree if recursive else _fk_all
        pos, quat = fk(self._resolved(params), q2)
        return self._denorm(pos[:, idx], bs), self._denorm(quat[:, idx], bs)

    def compute_forward_kinematics_all_links(
        self, q, params=None
    ) -> Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]:
        """Counterpart of reference compute_forward_kinematics_all_links
        (robot_model.py:198-221)."""
        (q2,), bs = self._norm(q)
        pos, quat = _fk_all(self._resolved(params), q2)
        return {
            ln: (self._denorm(pos[:, i], bs), self._denorm(quat[:, i], bs))
            for i, ln in enumerate(self._struct.link_names)
        }

    def compute_endeffector_jacobian(
        self, q, link_name: str, params=None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Geometric Jacobian (linear, angular): [..., 3, D].

        Counterpart of reference compute_endeffector_jacobian
        (robot_model.py:627-667).
        """
        (q2,), bs = self._norm(q)
        idx = self._struct.link_index(link_name)
        lin, ang = _jacobian(self._resolved(params), q2, idx)
        return self._denorm(lin, bs), self._denorm(ang, bs)

    # -- dynamics --------------------------------------------------------
    def compute_inverse_dynamics(
        self, q, qd, qdd_des, include_gravity: bool = True, use_damping: bool = True,
        params=None, id_impl: str = "auto",
    ) -> jnp.ndarray:
        """RNEA torques. Counterpart of reference compute_inverse_dynamics
        (robot_model.py:306-375).

        id_impl selects the backend implementation (per-shape winners measured
        on v5e, DYNOPS_r02.json):
          - "scalar": dof-major scalar-XLA recursion (default winner at
            B<=16384; fully differentiable incl. robot parameters).
          - "pallas": fused single-launch Mosaic kernel (winner at B>=32768 on
            TPU; robot gradients via its scalar VJP). Requires the TPU
            backend.
          - "auto": "pallas" on TPU for flat batches >= 32768 with no
            learnable overlays (the frozen-immediates deployment mode),
            "scalar" otherwise. Dispatch keys on where the inputs will
            actually run (their committed device when they have one, the
            default backend otherwise), so CPU-pinned calls on a TPU host
            stay on the scalar path.
        """
        if id_impl not in ("auto", "scalar", "pallas"):
            raise ValueError(
                f"id_impl must be 'auto', 'scalar', or 'pallas'; got {id_impl!r}"
            )
        (q2, qd2, qdd2), bs = self._norm(q, qd, qdd_des)
        use_pallas = id_impl == "pallas" or (
            id_impl == "auto"
            and q2.shape[0] >= _ID_PALLAS_MIN_BATCH
            and _runs_on_tpu(q2)
            and params is None
            and not self._learnables._entries
        )
        if use_pallas:
            if params is None and not self._learnables._entries:
                tau = self._id_pallas_frozen(include_gravity, use_damping)(
                    q2, qd2, qdd2
                )
            else:
                tau = _inverse_dynamics_pallas(
                    self._resolved(params), q2, qd2, qdd2,
                    include_gravity, use_damping,
                )
        else:
            tau = _inverse_dynamics(
                self._resolved(params), q2, qd2, qdd2, include_gravity, use_damping
            )
        return self._denorm(tau, bs)

    def _id_pallas_frozen(self, include_gravity: bool, use_damping: bool):
        """Cached jit of the Pallas RNEA kernel closed over the concrete
        struct, so robot constants bake in as float immediates (the kernel's
        deployment mode). Only valid while no learnable overlays exist —
        callers guard on that."""
        key = (include_gravity, use_damping)
        cache = getattr(self, "_id_pallas_cache", None)
        if cache is None:
            cache = self._id_pallas_cache = {}
        if key not in cache:
            from ..ops.pallas.rnea import rnea_pallas

            struct = self._struct
            cache[key] = jax.jit(
                lambda a, b, c: rnea_pallas(
                    struct, a, b, c, include_gravity, use_damping
                )
            )
        return cache[key]

    def compute_non_linear_effects(
        self, q, qd, include_gravity: bool = True, use_damping: bool = True, params=None
    ) -> jnp.ndarray:
        """Counterpart of reference compute_non_linear_effects
        (robot_model.py:378-400)."""
        zeros = jnp.zeros_like(jnp.asarray(q, self._dtype))
        return self.compute_inverse_dynamics(
            q, qd, zeros, include_gravity, use_damping, params=params
        )

    def compute_lagrangian_inertia_matrix(
        self, q, include_gravity: bool = True, use_damping: bool = True, params=None
    ) -> jnp.ndarray:
        """Joint-space mass matrix H(q): [..., D, D].

        Counterpart of reference compute_lagrangian_inertia_matrix
        (robot_model.py:403-450). The flags are accepted for parity; H is
        mathematically independent of gravity and damping (the reference
        subtracts the gravity term it first adds, and the damping term
        vanishes at qd=0), so they are unused here.
        """
        del include_gravity, use_damping
        (q2,), bs = self._norm(q)
        H = _mass_matrix(self._resolved(params), q2)
        return self._denorm(H, bs)

    def compute_forward_dynamics(
        self,
        q,
        qd,
        f,
        include_gravity: bool = True,
        use_damping: bool = False,
        method: str = "crb",
        params=None,
    ) -> jnp.ndarray:
        """Forward dynamics qdd from applied torques f.

        Counterpart of reference compute_forward_dynamics (ABA,
        robot_model.py:488-624). method="crb" uses the all-matmul mass-matrix
        solve (fastest on TPU); method="aba" runs the O(L) articulated body
        algorithm (reference-equivalent recursion).
        """
        (q2, qd2, f2), bs = self._norm(q, qd, f)
        fn = _fd_crb if method == "crb" else _fd_aba
        qdd = fn(self._resolved(params), q2, qd2, f2, include_gravity, use_damping)
        return self._denorm(qdd, bs)

    def compute_forward_dynamics_old(
        self, q, qd, f, include_gravity: bool = True, use_damping: bool = True,
        params=None,
    ) -> jnp.ndarray:
        """Euler-Lagrange solve parity alias (reference
        robot_model.py:453-485; note its use_damping default is True)."""
        return self.compute_forward_dynamics(
            q, qd, f, include_gravity, use_damping, method="crb", params=params
        )

    # -- learnable parameters -------------------------------------------
    def make_link_param_learnable(self, link_name: str, parameter_name: str, parametrization):
        """Swap a physical constant for a constrained learnable parametrization.

        Counterpart of reference make_link_param_learnable
        (robot_model.py:682-689). `parametrization` is one of
        models/parametrizations.py (pure-function analogues of the
        reference's rigid_body_params.py modules).
        """
        self._learnables.register(link_name, parameter_name, parametrization)

    def freeze_learnable_link_param(self, link_name: str, parameter_name: str):
        """Counterpart of reference freeze_learnable_link_param
        (robot_model.py:691-701)."""
        self._learnables.freeze(link_name, parameter_name)

    def unfreeze_learnable_link_param(self, link_name: str, parameter_name: str):
        """Counterpart of reference unfreeze_learnable_link_param
        (robot_model.py:703-713)."""
        self._learnables.unfreeze(link_name, parameter_name)

    def parameters(self) -> dict:
        """Trainable (unfrozen) unconstrained parameters as a pytree."""
        return self._learnables.parameters()

    def set_parameters(self, params: dict) -> None:
        """Store trained parameter values back into the model."""
        self._learnables.set_parameters(params)

    def print_learnable_params(self) -> None:
        """Counterpart of reference print_learnable_params
        (robot_model.py:747-754)."""
        for key, val in jax.tree_util.tree_leaves_with_path(self.parameters()):
            print(f"{jax.tree_util.keystr(key)}: {val}")

    # -- misc ------------------------------------------------------------
    def get_joint_limits(self) -> List[Dict[str, float]]:
        """Counterpart of reference get_joint_limits (robot_model.py:715-724)."""
        s = self._struct
        return [
            {
                "lower": float(s.limit_lower[d]),
                "upper": float(s.limit_upper[d]),
                "effort": float(s.limit_effort[d]),
                "velocity": float(s.limit_velocity[d]),
            }
            for d in range(s.n_dofs)
        ]

    def get_link_names(self) -> List[str]:
        """Counterpart of reference get_link_names (robot_model.py:726-736)."""
        return list(self._struct.link_names)

    def print_link_names(self) -> None:
        for n in self.get_link_names():
            print(n)


# ---------------------------------------------------------------------------
# Named robots (reference robot_model.py:757-791; TrifingerEdu is exported
# here unlike the reference, which defines but does not export it).
# ---------------------------------------------------------------------------


def _bundled(rel_path: str) -> str:
    return os.path.join(robot_description_folder, rel_path)


class DifferentiableKUKAiiwa(DifferentiableRobotModel):
    def __init__(self, dtype=jnp.float32):
        super().__init__(
            _bundled("kuka_iiwa_iiwa7.urdf"), "differentiable_kuka_iiwa", dtype
        )


class DifferentiableFrankaPanda(DifferentiableRobotModel):
    def __init__(self, dtype=jnp.float32):
        super().__init__(
            _bundled("panda_no_gripper.urdf"), "differentiable_franka_panda", dtype
        )


class DifferentiableTwoLinkRobot(DifferentiableRobotModel):
    def __init__(self, dtype=jnp.float32):
        super().__init__(_bundled("2link_robot.urdf"), "diff_2d_robot", dtype)


class DifferentiableTrifingerEdu(DifferentiableRobotModel):
    def __init__(self, dtype=jnp.float32):
        super().__init__(_bundled("trifinger_edu.urdf"), "trifinger_edu", dtype)


class DifferentiableAllegroHand(DifferentiableRobotModel):
    def __init__(self, dtype=jnp.float32):
        super().__init__(
            _bundled("allegro_hand_left.urdf"), "differentiable_allegro_hand", dtype
        )


class DifferentiableFetchArm(DifferentiableRobotModel):
    def __init__(self, dtype=jnp.float32):
        super().__init__(
            _bundled("fetch_arm_no_gripper.urdf"), "differentiable_fetch_arm", dtype
        )


class DifferentiableKinovaJaco(DifferentiableRobotModel):
    def __init__(self, dtype=jnp.float32):
        super().__init__(_bundled("kinova_jaco.urdf"), "differentiable_kinova_jaco", dtype)


class DifferentiablePandaWithGripper(DifferentiableRobotModel):
    """Franka Panda with the two-finger gripper (9 dof: 7 revolute +
    2 prismatic fingers).

    The reference ships this URDF (diff_robot_data/panda_description/urdf/
    panda.urdf) but cannot run it: its axis-select FK
    (rigid_body.py:102-107) has no prismatic-joint support.
    """

    def __init__(self, dtype=jnp.float32):
        super().__init__(
            _bundled("panda_with_gripper.urdf"), "differentiable_panda_with_gripper", dtype
        )


class DifferentiableFetchFull(DifferentiableRobotModel):
    """Full Fetch mobile manipulator (14 dof over 3 branches: prismatic
    torso lift, head pan/tilt, 7-dof arm, prismatic gripper fingers).

    The reference ships this URDF (diff_robot_data/fetch_description/urdf/
    fetch.urdf) but never exercises it.
    """

    def __init__(self, dtype=jnp.float32):
        super().__init__(_bundled("fetch_full.urdf"), "differentiable_fetch_full", dtype)


class DifferentiableKukaIiwaAllegro(DifferentiableRobotModel):
    """KUKA iiwa7 arm with the Allegro hand mounted (23 dof: 7 arm +
    16 fingers over 4 branches — the deepest bundled tree, 28 joints).

    The reference ships this URDF (diff_robot_data/kuka_iiwa/urdf/
    iiwa7_allegro.urdf) but never exercises it.
    """

    def __init__(self, dtype=jnp.float32):
        super().__init__(
            _bundled("kuka_iiwa7_allegro.urdf"),
            "differentiable_kuka_iiwa_allegro",
            dtype,
        )


class DifferentiableKinovaJacoFull(DifferentiableRobotModel):
    """Full j2n6s300: 6-dof arm plus the 3-finger hand (12 dof, branched).

    The reference ships this URDF (diff_robot_data/kinova_description/urdf/
    jaco.urdf) but only exercises the finger-less jaco_clean variant.
    """

    def __init__(self, dtype=jnp.float32):
        super().__init__(
            _bundled("kinova_jaco_full.urdf"), "differentiable_kinova_jaco_full", dtype
        )
