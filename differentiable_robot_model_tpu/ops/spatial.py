"""Spatial (Plücker) vector algebra on stacked arrays, world-frame oriented.

TPU-native counterpart of the reference's object-per-vector spatial algebra
(reference: differentiable_robot_model/spatial_vector_algebra.py:175-372).
The reference keeps spatial vectors as (lin, ang) pairs of per-object tensors
and transforms between per-link frames; here a spatial vector is a single
(..., 6) array in Featherstone ordering [angular(3), linear(3)], and the
dynamics algorithms express all quantities in a single inertial (world) frame
at the world origin, so cross-link "transforms" disappear entirely — tree
propagation becomes masked matmuls (see ops/dynamics.py).

Conventions:
- Motion vector  m = [omega, v]     (angular on top)  — matches the ordering of
  reference SpatialMotionVec.get_vector (spatial_vector_algebra.py:238-239).
- Force vector   f = [n, f]         (torque on top)   — matches reference
  SpatialForceVec.get_vector (spatial_vector_algebra.py:293-294).
- Spatial inertia of a body with mass m, COM c (from the reference point) and
  rotational inertia about COM I_c:
      I = [[ I_c + m c~ c~^T ,  m c~ ],
           [      -m c~      ,  m 1  ]]
  identical to reference DifferentiableSpatialRigidBodyInertia.get_spatial_mat
  (spatial_vector_algebra.py:340-372).
"""

from __future__ import annotations

import jax.numpy as jnp

from .lie import skew


def motion_cross_motion(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Spatial cross product m1 x m2 (crm).

    Counterpart of reference SpatialMotionVec.cross_motion_vec
    (spatial_vector_algebra.py:204-213).
    (..., 6) x (..., 6) -> (..., 6).
    """
    w1, v1 = a[..., :3], a[..., 3:]
    w2, v2 = b[..., :3], b[..., 3:]
    ang = jnp.cross(w1, w2)
    lin = jnp.cross(w1, v2) + jnp.cross(v1, w2)
    return jnp.concatenate([ang, lin], axis=-1)


def motion_cross_force(m: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Spatial cross product m x* f (crf).

    Counterpart of reference SpatialMotionVec.cross_force_vec
    (spatial_vector_algebra.py:215-224).
    """
    w, v = m[..., :3], m[..., 3:]
    n, fl = f[..., :3], f[..., 3:]
    ang = jnp.cross(w, n) + jnp.cross(v, fl)
    lin = jnp.cross(w, fl)
    return jnp.concatenate([ang, lin], axis=-1)


def spatial_inertia_matrix(
    mass: jnp.ndarray, com: jnp.ndarray, inertia_com: jnp.ndarray
) -> jnp.ndarray:
    """Build the 6x6 spatial inertia about a reference point.

    Args:
      mass: (...,) body mass.
      com: (..., 3) COM position relative to the reference point, expressed in
        the frame the result should live in.
      inertia_com: (..., 3, 3) rotational inertia about the COM in that frame.

    Returns (..., 6, 6). Counterpart of reference
    DifferentiableSpatialRigidBodyInertia.get_spatial_mat
    (spatial_vector_algebra.py:340-372), but batched and frame-agnostic.
    """
    c_skew = skew(com)
    m = mass[..., None, None]
    i_o = inertia_com + m * (c_skew @ jnp.swapaxes(c_skew, -1, -2))
    mc = m * c_skew
    eye = jnp.broadcast_to(jnp.eye(3, dtype=inertia_com.dtype), c_skew.shape)
    top = jnp.concatenate([i_o, mc], axis=-1)
    bot = jnp.concatenate([-mc, m * eye], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def inertia_times_motion(
    mass: jnp.ndarray, com: jnp.ndarray, inertia_com: jnp.ndarray, m_vec: jnp.ndarray
) -> jnp.ndarray:
    """I @ m without materializing the 6x6 (cheaper on the VPU).

    Counterpart of reference
    DifferentiableSpatialRigidBodyInertia.multiply_motion_vec
    (spatial_vector_algebra.py:321-338):
      n = I_o w + m c x v ;  f = m v - m c x w   (with I_o = I_c + m c~ c~^T)
    """
    w, v = m_vec[..., :3], m_vec[..., 3:]
    mc = mass[..., None] * com
    c_skew = skew(com)
    i_o = inertia_com + mass[..., None, None] * (c_skew @ jnp.swapaxes(c_skew, -1, -2))
    n = jnp.einsum("...ij,...j->...i", i_o, w) + jnp.cross(mc, v)
    f = mass[..., None] * v - jnp.cross(mc, w)
    return jnp.concatenate([n, f], axis=-1)


def motion_dot_force(m: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Scalar product <m, f> = w.n + v.f (power pairing).

    Counterpart of reference SpatialMotionVec.dot / SpatialForceVec.dot
    (spatial_vector_algebra.py:247-250, :302-305).
    """
    return jnp.sum(m * f, axis=-1)


def motion_to_world(R: jnp.ndarray, p: jnp.ndarray, m_local: jnp.ndarray) -> jnp.ndarray:
    """Re-express a motion vector from a frame (R, p) into world-origin coords.

    omega_w = R omega ; v_w = R v + p x omega_w.
    Counterpart of reference SpatialMotionVec.transform
    (spatial_vector_algebra.py:226-236) specialized to frame -> world.
    """
    w = jnp.einsum("...ij,...j->...i", R, m_local[..., :3])
    v = jnp.einsum("...ij,...j->...i", R, m_local[..., 3:]) + jnp.cross(p, w)
    return jnp.concatenate([w, v], axis=-1)


def force_to_world(R: jnp.ndarray, p: jnp.ndarray, f_local: jnp.ndarray) -> jnp.ndarray:
    """Re-express a force vector from a frame (R, p) into world-origin coords.

    f_w = R f ; n_w = R n + p x f_w.
    Counterpart of reference SpatialForceVec.transform
    (spatial_vector_algebra.py:281-291) specialized to frame -> world.
    """
    f = jnp.einsum("...ij,...j->...i", R, f_local[..., 3:])
    n = jnp.einsum("...ij,...j->...i", R, f_local[..., :3]) + jnp.cross(p, f)
    return jnp.concatenate([n, f], axis=-1)


def force_at_point(f_world: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Moment part of a world-origin force vector re-referenced to point p.

    n_p = n_w - p x f. Returns (..., 6) with the same linear part.
    """
    n = f_world[..., :3] - jnp.cross(p, f_world[..., 3:])
    return jnp.concatenate([n, f_world[..., 3:]], axis=-1)


def transform_compose(
    R1: jnp.ndarray, p1: jnp.ndarray, R2: jnp.ndarray, p2: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compose rigid transforms: (R1, p1) o (R2, p2) = (R1 R2, R1 p2 + p1).

    Counterpart of reference CoordinateTransform.multiply_transform
    (spatial_vector_algebra.py:98-103).
    """
    R = R1 @ R2
    p = jnp.einsum("...ij,...j->...i", R1, p2) + p1
    return R, p


def transform_inverse(R: jnp.ndarray, p: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Invert a rigid transform. Reference CoordinateTransform.inverse
    (spatial_vector_algebra.py:92-96)."""
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, p)


def transform_apply(R: jnp.ndarray, p: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Apply a rigid transform to points: R x + p."""
    return jnp.einsum("...ij,...j->...i", R, x) + p
