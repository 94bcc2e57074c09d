"""Dataset generation utilities for model learning.

TPU-native counterpart of the reference's data utilities
(reference: differentiable_robot_model/data_utils.py). Datasets are plain
dicts of stacked jnp arrays (device-resident, directly mini-batchable with
`jax.random.permutation` + slicing) instead of torch Dataset objects; the
sine-trajectory generators mirror the reference's waveforms exactly.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def generate_random_forward_kinematics_data(
    robot_model, n_data: int, ee_name: str, seed: int = 0
) -> Dict[str, jnp.ndarray]:
    """Random q within limits -> end-effector positions.

    Counterpart of reference generate_random_forward_kinematics_data
    (data_utils.py:49-67).
    """
    limits = robot_model.get_joint_limits()
    lo = np.array([l["lower"] for l in limits])
    hi = np.array([l["upper"] for l in limits])
    rng = np.random.default_rng(seed)
    q = rng.uniform(lo, hi, (n_data, robot_model.n_dofs))
    ee_pos, _ = robot_model.compute_forward_kinematics(q, ee_name)
    return {"q": jnp.asarray(q), "ee_pos": jnp.asarray(ee_pos)}


def generate_random_inverse_dynamics_data(
    robot_model, n_data: int, seed: int = 0
) -> Dict[str, jnp.ndarray]:
    """Random (q, qd, qdd) within limits -> torques.

    Counterpart of reference generate_random_inverse_dynamics_data
    (data_utils.py:70-109) — generalized to any dof count (the reference
    hardcodes 7 at data_utils.py:81).
    """
    limits = robot_model.get_joint_limits()
    lo = np.array([l["lower"] for l in limits])
    hi = np.array([l["upper"] for l in limits])
    vel = np.array([l["velocity"] for l in limits])
    rng = np.random.default_rng(seed)
    D = robot_model.n_dofs
    q = rng.uniform(lo, hi, (n_data, D))
    qd = rng.uniform(-vel, vel, (n_data, D))
    qdd = rng.uniform(-vel, vel, (n_data, D))
    tau = robot_model.compute_inverse_dynamics(q, qd, qdd)
    return {
        "q": jnp.asarray(q),
        "qd": jnp.asarray(qd),
        "qdd": jnp.asarray(qdd),
        "tau": jnp.asarray(tau),
    }


def _sine_trajectories(n_data: int, n_dofs: int, dt: float = 1.0 / 250.0):
    """Per-dof sine sweeps with varying amplitude/period, analytic qd/qdd.

    Same waveform family as the reference's sine generators
    (data_utils.py:112-145: q = A sin(2 pi t / T) per dof with staggered
    amplitude/period), with exact analytic derivatives.
    """
    t = np.arange(n_data) * dt
    q = np.zeros((n_data, n_dofs))
    qd = np.zeros((n_data, n_dofs))
    qdd = np.zeros((n_data, n_dofs))
    for j in range(n_dofs):
        A = 0.5 + 0.1 * j
        T = 2.0 + 0.3 * j
        w = 2.0 * np.pi / T
        q[:, j] = A * np.sin(w * t)
        qd[:, j] = A * w * np.cos(w * t)
        qdd[:, j] = -A * w * w * np.sin(w * t)
    return q, qd, qdd


def generate_sine_motion_inverse_dynamics_data(
    robot_model, n_data: int, dt: float = 1.0 / 250.0
) -> Dict[str, jnp.ndarray]:
    """Sine trajectories -> torques (mimics real-robot data collection).

    Counterpart of reference generate_sine_motion_inverse_dynamics_data
    (data_utils.py:112-145).
    """
    q, qd, qdd = _sine_trajectories(n_data, robot_model.n_dofs, dt)
    tau = robot_model.compute_inverse_dynamics(q, qd, qdd)
    return {
        "q": jnp.asarray(q),
        "qd": jnp.asarray(qd),
        "qdd": jnp.asarray(qdd),
        "tau": jnp.asarray(tau),
    }


def generate_sine_motion_forward_dynamics_data(
    robot_model, n_data: int, dt: float = 1.0 / 250.0
) -> Dict[str, jnp.ndarray]:
    """Sine trajectories + their ID torques -> accelerations.

    Counterpart of reference generate_sine_motion_forward_dynamics_data
    (data_utils.py:148-181).
    """
    q, qd, qdd = _sine_trajectories(n_data, robot_model.n_dofs, dt)
    tau = robot_model.compute_inverse_dynamics(q, qd, qdd)
    return {
        "q": jnp.asarray(q),
        "qd": jnp.asarray(qd),
        "qdd": jnp.asarray(qdd),
        "tau": jnp.asarray(tau),
    }


class InverseDynamicsDataset:
    """Indexable view over an inverse-dynamics dataset dict.

    Counterpart of the reference's torch Dataset wrapper
    (data_utils.py:13-28): index -> [q, qd, qdd, tau]; `var()` is the
    per-dof torque variance used by NMSE losses. Arrays stay
    device-resident jnp arrays; iteration/minibatching should use
    `minibatches` (DataLoader replacement) — this class exists for the
    reference's dataset-object idiom.
    """

    _target_key = "tau"

    def __init__(self, data: Dict[str, jnp.ndarray]):
        self.data = data

    def __getitem__(self, index):
        d = self.data
        return [d["q"][index], d["qd"][index], d["qdd"][index], d["tau"][index]]

    def __len__(self) -> int:
        return int(self.data["q"].shape[0])

    def var(self) -> jnp.ndarray:
        return jnp.var(self.data[self._target_key], axis=0)


class ForwardDynamicsDataset(InverseDynamicsDataset):
    """Same view, with `var()` over accelerations (data_utils.py:31-46)."""

    _target_key = "qdd"


def minibatches(data: Dict[str, jnp.ndarray], batch_size: int, key, keys=None):
    """Shuffled minibatch iterator over a dict-of-arrays dataset.

    Functional replacement for the reference's torch DataLoader usage
    (data_utils.py:13-46 Dataset classes).
    """
    import jax

    names = list(data.keys())
    n = data[names[0]].shape[0]
    perm = jax.random.permutation(key, n)
    for start in range(0, n - batch_size + 1, batch_size):
        idx = perm[start : start + batch_size]
        yield {k: data[k][idx] for k in (keys or names)}
