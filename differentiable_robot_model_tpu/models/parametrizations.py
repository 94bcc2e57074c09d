"""Physically-constrained parameter reparametrizations (pure functions).

Functional counterparts of the reference's nn.Module parametrizations
(reference: differentiable_robot_model/rigid_body_params.py) — the L4DC
"encoding physical constraints" machinery. Each parametrization is a small
object with two pure methods:

    init_value() -> unconstrained parameter pytree (numpy, host-side)
    apply(params) -> constrained value (jnp, differentiable, jit-safe)

Training code owns the parameter pytree explicitly (optax-style) instead of
the reference's module surgery; see models/learnable.py for the overlay
mechanism that splices `apply(params)` results into a RobotStruct.

Initialization-from-value math (SVD / Cholesky / triangle-inequality
decompositions) mirrors the reference's constructors:
- PositiveScalar sqrt reparam: rigid_body_params.py:26-43
- Cholesky SPD: rigid_body_params.py:86-132, :341-383
- Triangle-inequality principal moments + SO(3) orientation:
  rigid_body_params.py:135-242
- Wensing density-covariance: rigid_body_params.py:245-338
- Symmetric (indefinite): rigid_body_params.py:59-83, :386-403
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..ops.lie import exp_so3

_DIAG3 = np.diag_indices(3)
_TRIL3 = np.tril_indices(3, k=-1)


def _vec6_from_mat(M: np.ndarray) -> np.ndarray:
    """[diag(3), lower-tri row-major (1,0),(2,0),(2,1)] — same layout the
    reference init code uses (rigid_body_params.py:294-309)."""
    return np.concatenate([M[_DIAG3], M[_TRIL3]])


def _mat_from_vec6(l: jnp.ndarray) -> jnp.ndarray:
    """Lower-triangular 3x3 from the 6-vector layout above (jit-safe)."""
    d, t = l[:3], l[3:]
    z = jnp.zeros((), l.dtype)
    return jnp.stack(
        [
            jnp.stack([d[0], z, z]),
            jnp.stack([t[0], d[1], z]),
            jnp.stack([t[1], t[2], d[2]]),
        ]
    )


class UnconstrainedScalar:
    """Reference rigid_body_params.py:14-23."""

    def __init__(self, init_val=None, rng: np.random.Generator | None = None):
        rng = rng or np.random.default_rng()
        self._init = float(init_val) if init_val is not None else float(rng.random())

    def init_value(self):
        return np.asarray(self._init)

    def apply(self, params):
        return jnp.asarray(params)


class PositiveScalar:
    """value = l^2 + min_val. Reference rigid_body_params.py:26-43."""

    def __init__(self, min_val=0.0, init_param_std=1.0, init_param=None, rng=None):
        rng = rng or np.random.default_rng()
        self.min_val = float(min_val)
        if init_param is None:
            self._init = float(rng.normal(0.0, init_param_std))
        else:
            assert init_param > self.min_val
            self._init = float(np.sqrt(float(init_param) - self.min_val))

    def init_value(self):
        return np.asarray(self._init)

    def apply(self, params):
        p = jnp.asarray(params)
        return p * p + self.min_val


class UnconstrainedTensor:
    """Reference rigid_body_params.py:46-56."""

    def __init__(self, shape, init_tensor=None, init_std=0.1, rng=None):
        rng = rng or np.random.default_rng()
        self.shape = tuple(shape)
        if init_tensor is None:
            self._init = rng.normal(0.0, init_std, self.shape)
        else:
            self._init = np.asarray(init_tensor, dtype=np.float64).reshape(self.shape)

    def init_value(self):
        return np.asarray(self._init)

    def apply(self, params):
        return jnp.asarray(params).reshape(self.shape)


class Symm3DInertiaMatrix:
    """Symmetric (possibly indefinite) 3x3 from 6 free params.

    Reference SymmMatNet + Symm3DInertiaMatrixNet
    (rigid_body_params.py:59-83, :386-403).
    """

    def __init__(self, init_param_std=0.01, init_param=None, rng=None):
        rng = rng or np.random.default_rng()
        if init_param is None:
            self._init = rng.normal(0.0, init_param_std, (6,))
        else:
            self._init = _vec6_from_mat(np.asarray(init_param, dtype=np.float64))

    def init_value(self):
        return np.asarray(self._init)

    def apply(self, params):
        L = _mat_from_vec6(jnp.asarray(params))
        diag = jnp.diag(jnp.diagonal(L))
        return L + L.T - diag


class SymmPosDef3DInertiaMatrix:
    """SPD 3x3 via Cholesky: M = L L^T + bias I.

    Reference CholeskyNet + SymmPosDef3DInertiaMatrixNet
    (rigid_body_params.py:86-132, :341-383).
    """

    def __init__(self, bias=1e-7, init_param_std=0.01, init_param=None, rng=None):
        rng = rng or np.random.default_rng()
        self.bias = float(bias)
        if init_param is None:
            self._init = rng.normal(0.0, init_param_std, (6,))
        else:
            M = np.asarray(init_param, dtype=np.float64)
            L = np.linalg.cholesky(M - self.bias * np.eye(3))
            self._init = _vec6_from_mat(L)

    def init_value(self):
        return np.asarray(self._init)

    def apply(self, params):
        L = _mat_from_vec6(jnp.asarray(params))
        return L @ L.T + self.bias * jnp.eye(3, dtype=L.dtype)


class TriangParam3DInertiaMatrix:
    """Principal moments satisfying the triangle inequality + SO(3) orientation.

    J1, J2 > bias (sqrt-reparam); J3 = sqrt(J1^2 + J2^2 - 2 J1 J2 cos(alpha))
    with alpha = pi*sigmoid(raw) in (0, pi); M = R diag(J) R^T with
    R = exp_so3(w). Reference TriangParam3DInertiaMatrixNet
    (rigid_body_params.py:135-242), including the SVD-based init.
    """

    def __init__(self, bias, init_param_std=0.01, init_param=None, rng=None):
        rng = rng or np.random.default_rng()
        self.bias = float(bias)
        if init_param is None:
            self._init = {
                "ori": rng.normal(0.0, init_param_std, (3,)),
                "j1": float(rng.normal(0.0, 0.1)),
                "j2": float(rng.normal(0.0, 0.1)),
                "alpha": rng.normal(0.0, init_param_std, ()),
            }
        else:
            M = np.asarray(init_param, dtype=np.float64)
            R, J_diag, _ = np.linalg.svd(M, full_matrices=True)
            if np.linalg.det(R) < 0.0:
                R = R.copy()
                R[:, 0] = -R[:, 0]
            # log map SO(3) -> rotation vector (host-side, float64)
            cos_t = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
            theta = np.arccos(cos_t)
            if theta < 1e-12:
                w = np.zeros(3)
            else:
                w = (
                    theta
                    / (2.0 * np.sin(theta))
                    * np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
                )
            J1, J2, J3 = J_diag[0], J_diag[1], J_diag[2]
            assert J1 > self.bias and J2 > self.bias, (
                f"principal moments ({J1:.3g}, {J2:.3g}) must exceed the "
                f"bias {self.bias:.3g}; lower `bias` for this inertia"
            )
            alpha = np.arccos(
                np.clip((J1 * J1 + J2 * J2 - J3 * J3) / (2.0 * J1 * J2), -1.0, 1.0)
            )
            a = np.clip(alpha / math.pi, 1e-9, 1 - 1e-9)
            self._init = {
                "ori": w,
                "j1": float(np.sqrt(J1 - self.bias)),
                "j2": float(np.sqrt(J2 - self.bias)),
                "alpha": np.asarray(np.log(a / (1.0 - a))),
            }

    def init_value(self):
        return {k: np.asarray(v) for k, v in self._init.items()}

    def apply(self, params):
        j1 = jnp.asarray(params["j1"])
        j2 = jnp.asarray(params["j2"])
        J1 = j1 * j1 + self.bias
        J2 = j2 * j2 + self.bias
        alpha = math.pi * jax_sigmoid(jnp.asarray(params["alpha"]))
        J3 = jnp.sqrt(J1 * J1 + J2 * J2 - 2.0 * J1 * J2 * jnp.cos(alpha))
        J = jnp.diag(jnp.stack([J1, J2, J3]))
        R = exp_so3(jnp.asarray(params["ori"]))
        return R @ J @ R.T


def jax_sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))


class CovParameterized3DInertiaMatrix:
    """Inertia via SPD density-weighted covariance (Wensing et al. 2017).

    Sigma = L L^T + bias I ;  I_mat = trace(Sigma) eye - Sigma (and back).
    Reference CovParameterized3DInertiaMatrixNet
    (rigid_body_params.py:245-338).
    """

    def __init__(self, bias=1e-7, init_param_std=0.01, init_param=None, rng=None):
        rng = rng or np.random.default_rng()
        self.bias = float(bias)
        if init_param is None:
            self._init = rng.normal(0.0, init_param_std, (6,))
        else:
            M = np.asarray(init_param, dtype=np.float64)
            cov = 0.5 * np.trace(M) * np.eye(3) - M
            L = np.linalg.cholesky(cov - self.bias * np.eye(3))
            self._init = _vec6_from_mat(L)

    def init_value(self):
        return np.asarray(self._init)

    def apply(self, params):
        L = _mat_from_vec6(jnp.asarray(params))
        cov = L @ L.T + self.bias * jnp.eye(3, dtype=L.dtype)
        return jnp.trace(cov) * jnp.eye(3, dtype=L.dtype) - cov
