"""Small batched tensor helpers (API parity with reference utils.py).

Counterparts of differentiable_robot_model/utils.py:21-86, jit/vmap-safe
(the reference's versions mutate tensors in place, which does not trace).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.lie import cross as cross_product  # reference utils.py:21-25
from ..ops.lie import exp_so3 as exp_map_so3  # reference utils.py:57-69
from ..ops.lie import skew as vector3_to_skew_symm_matrix  # utils.py:40-54

__all__ = [
    "cross_product",
    "exp_map_so3",
    "vector3_to_skew_symm_matrix",
    "bfill_lowertriangle",
    "bfill_diagonal",
    "convert_into_at_least_2d_jax_array",
    "convert_into_jax_array",
]


def bfill_lowertriangle(A: jnp.ndarray, vec: jnp.ndarray) -> jnp.ndarray:
    """Fill the strictly-lower triangle of batched square matrices from a
    vector (row-major (1,0),(2,0),(2,1),... order).

    Counterpart of reference utils.bfill_lowertriangle (utils.py:28-31),
    functional instead of in-place.
    """
    n = A.shape[-1]
    rows, cols = np.tril_indices(n, k=-1)
    return A.at[..., rows, cols].set(vec[..., : len(rows)])


def bfill_diagonal(A: jnp.ndarray, vec: jnp.ndarray) -> jnp.ndarray:
    """Fill the diagonal of batched square matrices from a vector.

    Counterpart of reference utils.bfill_diagonal (utils.py:34-37).
    """
    n = A.shape[-1]
    idx = np.arange(n)
    return A.at[..., idx, idx].set(vec[..., :n])


def convert_into_jax_array(x, dtype=jnp.float32) -> jnp.ndarray:
    """Counterpart of reference utils.convert_into_pytorch_tensor
    (utils.py:72-79)."""
    return jnp.asarray(x, dtype)


def convert_into_at_least_2d_jax_array(x, dtype=jnp.float32) -> jnp.ndarray:
    """Counterpart of reference utils.convert_into_at_least_2d_pytorch_tensor
    (utils.py:82-86)."""
    arr = jnp.asarray(x, dtype)
    return arr[None] if arr.ndim < 2 else arr
