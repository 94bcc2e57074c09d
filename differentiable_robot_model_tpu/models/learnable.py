"""Learnable-parameter overlays on the RobotStruct pytree.

Functional replacement for the reference's nn.Module surgery
(reference: robot_model.py:669-713 `make_link_param_learnable` /
`freeze_...` / `unfreeze_...`, which delattr a lambda and add_module a
parametrization). Here a LearnableSet maps (link, param) keys to
parametrizations; `apply(params)` returns a RobotStruct with the constrained
values spliced into the stacked arrays — a pure function of the parameter
pytree, so `jax.grad` flows through any compute_* call. Frozen entries keep
their stored values and are excluded from `parameters()` (the analogue of
requires_grad=False).

Learnable parameter names match the reference's accepted set
(robot_model.py:671-679): trans, rot_angles, joint_damping, mass, com,
inertia_mat.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax.numpy as jnp

from .structs import RobotStruct

# (struct field, per-link shape) for each public parameter name.
_PARAM_FIELDS = {
    "trans": ("trans", (3,)),
    "rot_angles": ("rot_angles", (3,)),
    "mass": ("mass", ()),
    "com": ("com", (3,)),
    "inertia_mat": ("inertia_com", (3, 3)),
    "joint_damping": ("damping", ()),  # indexed by dof, not link
}


def _key(link_name: str, parameter_name: str) -> str:
    return f"{link_name}.{parameter_name}"


@dataclasses.dataclass
class _Entry:
    parametrization: object
    value: object  # current unconstrained params (pytree)
    frozen: bool = False


class LearnableSet:
    def __init__(self, base: RobotStruct):
        self._base = base
        self._entries: Dict[str, _Entry] = {}

    def register(self, link_name: str, parameter_name: str, parametrization) -> None:
        if parameter_name not in _PARAM_FIELDS:
            raise AttributeError(
                "Invalid parameter name. Accepted parameter names are: "
                "trans, rot_angles, joint_damping, mass, inertia_mat, com"
            )
        if link_name not in self._base.link_names:
            raise KeyError(f"Unknown link: {link_name}")
        if parameter_name == "joint_damping":
            l = self._base.link_names.index(link_name)
            if l not in self._base.dof_links:
                raise ValueError(f"Link {link_name} has no actuated joint")
        self._entries[_key(link_name, parameter_name)] = _Entry(
            parametrization, parametrization.init_value()
        )

    def _entry(self, link_name: str, parameter_name: str) -> _Entry:
        k = _key(link_name, parameter_name)
        if k not in self._entries:
            raise KeyError(f"{parameter_name} of {link_name} is not learnable.")
        return self._entries[k]

    def freeze(self, link_name: str, parameter_name: str) -> None:
        self._entry(link_name, parameter_name).frozen = True

    def unfreeze(self, link_name: str, parameter_name: str) -> None:
        self._entry(link_name, parameter_name).frozen = False

    def parameters(self) -> dict:
        return {k: e.value for k, e in self._entries.items() if not e.frozen}

    def set_parameters(self, params: dict) -> None:
        for k, v in params.items():
            self._entries[k].value = v

    def apply(self, params: dict | None) -> RobotStruct:
        """RobotStruct with overlays applied; differentiable w.r.t. `params`."""
        if not self._entries:
            return self._base
        params = params or {}
        struct = self._base
        updates: Dict[str, jnp.ndarray] = {}
        for k, e in self._entries.items():
            link_name, parameter_name = k.rsplit(".", 1)
            raw = params.get(k, e.value)
            value = e.parametrization.apply(raw)
            field, shape = _PARAM_FIELDS[parameter_name]
            l = struct.link_names.index(link_name)
            idx = struct.dof_links.index(l) if parameter_name == "joint_damping" else l
            leaf = updates.get(field, getattr(struct, field))
            value = jnp.asarray(value, leaf.dtype).reshape(shape)
            updates[field] = leaf.at[idx].set(value)
        # with_arrays is the sanctioned mutation path: it recomputes (or
        # clears, for traced overlays) the static kernel-specialization
        # hints backed by the replaced arrays (see RobotStruct.with_arrays).
        return struct.with_arrays(**updates)
