"""Pure functional compute ops: Lie math, spatial algebra, kinematics, dynamics."""

from . import lie, spatial, kinematics, dynamics  # noqa: F401
