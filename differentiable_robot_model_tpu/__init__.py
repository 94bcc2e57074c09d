"""differentiable_robot_model_tpu: TPU-native differentiable robot dynamics.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
facebookresearch/differentiable-robot-model (reference mounted at
/root/reference), re-designed TPU-first: robots are static pytrees of stacked
link arrays, every algorithm is a pure jittable function, tree recursions are
compiled to masked matmuls and pointer-doubled transform composition, and
scaling is expressed with jax.sharding over device meshes.

Public surface mirrors the reference's
(reference: differentiable_robot_model/__init__.py:7-12) plus the TPU-native
extensions (functional ops, learnable overlays, trajectory optimization,
sharded solvers).
"""

import os as _os

import jax as _jax

# Rigid-body dynamics needs true float32 matmuls: on TPU, jax's default
# matmul precision feeds bfloat16 into the MXU, which amplifies to ~1e-1
# control-sequence error through an MPC solve (vs the 1e-3 parity target).
# The dynamics matmuls are tiny (3x3 / 6x6 / LxL), so full precision costs
# little. Opt out with DRM_TPU_KEEP_DEFAULT_MATMUL_PRECISION=1.
if not _os.environ.get("DRM_TPU_KEEP_DEFAULT_MATMUL_PRECISION"):
    _jax.config.update("jax_default_matmul_precision", "float32")

from .models.robot import (
    DifferentiableRobotModel,
    DifferentiableKUKAiiwa,
    DifferentiableFrankaPanda,
    DifferentiableTwoLinkRobot,
    DifferentiableTrifingerEdu,
    DifferentiableAllegroHand,
    DifferentiableFetchArm,
    DifferentiableKinovaJaco,
    DifferentiableKinovaJacoFull,
    DifferentiableKukaIiwaAllegro,
    DifferentiablePandaWithGripper,
    DifferentiableFetchFull,
    robot_description_folder,
)
from .models.structs import RobotStruct
from .models.urdf import robot_struct_from_urdf

__version__ = "0.1.0"

__all__ = [
    "DifferentiableRobotModel",
    "DifferentiableKUKAiiwa",
    "DifferentiableFrankaPanda",
    "DifferentiableTwoLinkRobot",
    "DifferentiableTrifingerEdu",
    "DifferentiableAllegroHand",
    "DifferentiableFetchArm",
    "DifferentiableKinovaJaco",
    "DifferentiableKinovaJacoFull",
    "DifferentiableKukaIiwaAllegro",
    "DifferentiablePandaWithGripper",
    "DifferentiableFetchFull",
    "RobotStruct",
    "robot_struct_from_urdf",
    "robot_description_folder",
]
