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

from .models.robot import (
    DifferentiableRobotModel,
    DifferentiableKUKAiiwa,
    DifferentiableFrankaPanda,
    DifferentiableTwoLinkRobot,
    DifferentiableTrifingerEdu,
    DifferentiableAllegroHand,
    DifferentiableFetchArm,
    DifferentiableKinovaJaco,
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
    "RobotStruct",
    "robot_struct_from_urdf",
    "robot_description_folder",
]
