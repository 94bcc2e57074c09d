"""Robot model layer: URDF compiler, RobotStruct pytree, high-level API."""
