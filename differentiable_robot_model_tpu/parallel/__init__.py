"""Multi-device scaling: meshes, sharded training and solver steps."""
