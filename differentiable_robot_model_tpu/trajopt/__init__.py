"""Trajectory optimization / MPC: rollouts, costs, first-order and iLQR solvers."""
