"""Example regression tests (smoke + loss-decrease assertions).

Counterpart of reference tests/test_examples.py (35 LoC), which runs each
learn_* example with run(n_epochs=2, n_data=250); here we additionally
assert the loss actually decreases (the reference only smoke-tests).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples import (  # noqa: E402
    learn_dynamics_iiwa,
    learn_forward_dynamics_iiwa,
    learn_kinematics_of_iiwa,
    learn_kinematics_of_toy,
)


@pytest.mark.parametrize(
    "example",
    [
        learn_kinematics_of_toy,
        learn_kinematics_of_iiwa,
    ],
)
def test_kinematics_examples(example):
    losses = example.run(n_epochs=50, n_data=250)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.parametrize(
    "example",
    [
        learn_dynamics_iiwa,
        learn_forward_dynamics_iiwa,
    ],
)
def test_dynamics_examples(example):
    losses = example.run(n_epochs=2, n_data=250)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_kinematic_trajectory_opt():
    from examples import run_kinematic_trajectory_opt as opt

    result = opt.run(n_iters=30, playback=True)
    hist = np.asarray(result.cost_history)
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0]


def test_l4dc_experiment_smoke():
    """The L4DC structured-vs-MLP experiment runs end-to-end (tiny sizes)
    and the structured models train (reference experiments notebook no
    longer runs against its own code; ours must)."""
    from experiments import l4dc_structured_vs_mlp as exp

    out = exp.run(n_epochs=3, n_train=120, n_test=60)
    assert set(out) >= {"mlp", "structured_unconstrained", "structured_constrained"}
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_torque_mpc_example():
    """The closed-loop torque-space MPC example converges toward the goal
    with both solvers (gradient and sampling)."""
    from examples import run_torque_mpc as ex

    d_adam = ex.run(n_steps=8, solver="adam", horizon=10)
    assert d_adam[-1] < d_adam[0]
    d_mppi = ex.run(n_steps=8, solver="mppi", horizon=10)
    assert d_mppi[-1] < d_mppi[0]
    assert np.all(np.isfinite(d_adam)) and np.all(np.isfinite(d_mppi))


def test_fleet_mpc_example():
    """The heterogeneous-fleet closed-loop MPC example (one device program
    for the whole fleet's N-tick loop) improves every member's mean goal
    distance."""
    from examples import run_fleet_mpc as ex

    out = ex.run(n_steps=6, batch=2)
    assert len(out) == 2
    for name, d in out.items():
        assert np.all(np.isfinite(d)), name
        assert d[-1] < d[0], (name, d)
