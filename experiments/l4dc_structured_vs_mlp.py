"""L4DC experiment reproduction: structured robot models vs an MLP.

Counterpart of the reference's experiments/l4dc-sim-exps.ipynb (16 cells),
which compares learning inverse dynamics with (a) an unstructured MLP,
(b) a learnable structured robot model without physical constraints, and
(c) a structured model with physically-consistent parametrizations — the
paper's finding (notebook cell 13): structured models outperform the MLP,
and physical constraints help most. The reference notebook is stale (imports
a removed module layout and missing hydra configs, SURVEY.md C13); this
script is runnable end to end.

Usage: python experiments/l4dc_structured_vs_mlp.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from differentiable_robot_model_tpu import DifferentiableKUKAiiwa
from differentiable_robot_model_tpu.models.parametrizations import (
    CovParameterized3DInertiaMatrix,
    PositiveScalar,
    Symm3DInertiaMatrix,
    UnconstrainedTensor,
)
from differentiable_robot_model_tpu.utils.data import (
    generate_sine_motion_inverse_dynamics_data,
    minibatches,
)


def nmse(pred, target):
    var = jnp.var(target, axis=0) + 1e-12
    return jnp.mean(jnp.mean((pred - target) ** 2, axis=0) / var)


def train_mlp(train, test, n_epochs, lr=1e-3, width=256, seed=0):
    """Unstructured baseline: MLP (q, qd, qdd) -> tau."""
    D = train["q"].shape[-1]
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    dims = [3 * D, width, width, D]
    params = [
        (jax.random.normal(k, (a, b)) * jnp.sqrt(2.0 / a), jnp.zeros(b))
        for k, a, b in zip([k1, k2, k3], dims[:-1], dims[1:])
    ]

    def forward(params, batch):
        x = jnp.concatenate([batch["q"], batch["qd"], batch["qdd"]], axis=-1)
        for W, b in params[:-1]:
            x = jax.nn.relu(x @ W + b)
        W, b = params[-1]
        return x @ W + b

    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(params, state, batch):
        loss, g = jax.value_and_grad(lambda p: nmse(forward(p, batch), batch["tau"]))(params)
        upd, state = opt.update(g, state)
        return optax.apply_updates(params, upd), state, loss

    curve = []
    key = jax.random.PRNGKey(seed + 1)
    for epoch in range(n_epochs):
        key, sub = jax.random.split(key)
        for batch in minibatches(train, 250, sub):
            params, state, _ = step(params, state, batch)
        curve.append(float(nmse(forward(params, test), test["tau"])))
    return curve


def train_structured(train, test, n_epochs, constrained: bool, lr=1e-2, seed=0):
    """Structured model: learn mass/com/inertia of every moving link,
    with (L4DC 'physically consistent') or without constraints."""
    learner = DifferentiableKUKAiiwa()
    rng = np.random.default_rng(seed)
    for link in [f"iiwa_link_{i}" for i in range(1, 8)]:
        if constrained:
            learner.make_link_param_learnable(link, "mass", PositiveScalar(init_param_std=0.5, rng=rng))
            learner.make_link_param_learnable(
                link, "inertia_mat", CovParameterized3DInertiaMatrix(init_param_std=0.05, rng=rng)
            )
        else:
            learner.make_link_param_learnable(
                link, "mass", UnconstrainedTensor((), init_std=0.5, rng=rng)
            )
            learner.make_link_param_learnable(
                link, "inertia_mat", Symm3DInertiaMatrix(init_param_std=0.05, rng=rng)
            )

    params = learner.parameters()
    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(params, state, batch):
        def loss_fn(p):
            pred = learner.compute_inverse_dynamics(batch["q"], batch["qd"], batch["qdd"], params=p)
            return nmse(pred, batch["tau"])

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(g, state)
        return optax.apply_updates(params, upd), state, loss

    @jax.jit
    def test_loss(params):
        pred = learner.compute_inverse_dynamics(test["q"], test["qd"], test["qdd"], params=params)
        return nmse(pred, test["tau"])

    curve = []
    key = jax.random.PRNGKey(seed + 1)
    for epoch in range(n_epochs):
        key, sub = jax.random.split(key)
        for batch in minibatches(train, 250, sub):
            params, state, _ = step(params, state, batch)
        curve.append(float(test_loss(params)))
    return curve


def run(n_epochs: int = 60, n_train: int = 2000, n_test: int = 500):
    gt = DifferentiableKUKAiiwa()
    train = generate_sine_motion_inverse_dynamics_data(gt, n_train)
    test_data = generate_sine_motion_inverse_dynamics_data(gt, n_test, dt=1.0 / 210.0)

    curves = {
        "mlp": train_mlp(train, test_data, n_epochs),
        "structured_unconstrained": train_structured(train, test_data, n_epochs, False),
        "structured_constrained": train_structured(train, test_data, n_epochs, True),
    }
    print(f"{'epoch':>6} " + " ".join(f"{k:>26}" for k in curves))
    for e in range(n_epochs):
        print(f"{e:>6} " + " ".join(f"{curves[k][e]:>26.6f}" for k in curves))
    return curves


if __name__ == "__main__":
    run()
