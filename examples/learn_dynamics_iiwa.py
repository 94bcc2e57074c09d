"""Identify iiwa link dynamics (mass/inertia/com) from inverse-dynamics data.

Counterpart of reference examples/learn_dynamics_iiwa.py (100 LoC): sine
trajectories from a ground-truth model, constrained learnable parameters
(PositiveScalar mass, unconstrained inertia/translation like the reference's
setup at :54-65), NMSE loss (reference :38-47), minibatched Adam.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from differentiable_robot_model_tpu import DifferentiableKUKAiiwa
from differentiable_robot_model_tpu.models.parametrizations import (
    PositiveScalar,
    UnconstrainedTensor,
)
from differentiable_robot_model_tpu.utils.data import (
    generate_sine_motion_inverse_dynamics_data,
    minibatches,
)


def nmse_loss(pred, target):
    """Normalized MSE per output dim (reference learn_dynamics_iiwa.py:38-47)."""
    var = jnp.var(target, axis=0) + 1e-12
    return jnp.mean(jnp.mean((pred - target) ** 2, axis=0) / var)


def run(
    n_epochs: int = 30,
    n_data: int = 2000,
    lr: float = 1e-2,
    batch_size: int = 250,
    seed: int = 0,
):
    gt_robot = DifferentiableKUKAiiwa()
    data = generate_sine_motion_inverse_dynamics_data(gt_robot, n_data)

    learner = DifferentiableKUKAiiwa()
    rng = np.random.default_rng(seed)
    learner.make_link_param_learnable(
        "iiwa_link_3", "mass", PositiveScalar(init_param_std=1.0, rng=rng)
    )
    learner.make_link_param_learnable(
        "iiwa_link_3", "inertia_mat", UnconstrainedTensor((3, 3), init_std=0.1, rng=rng)
    )
    learner.make_link_param_learnable(
        "iiwa_link_3", "trans", UnconstrainedTensor((3,), init_std=0.1, rng=rng)
    )

    params = learner.parameters()
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            pred = learner.compute_inverse_dynamics(
                batch["q"], batch["qd"], batch["qdd"], params=p
            )
            return nmse_loss(pred, batch["tau"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(seed)
    losses = []
    for epoch in range(n_epochs):
        key, sub = jax.random.split(key)
        epoch_losses = []
        for batch in minibatches(data, batch_size, sub):
            params, opt_state, loss = step(params, opt_state, batch)
            epoch_losses.append(float(loss))
        losses.append(float(np.mean(epoch_losses)))
        if epoch % max(1, n_epochs // 10) == 0:
            print(f"epoch {epoch}: NMSE {losses[-1]:.6f}")

    learner.set_parameters(params)
    return losses


if __name__ == "__main__":
    run()
