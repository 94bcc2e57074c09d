"""Learn the kinematic parameters of the 2-link toy robot from FK data.

Counterpart of reference examples/learn_kinematics_of_toy.py (80 LoC):
ground-truth model generates random end-effector data; a learner model with
learnable joint translations/orientations regresses onto it, including the
freeze/unfreeze demonstration (reference :59-67). Training is an optax Adam
loop with the loss/grad step jitted end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from differentiable_robot_model_tpu import DifferentiableTwoLinkRobot
from differentiable_robot_model_tpu.models.parametrizations import UnconstrainedTensor
from differentiable_robot_model_tpu.utils.data import (
    generate_random_forward_kinematics_data,
)

EE_NAME = "endEffector"


def run(n_epochs: int = 300, n_data: int = 1000, lr: float = 1e-2, seed: int = 0):
    gt_robot = DifferentiableTwoLinkRobot()
    data = generate_random_forward_kinematics_data(gt_robot, n_data, EE_NAME, seed=seed)

    learner = DifferentiableTwoLinkRobot()
    rng = np.random.default_rng(seed)
    # Make both arm joints' frames learnable, randomly initialized.
    for link in ("arm2", "endEffector"):
        learner.make_link_param_learnable(
            link, "trans", UnconstrainedTensor((3,), init_std=0.1, rng=rng)
        )
        learner.make_link_param_learnable(
            link, "rot_angles", UnconstrainedTensor((3,), init_std=0.1, rng=rng)
        )

    # freeze/unfreeze round-trip (reference learn_kinematics_of_toy.py:59-67)
    learner.freeze_learnable_link_param("arm2", "rot_angles")
    assert "arm2.rot_angles" not in learner.parameters()
    learner.unfreeze_learnable_link_param("arm2", "rot_angles")

    params = learner.parameters()
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            pred, _ = learner.compute_forward_kinematics(data["q"], EE_NAME, params=p)
            return jnp.mean((pred - data["ee_pos"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for epoch in range(n_epochs):
        params, opt_state, loss = step(params, opt_state)
        if epoch % max(1, n_epochs // 10) == 0:
            print(f"epoch {epoch}: loss {float(loss):.6f}")
        losses.append(float(loss))

    learner.set_parameters(params)
    return losses


if __name__ == "__main__":
    run()
