"""Train state pytree (reference equivalent: the ad-hoc
``{epoch, state_dict, optimizer, best}`` dict that ``train.py`` torch.saves
— SURVEY.md §2.5/§5 checkpoint row).

One flat struct holds everything a training step mutates: model params,
BatchNorm statistics, the LWS loss's learned uncertainty scalars (the
reference optimises ``criterion.parameters()`` jointly — SURVEY.md §3.1),
the optax state, the step counter and the PRNG key. Being a single pytree
makes Orbax checkpointing, sharding and donation trivial.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array                     # scalar int32
    params: Any                         # model parameters
    batch_stats: Any                    # BatchNorm running stats ({} if none)
    loss_params: Dict[str, jax.Array]   # LWS sx/sq ({} for HWS)
    opt_state: optax.OptState
    rng: jax.Array                      # dropout PRNG key

    @property
    def trainables(self):
        """The pytree the optimizer updates: model params + loss params."""
        return {"model": self.params, "loss": self.loss_params}


def create_train_state(variables, loss_params, tx: optax.GradientTransformation,
                       rng: jax.Array) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init({"model": params, "loss": loss_params})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        loss_params=loss_params,
        opt_state=opt_state,
        rng=rng,
    )
