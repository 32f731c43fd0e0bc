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


def ravel_trainables(trainables):
    """Ravel the trainables pytree into one vector for the flat-update
    optimizer path (optimizer.flat-update), guarding the dtype-uniformity
    precondition: ``jax.flatten_util.ravel_pytree`` silently upcasts mixed
    dtypes to a common one (and casts back on unravel), which would round
    leaf values — far beyond the flat path's last-ulp-f32 contract."""
    import jax.flatten_util

    dtypes = {leaf.dtype for leaf in jax.tree.leaves(trainables)}
    if len(dtypes) > 1:
        raise ValueError(
            "optimizer.flat-update requires all trainable leaves to share "
            f"one dtype (found {sorted(str(d) for d in dtypes)}); the "
            "raveled vector would silently cast and round")
    return jax.flatten_util.ravel_pytree(trainables)


def create_train_state(variables, loss_params, tx: optax.GradientTransformation,
                       rng: jax.Array, flat: bool = False) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    trainables = {"model": params, "loss": loss_params}
    if flat:
        # Moments live as single raveled vectors; the step's flat path
        # (train/step.py) updates them with one fused kernel per moment.
        opt_state = tx.init(ravel_trainables(trainables)[0])
    else:
        opt_state = tx.init(trainables)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        loss_params=loss_params,
        opt_state=opt_state,
        rng=rng,
    )
