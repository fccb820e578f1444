"""Train state container + optimizer construction.

The step counter lives in the state as a device scalar (and is checkpointed
with the weights) so resumed runs land at the right schedule position — the
functional equivalent of the reference's step-as-model-buffer
(ref: models/fatchord_version.py:125, models/tacotron.py:299).

Optimizers are optax Adam wrapped in ``inject_hyperparams`` so the learning
rate is a mutable leaf of the optimizer state: curriculum sessions (Tacotron)
can change it without discarding Adam moments, matching the reference's
``param_group['lr'] = lr`` (ref: train_tacotron.py:117).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar; a pytree leaf so jit never recompiles

    def get_step(self) -> int:
        return int(self.step)


def new_train_state(params, batch_stats, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), dtype=jnp.int32),
    )


def make_optimizer(lr: float, clip_grad_norm: Optional[float]) -> optax.GradientTransformation:
    """Adam + optional global-norm clipping (ref: train_wavernn.py:127-131)."""
    adam = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    if clip_grad_norm is not None:
        return optax.chain(optax.clip_by_global_norm(clip_grad_norm), adam)
    return adam


def set_learning_rate(opt_state, lr: float):
    """Set the injected learning rate inside an optimizer state (in place)."""
    if not _walk(opt_state, lr):
        raise ValueError("No injected learning_rate found in optimizer state")
    return opt_state


def _walk(node, lr: float) -> bool:
    if hasattr(node, "hyperparams"):
        node.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
        return True
    found = False
    if isinstance(node, (tuple, list)):
        for child in node:
            found = _walk(child, lr) or found
    return found
