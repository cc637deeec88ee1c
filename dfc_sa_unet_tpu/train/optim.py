"""Optimizer matching the reference's training recipe exactly.

Reference train.py:73-78 uses torch.optim.SGD(lr, momentum, weight_decay)
and the trainer clips gradients to global-norm 1.0 *before* the optimizer
step (reference utils/trainer.py:149).  The equivalent optax chain, in
torch's order of operations:

  clip_by_global_norm(1.0)          # trainer's clip_grad_norm_
  add_decayed_weights(wd)           # torch SGD: d_p += wd * p
  trace(momentum)                   # torch SGD: buf = mu*buf + d_p
  scale(-lr)
"""

from typing import Optional

import optax


def sgd_with_clip(
    learning_rate: float,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    clip_norm: Optional[float] = 1.0,
) -> optax.GradientTransformation:
    parts = []
    if clip_norm is not None:
        parts.append(optax.clip_by_global_norm(clip_norm))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=False))
    parts.append(optax.scale(-learning_rate))
    return optax.chain(*parts)


def from_config(config) -> optax.GradientTransformation:
    tr = config["training"]
    return sgd_with_clip(
        learning_rate=float(tr.get("learning_rate", 0.01)),
        momentum=float(tr.get("momentum", 0.9)),
        weight_decay=float(tr.get("weight_decay", 1e-4)),
        clip_norm=1.0,
    )
