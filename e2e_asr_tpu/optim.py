"""Optimizer & LR-schedule plumbing on optax.

Parity with the reference's src/optim.py Optimizer wrapper: Adadelta (the
classic recipe: lr 1.0, eps 1e-8) / Adam / SGD, 'fixed' or 'warmup'
(noam-style) schedules, global-norm gradient clipping (GRAD_CLIP=5 in
src/solver.py). NaN-grad step skipping lives in the train step (solver
parity) rather than inside the transformation.
"""

from __future__ import annotations

from typing import Callable

import optax

from e2e_asr_tpu.config import HparasConfig


def build_schedule(h: HparasConfig) -> Callable[[int], float]:
    if h.lr_scheduler == "fixed":
        return lambda step: h.lr
    if h.lr_scheduler == "warmup":
        # noam decay (ref: src/optim.py warmup mode)
        w = float(h.warmup_step)

        def sched(step):
            import jax.numpy as jnp

            s = jnp.maximum(step, 1).astype(jnp.float32)
            return h.lr * (w**0.5) * jnp.minimum(s**-0.5, s * w**-1.5)

        return sched
    raise ValueError(f"unknown lr_scheduler {h.lr_scheduler}")


def build_optimizer(h: HparasConfig) -> optax.GradientTransformation:
    """ref: src/optim.py builds torch.optim.{Adadelta,Adam,SGD}."""
    sched = build_schedule(h)
    name = h.optimizer.lower()
    if name == "adadelta":
        core = optax.scale_by_adadelta(rho=0.9, eps=h.eps)
    elif name == "adam":
        core = optax.scale_by_adam(eps=h.eps)
    elif name == "sgd":
        core = optax.identity()
    else:
        raise ValueError(f"unknown optimizer {h.optimizer}")
    return optax.chain(
        optax.clip_by_global_norm(h.grad_clip),
        core,
        optax.scale_by_schedule(lambda step: -sched(step)),
    )


def tf_rate(h: HparasConfig, step) -> float:
    """Scheduled teacher-forcing rate: linear tf_start -> tf_end over
    tf_step steps (ref: bin/train_asr.py)."""
    import jax.numpy as jnp

    frac = jnp.clip(step / max(h.tf_step, 1), 0.0, 1.0)
    return h.tf_start + (h.tf_end - h.tf_start) * frac
