"""Optimizer and LR schedule (SURVEY.md §2 'Optimizer/schedule' [K]):
SGD + momentum 0.9, piecewise-constant LR decay, weight decay 5e-4 on conv
kernels only, optional linear warmup — the author's standard TF1 recipe,
expressed as optax transforms.
"""
from __future__ import annotations

import optax

from dan_tpu.config import TrainConfig


def make_lr_schedule(config: TrainConfig) -> optax.Schedule:
    base = optax.piecewise_constant_schedule(
        init_value=config.learning_rate,
        boundaries_and_scales={
            int(b): config.lr_factors[i + 1] / config.lr_factors[i]
            for i, b in enumerate(config.lr_boundaries)
        },
    )
    if config.warmup_steps > 0:
        # Warmup is a multiplicative ramp ON TOP of the absolute-step
        # piecewise schedule. (optax.join_schedules would feed the base
        # schedule step - warmup_steps, silently shifting every decay
        # boundary warmup_steps late — the reference's boundaries are
        # absolute training steps.)
        import jax.numpy as jnp

        def sched(step):
            frac = jnp.minimum(
                jnp.asarray(step, jnp.float32) / config.warmup_steps, 1.0
            )
            return base(step) * (0.1 + 0.9 * frac)

        return sched
    return base


def _kernel_mask(params):
    """Weight decay applies to conv kernels only (not biases / L2Norm
    scales) [K — TF-slim regularizer convention]."""
    import jax

    def is_kernel(path, _):
        return any(
            getattr(p, "key", None) == "kernel"
            or getattr(p, "name", None) == "kernel"
            for p in path
        )

    return jax.tree_util.tree_map_with_path(is_kernel, params)


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    schedule = make_lr_schedule(config)
    parts = []
    if config.grad_clip_norm > 0:
        parts.append(optax.clip_by_global_norm(config.grad_clip_norm))
    parts += [
        optax.add_decayed_weights(config.weight_decay, mask=_kernel_mask),
        optax.sgd(learning_rate=schedule, momentum=config.momentum),
    ]
    return optax.chain(*parts)
