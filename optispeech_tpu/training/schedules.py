"""LR schedules (reference configs/model/scheduler/cosine_with_warmup.yaml ->
transformers.get_cosine_schedule_with_warmup semantics)."""

import jax.numpy as jnp
import optax


def cosine_with_warmup(
    base_lr: float, num_warmup_steps: int, num_training_steps: int, num_cycles: float = 0.5
) -> optax.Schedule:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.maximum(num_warmup_steps, 1)
        # (step+1)/warmup: the reference's LambdaLR yields lr=0 on the very
        # first step (a dead update); shift by one to make every step live
        lin = (step + 1.0) / warm
        progress = (step - num_warmup_steps) / jnp.maximum(num_training_steps - num_warmup_steps, 1)
        cos = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * num_cycles * 2.0 * progress)))
        return base_lr * jnp.where(step < num_warmup_steps, lin, cos)

    return schedule


def make_schedule(cfg_sched, cfg_opt) -> optax.Schedule:
    if cfg_sched.kind == "cosine_with_warmup":
        return cosine_with_warmup(cfg_opt.lr, cfg_sched.num_warmup_steps, cfg_sched.num_training_steps)
    if cfg_sched.kind == "constant":
        return lambda step: cfg_opt.lr
    raise ValueError(f"unknown scheduler kind {cfg_sched.kind}")
