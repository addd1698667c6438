"""Training state: generator + discriminator params, both optimizer states,
step counter, RNG key — everything a resume needs in one pytree
(SURVEY.md section 5 checkpoint/resume)."""

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import ExperimentConfig
from .schedules import make_schedule


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    d_params: Any
    g_opt_state: Any
    d_opt_state: Any
    rng: jax.Array


def make_optimizer(cfg: ExperimentConfig) -> optax.GradientTransformation:
    """AdamW + global-norm clip (reference adamw.yaml + train_args
    gradient_clip_val; base_lightning_module.py:100-102). Optional gradient
    accumulation folds in as optax.MultiSteps
    (base_lightning_module.py:80-86)."""
    schedule = make_schedule(cfg.scheduler, cfg.optimizer)
    opt = optax.chain(
        optax.clip_by_global_norm(cfg.train_args.gradient_clip_val),
        optax.adamw(
            learning_rate=schedule,
            b1=cfg.optimizer.betas[0],
            b2=cfg.optimizer.betas[1],
            eps=cfg.optimizer.eps,
            weight_decay=cfg.optimizer.weight_decay,
        ),
    )
    if cfg.train_args.gradient_accumulate_batches:
        opt = optax.MultiSteps(opt, cfg.train_args.gradient_accumulate_batches)
    return opt


def init_train_state(cfg: ExperimentConfig, generator, discriminator, rng) -> TrainState:
    rng, gk, dk = jax.random.split(rng, 3)
    feats = cfg.generator.features
    t_text, t_mel = cfg.data.text_bucket_size, cfg.data.mel_bucket_size
    seg_wav = cfg.generator.segment_size * feats.hop_length
    dummy_gen = dict(
        x=jnp.zeros((1, t_text), jnp.int32),
        x_lengths=jnp.full((1,), t_text, jnp.int32),
        mel=jnp.zeros((1, feats.n_feats, t_mel), jnp.float32),
        mel_lengths=jnp.full((1,), t_mel, jnp.int32),
        pitches=jnp.zeros((1, t_mel), jnp.float32),
        energies=jnp.zeros((1, t_mel), jnp.float32),
    )
    # jit the inits: eager flax init dispatches thousands of tiny ops
    g_vars = jax.jit(lambda k: generator.init(
        {"params": k, "dropout": k, "segment": k}, **dummy_gen, deterministic=True
    ))(gk)
    d_vars = jax.jit(lambda k: discriminator.init(
        k, jnp.zeros((1, seg_wav)), jnp.zeros((1, seg_wav))
    ))(dk)
    # torch weight_norm init convention: g = ||v||, so the effective kernels
    # start at their kaiming values (critics.py::torch_weight_norm_init)
    from ..models.discriminator.critics import torch_weight_norm_init

    d_vars = dict(d_vars)
    d_vars["params"] = torch_weight_norm_init(d_vars["params"])
    opt = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_vars["params"],
        d_params=d_vars["params"],
        g_opt_state=opt.init(g_vars["params"]),
        d_opt_state=opt.init(d_vars["params"]),
        rng=rng,
    )
