"""Training-option paths: gradient accumulation, uncached generator outputs."""

import dataclasses

import jax
import numpy as np

from optispeech_tpu.config import TrainArgs
from optispeech_tpu.models.discriminator.vocos import VocosDiscriminator
from optispeech_tpu.models.generator import OptiSpeechGenerator
from optispeech_tpu.training.state import init_train_state
from optispeech_tpu.training.step import make_train_step

from test_train_step import synth_batch, tiny_experiment


def _delta(a, b):
    return jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(np.abs(np.asarray(x)).sum()),
        jax.tree_util.tree_map(lambda p, q: p - q, a, b), 0.0,
    )


def test_gradient_accumulation_applies_every_k_steps(rng):
    cfg = tiny_experiment(pretraining_steps=10_000)
    cfg = dataclasses.replace(
        cfg, train_args=dataclasses.replace(cfg.train_args, gradient_accumulate_batches=2)
    )
    generator = OptiSpeechGenerator(cfg.generator)
    discriminator = VocosDiscriminator(cfg.discriminator, cfg.generator.features)
    state0 = init_train_state(cfg, generator, discriminator, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, generator, discriminator)
    batch = synth_batch(rng, cfg, b=4)

    state1, _ = step_fn(state0, batch)  # micro-step 1: grads accumulate, no apply
    assert _delta(state1.g_params, state0.g_params) == 0.0
    state2, _ = step_fn(state1, batch)  # micro-step 2: apply
    assert _delta(state2.g_params, state0.g_params) > 0.0


def test_pretraining_gate_counts_optimizer_steps_under_accumulation(rng):
    """`pretraining_steps` is measured in OPTIMIZER steps (Lightning
    global_step semantics): with gradient_accumulate_batches=2 and
    pretraining_steps=1 the discriminator must stay frozen for TWO
    micro-batches and train on the third (reference
    base_lightning_module.py:124-126,295-303)."""
    cfg = tiny_experiment(pretraining_steps=1)
    cfg = dataclasses.replace(
        cfg, train_args=dataclasses.replace(cfg.train_args, gradient_accumulate_batches=2)
    )
    generator = OptiSpeechGenerator(cfg.generator)
    discriminator = VocosDiscriminator(cfg.discriminator, cfg.generator.features)
    state = init_train_state(cfg, generator, discriminator, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, generator, discriminator)
    batch = synth_batch(rng, cfg, b=4)

    d0 = state.d_params
    state, logs = step_fn(state, batch)   # micro 1 (opt step 0): D frozen
    assert float(logs["total_loss/discriminator"]) == 0.0
    state, logs = step_fn(state, batch)   # micro 2 (still opt step 0): D frozen
    assert float(logs["total_loss/discriminator"]) == 0.0
    assert _delta(state.d_params, d0) == 0.0
    state, logs = step_fn(state, batch)   # micro 3 (opt step 1 >= 1): D trains
    assert float(logs["total_loss/discriminator"]) != 0.0


def test_uncached_generator_outputs_path(rng):
    cfg = tiny_experiment(pretraining_steps=0)
    cfg = dataclasses.replace(
        cfg, train_args=dataclasses.replace(cfg.train_args, cache_generator_outputs=False)
    )
    generator = OptiSpeechGenerator(cfg.generator)
    discriminator = VocosDiscriminator(cfg.discriminator, cfg.generator.features)
    state = init_train_state(cfg, generator, discriminator, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, generator, discriminator)
    new_state, logs = step_fn(state, synth_batch(rng, cfg, b=4))
    assert np.isfinite(float(logs["total_loss/discriminator"]))
    assert _delta(new_state.d_params, state.d_params) > 0.0
