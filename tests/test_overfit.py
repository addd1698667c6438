"""Learning-sanity integration test: overfit a few synthetic batches and
assert the AM loss drops (the reference's configs/debug/overfit.yaml harness,
SURVEY.md §4)."""

import jax
import numpy as np
import pytest

from optispeech_tpu.models.discriminator.vocos import VocosDiscriminator
from optispeech_tpu.models.generator import OptiSpeechGenerator
from optispeech_tpu.training.state import init_train_state
from optispeech_tpu.training.step import make_train_step

from test_train_step import synth_batch, tiny_experiment


@pytest.mark.slow
def test_overfit_am_loss_decreases(rng):
    import dataclasses

    cfg = tiny_experiment(pretraining_steps=10_000)  # generator-only: AM loss signal
    cfg = dataclasses.replace(
        cfg,
        optimizer=dataclasses.replace(cfg.optimizer, lr=2e-3),
        scheduler=dataclasses.replace(cfg.scheduler, num_warmup_steps=5, num_training_steps=200),
    )
    generator = OptiSpeechGenerator(cfg.generator)
    discriminator = VocosDiscriminator(cfg.discriminator, cfg.generator.features)
    state = init_train_state(cfg, generator, discriminator, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, generator, discriminator)
    batch = synth_batch(rng, cfg, b=4)

    losses = []
    for _ in range(60):
        state, logs = step_fn(state, batch)
        losses.append(float(logs["total_loss/train_am_loss"]))
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert np.isfinite(losses).all()
    assert last < first * 0.8, (first, last)
