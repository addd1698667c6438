"""Compiled GAN train-step tests, incl. the 8-virtual-device data-parallel
path (the analogue of the reference's configs/trainer/ddp_sim.yaml)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optispeech_tpu.config import (
    DataConfig,
    DiscriminatorConfig,
    ExperimentConfig,
    SchedulerConfig,
    TrainArgs,
)
from optispeech_tpu.models.discriminator.vocos import VocosDiscriminator
from optispeech_tpu.models.generator import OptiSpeechGenerator
from optispeech_tpu.parallel import make_mesh, replicate_state, shard_batch
from optispeech_tpu.training.state import init_train_state
from optispeech_tpu.training.step import make_train_step, make_val_step

from test_generator import tiny_cfg


def tiny_experiment(pretraining_steps=0):
    gen = tiny_cfg()
    disc = DiscriminatorConfig(
        periods=(2, 3), resolutions=((256, 64, 256), (128, 32, 128)), mrd_channels=16
    )
    return ExperimentConfig(
        generator=gen,
        discriminator=disc,
        train_args=TrainArgs(pretraining_steps=pretraining_steps),
        scheduler=SchedulerConfig(num_warmup_steps=10, num_training_steps=100),
        data=DataConfig(text_bucket_size=16, mel_bucket_size=64),
    )


def synth_batch(rng, cfg, b=8):
    t_text = cfg.data.text_bucket_size
    t_mel = cfg.data.mel_bucket_size
    feats = cfg.generator.features
    wav_len = t_mel * feats.hop_length
    return dict(
        x=jnp.asarray(rng.integers(1, 100, (b, t_text)).astype(np.int32)),
        x_lengths=jnp.asarray(rng.integers(t_text // 2, t_text + 1, b).astype(np.int32)),
        mel=jnp.asarray(rng.normal(size=(b, feats.n_feats, t_mel)).astype(np.float32)),
        mel_lengths=jnp.asarray(rng.integers(t_mel // 2, t_mel + 1, b).astype(np.int32)),
        pitches=jnp.asarray(rng.normal(size=(b, t_mel)).astype(np.float32)),
        energies=jnp.asarray(rng.normal(size=(b, t_mel)).astype(np.float32)),
        wav=jnp.asarray((rng.normal(size=(b, wav_len)) * 0.1).astype(np.float32)),
        sids=None,
        lids=None,
    )


def _build(cfg):
    generator = OptiSpeechGenerator(cfg.generator)
    discriminator = VocosDiscriminator(cfg.discriminator, cfg.generator.features)
    state = init_train_state(cfg, generator, discriminator, jax.random.PRNGKey(0))
    return generator, discriminator, state


def test_train_step_updates_both_networks(rng):
    cfg = tiny_experiment(pretraining_steps=0)
    generator, discriminator, state = _build(cfg)
    step_fn = make_train_step(cfg, generator, discriminator)
    batch = synth_batch(rng, cfg, b=4)
    new_state, logs = step_fn(state, batch)
    assert int(new_state.step) == 1
    for k in ("total_loss/generator", "total_loss/discriminator", "total_loss/train_am_loss"):
        assert np.isfinite(float(logs[k])), k
    # both param trees changed
    g_delta = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, new_state.g_params, state.g_params), 0.0,
    )
    d_delta = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, new_state.d_params, state.d_params), 0.0,
    )
    assert g_delta > 0 and d_delta > 0


def test_pretraining_gate_freezes_discriminator(rng):
    cfg = tiny_experiment(pretraining_steps=100)
    generator, discriminator, state = _build(cfg)
    step_fn = make_train_step(cfg, generator, discriminator)
    batch = synth_batch(rng, cfg, b=4)
    new_state, logs = step_fn(state, batch)
    d_delta = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, new_state.d_params, state.d_params), 0.0,
    )
    assert d_delta == 0.0  # discriminator untouched during pretraining
    assert float(logs["total_loss/train_gen_adv_loss"]) == 0.0
    assert float(logs["total_loss/discriminator"]) == 0.0


def test_train_step_data_parallel_8_devices(rng):
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    cfg = tiny_experiment(pretraining_steps=0)
    generator, discriminator, state = _build(cfg)
    mesh = make_mesh(8)
    state = replicate_state(state, mesh)
    step_fn = make_train_step(cfg, generator, discriminator)
    batch = shard_batch(synth_batch(rng, cfg, b=8), mesh)
    new_state, logs = step_fn(state, batch)
    assert np.isfinite(float(logs["total_loss/generator"]))
    # params remain replicated after the update
    leaf = jax.tree_util.tree_leaves(new_state.g_params)[0]
    assert leaf.sharding.is_fully_replicated

    # determinism: replicated-sharded result == single-device result
    state1 = _build(cfg)[2]
    out1, logs1 = step_fn(state1, synth_batch(np.random.default_rng(1234), cfg, b=8))
    out2, logs2 = step_fn(
        replicate_state(state1, mesh),
        shard_batch(synth_batch(np.random.default_rng(1234), cfg, b=8), mesh),
    )
    np.testing.assert_allclose(
        float(logs1["total_loss/generator"]), float(logs2["total_loss/generator"]), rtol=2e-4
    )


def test_val_step(rng):
    cfg = tiny_experiment()
    generator, discriminator, state = _build(cfg)
    val_fn = make_val_step(cfg, generator, discriminator)
    logs, wav, wav_hat = val_fn(state, synth_batch(rng, cfg, b=2), jax.random.PRNGKey(3))
    assert np.isfinite(float(logs["total_loss/val_total"]))
    assert wav.shape == wav_hat.shape


def test_host_segment_path_matches_device_sampling(rng):
    """The trainer's host-side segment slicing (ops/segments.py
    host_sample_segment_starts + host_slice_wav_segments, shipped as
    `wav_seg`/`start_idx`) must be numerically identical to the legacy
    device path when fed the same start indices."""
    from optispeech_tpu.ops.segments import host_slice_wav_segments

    cfg = tiny_experiment(pretraining_steps=0)
    generator, discriminator, state = _build(cfg)
    step_fn = make_train_step(cfg, generator, discriminator)
    batch = synth_batch(rng, cfg, b=4)

    # old path: generator samples starts from the "segment" rng stream
    new_state1, logs1 = step_fn(state, batch)

    # replay the generator with the step's exact rng derivation (step.py:97,
    # g_forward split) to recover the starts the device path sampled (flax
    # make_rng folds in the module path, so the key can't be rebuilt outside)
    g_rng = jax.random.split(state.rng)[1]
    drng, srng = jax.random.split(g_rng)
    gen_out = generator.apply(
        {"params": state.g_params},
        x=batch["x"], x_lengths=batch["x_lengths"], mel=batch["mel"],
        mel_lengths=batch["mel_lengths"], pitches=batch["pitches"],
        energies=batch["energies"], sids=None, lids=None,
        deterministic=False, rngs={"dropout": drng, "segment": srng},
    )
    starts = np.asarray(gen_out["start_idx"])
    seg = min(cfg.generator.segment_size, cfg.data.mel_bucket_size)

    hop = cfg.generator.features.hop_length
    batch2 = {k: v for k, v in batch.items() if k != "wav"}
    batch2["start_idx"] = jnp.asarray(starts)
    batch2["wav_seg"] = jnp.asarray(
        host_slice_wav_segments(np.asarray(batch["wav"]), starts, seg, hop)
    )
    new_state2, logs2 = step_fn(state, batch2)
    for k in ("total_loss/generator", "total_loss/discriminator",
              "total_loss/train_am_loss", "total_loss/train_gen_adv_loss"):
        np.testing.assert_allclose(float(logs1[k]), float(logs2[k]), rtol=1e-5, err_msg=k)


def test_train_step_segment_size_exceeding_mel_bucket(rng):
    """cfg.segment_size > the mel bucket: the generator clamps its segment to
    t_mel and reports the clamped size; the GT wav crop must follow it
    (reference uses gen_outputs['segment_size']) or real/fake lengths
    mismatch in the discriminator."""
    import dataclasses

    cfg = tiny_experiment(pretraining_steps=0)
    cfg = dataclasses.replace(
        cfg, generator=dataclasses.replace(cfg.generator, segment_size=96)
    )  # mel bucket is 64 -> clamp
    generator, discriminator, state = _build(cfg)
    step_fn = make_train_step(cfg, generator, discriminator)
    new_state, logs = step_fn(state, synth_batch(rng, cfg, b=2))
    assert np.isfinite(float(logs["total_loss/generator"]))
    assert np.isfinite(float(logs["total_loss/discriminator"]))
