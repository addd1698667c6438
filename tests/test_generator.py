"""Generator + top-level API smoke tests (mirrors the role of the reference's
scripts/dev.py integration check, SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optispeech_tpu.config import (
    BackboneConfig,
    DataConfig,
    ExperimentConfig,
    FeatureConfig,
    GeneratorConfig,
    TextProcessorConfig,
    VocoderConfig,
)
from optispeech_tpu.models.generator import OptiSpeechGenerator
from optispeech_tpu.models.optispeech import OptiSpeech


def tiny_cfg(encoder_kind="convnext", decoder_kind="convnext", num_speakers=1, num_languages=1):
    feats = FeatureConfig(sample_rate=24000, n_feats=20, n_fft=256, hop_length=64, win_length=256)
    bb = lambda k: BackboneConfig(kind=k, intermediate_dim=64, num_layers=2, num_blocks=2,
                                  linear_units=64, drop_path=0.1)
    gen = GeneratorConfig(
        dim=32, segment_size=16, encoder=bb(encoder_kind), decoder=bb(decoder_kind),
        vocoder=VocoderConfig(dim=48, intermediate_dim=96, num_layers=2),
        features=feats, num_speakers=num_speakers, num_languages=num_languages,
    )
    return gen


def make_batch(rng, b=2, t_text=12, t_mel=40, n_feats=20):
    lengths = np.array([t_text, t_text - 4])[:b]
    mel_lengths = np.array([t_mel, t_mel - 10])[:b]
    return dict(
        x=jnp.asarray(rng.integers(1, 100, (b, t_text)).astype(np.int32)),
        x_lengths=jnp.asarray(lengths.astype(np.int32)),
        mel=jnp.asarray(rng.normal(size=(b, n_feats, t_mel)).astype(np.float32)),
        mel_lengths=jnp.asarray(mel_lengths.astype(np.int32)),
        pitches=jnp.asarray(rng.normal(size=(b, t_mel)).astype(np.float32)),
        energies=jnp.asarray(rng.normal(size=(b, t_mel)).astype(np.float32)),
    )


@pytest.mark.parametrize("kind", ["convnext", "lightspeech", "transformer", "conformer", "leanspeech"])
def test_generator_training_forward(rng, kind):
    gen_cfg = tiny_cfg(kind, kind)
    model = OptiSpeechGenerator(gen_cfg)
    batch = make_batch(rng)
    key = jax.random.PRNGKey(0)
    rngs = {"params": key, "dropout": key, "segment": key}
    variables = model.init(rngs, **batch, deterministic=True)
    out = model.apply(
        variables, **batch, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1), "segment": jax.random.PRNGKey(2)},
    )
    assert out["wav_hat"].shape == (2, 16 * 64)
    for k in ("loss", "align_loss", "duration_loss", "pitch_loss", "energy_loss"):
        assert np.isfinite(float(out[k])), k
    # durations from MAS partition the valid frames
    ds = np.asarray(out["durations"])
    np.testing.assert_array_equal(ds.sum(1), np.asarray(batch["mel_lengths"]))


def test_generator_grads_respect_detach_boundaries(rng):
    """The vocoder must receive no gradient from AM losses and the AM encoder
    none from the duration predictor (reference generator/__init__.py:128,161)."""
    gen_cfg = tiny_cfg()
    model = OptiSpeechGenerator(gen_cfg)
    batch = make_batch(rng)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key, "segment": key}, **batch, deterministic=True)

    def loss_fn(params):
        out = model.apply(
            {"params": params}, **batch, deterministic=True,
            rngs={"segment": jax.random.PRNGKey(2)},
        )
        return out["loss"]  # AM loss only — excludes any vocoder/GAN loss

    grads = jax.grad(loss_fn)(variables["params"])
    voc_grad = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))), grads["vocoder"], 0.0
    )
    assert voc_grad == 0.0  # vocoder sees only (stop-gradient) decoder output
    enc_grad = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))), grads["encoder"], 0.0
    )
    assert enc_grad > 0.0  # but the AM itself trains


def test_two_stage_synthesise_api(rng):
    cfg = ExperimentConfig(
        generator=tiny_cfg(),
        data=DataConfig(
            text_bucket_size=16, mel_bucket_size=32,
            text_processor=TextProcessorConfig(tokenizer="char"),
        ),
    )
    api = OptiSpeech(cfg, seed=0)
    inputs = api.prepare_input("hello world, this is a test.", split_sentences=True)
    out = api.synthesise(inputs)
    assert out.wav.ndim == 2
    assert out.wav.shape[-1] % 64 == 0
    assert out.rtf > 0 and out.latency > 0
    assert np.isfinite(out.wav).all()
    wavs = list(out)
    assert len(wavs) == out.wav.shape[0]
    assert all(len(w) == wl for w, wl in zip(wavs, out.wav_lengths))


def test_synthesise_on_device_single_graph(rng):
    """synthesise_fixed: zero-host-sync serving path matches the two-stage
    result for the same frame bucket."""
    cfg = ExperimentConfig(
        generator=tiny_cfg(),
        data=DataConfig(
            text_bucket_size=16, mel_bucket_size=32,
            text_processor=TextProcessorConfig(tokenizer="char"),
        ),
    )
    api = OptiSpeech(cfg, seed=0)
    inputs = api.prepare_input("hello world", split_sentences=False)
    two_stage = api.synthesise(inputs)
    n_frames = int(np.asarray(two_stage.wav_lengths).max()) // cfg.generator.features.hop_length
    import jax as _jax

    out = api.synthesise_on_device(inputs, n_frames)
    _jax.block_until_ready(out)
    wav_fixed = np.asarray(out["wav"])
    wav_two = np.asarray(two_stage.wav)
    n = min(wav_fixed.shape[-1], wav_two.shape[-1])
    # different padded widths change XLA reduction order; ~4e-4 noise is expected
    np.testing.assert_allclose(wav_fixed[:, :n], wav_two[:, :n], atol=2e-3)

    # serving wire format: on-device int16 PCM (half the D2H bytes)
    out16 = api.synthesise_on_device(inputs, n_frames, pcm16=True)
    pcm = np.asarray(out16["wav_pcm16"])
    assert pcm.dtype == np.int16
    np.testing.assert_array_equal(
        pcm, np.round(np.asarray(out16["wav"]) * 32767.0).astype(np.int16)
    )


def test_multi_speaker_multi_lang(rng):
    gen_cfg = tiny_cfg(num_speakers=4, num_languages=2)
    model = OptiSpeechGenerator(gen_cfg)
    batch = make_batch(rng)
    batch["sids"] = jnp.array([0, 3], jnp.int32)
    batch["lids"] = jnp.array([1, 0], jnp.int32)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key, "segment": key}, **batch, deterministic=True)
    out = model.apply(variables, **batch, deterministic=True, rngs={"segment": key})
    assert np.isfinite(float(out["loss"]))
    assert "sid_embed" in variables["params"]
    assert "lid_embed" in variables["params"]


def test_detach_vocoder_input_flag(rng):
    """detach_vocoder_input=False (config-flagged deviation from reference
    generator/__init__.py:161 — see config.py) lets a waveform-domain loss
    backpropagate into decoder AND encoder; with the default True it reaches
    neither."""
    import dataclasses

    batch = make_batch(rng)
    key = jax.random.PRNGKey(0)

    def wav_loss_grads(detach):
        gen_cfg = dataclasses.replace(tiny_cfg(), detach_vocoder_input=detach)
        model = OptiSpeechGenerator(gen_cfg)
        variables = model.init(
            {"params": key, "dropout": key, "segment": key}, **batch, deterministic=True
        )

        def loss_fn(params):
            out = model.apply(
                {"params": params}, **batch, deterministic=True,
                rngs={"segment": jax.random.PRNGKey(2)},
            )
            return jnp.mean(jnp.abs(out["wav_hat"]))  # waveform-domain loss

        return jax.grad(loss_fn)(variables["params"])

    def total(g, key):
        return jax.tree_util.tree_reduce(
            lambda a, b: a + float(jnp.sum(jnp.abs(b))), g[key], 0.0
        )

    g_detached = wav_loss_grads(True)
    assert total(g_detached, "decoder") == 0.0
    assert total(g_detached, "encoder") == 0.0
    assert total(g_detached, "vocoder") > 0.0

    g_joint = wav_loss_grads(False)
    assert total(g_joint, "decoder") > 0.0
    assert total(g_joint, "encoder") > 0.0
    assert total(g_joint, "vocoder") > 0.0
