"""f0-conditioned vocoder (VocoderConfig.f0_cond): the direct frame-pitch
channel into WaveNeXt that makes p_factor/pitch conditioning load-bearing for
RENDERED F0.

Context: the reference passes f0 to every vocoder (generator/__init__.py:161)
but WaveNeXt ignores it (wavenext/__init__.py:82-86); with the reference's
detached-vocoder training the hidden-stream pitch embedding is unlearnable by
the renderer (measured: docs/evidence/campaign_r3/_r4/_r4b — rendered F0 never
follows p_factor). f0_cond=True embeds the frame-level pitch directly into the
vocoder trunk: teacher-forced GT frames in training, duration-expanded
predictor output (x p_factor) at inference.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optispeech_tpu.config import DataConfig, ExperimentConfig, TextProcessorConfig
from optispeech_tpu.models.generator import OptiSpeechGenerator
from optispeech_tpu.models.optispeech import OptiSpeech
from optispeech_tpu.models.streaming import StreamingSynthesiser
from optispeech_tpu.models.vocoder.wavenext import WaveNeXt

from test_generator import make_batch, tiny_cfg


def f0_cfg(**kw):
    gen = tiny_cfg(**kw)
    return dataclasses.replace(
        gen, vocoder=dataclasses.replace(gen.vocoder, f0_cond=True))


def _api(gen_cfg):
    cfg = ExperimentConfig(
        generator=gen_cfg,
        data=DataConfig(
            text_bucket_size=16, mel_bucket_size=32,
            text_processor=TextProcessorConfig(tokenizer="char"),
        ),
    )
    return OptiSpeech(cfg, seed=0)


def test_wavenext_consumes_f0_only_when_conditioned(rng):
    x = jnp.asarray(rng.normal(size=(2, 24, 32)).astype(np.float32))
    f0a = jnp.asarray(rng.normal(size=(2, 24)).astype(np.float32))
    f0b = f0a + 1.5

    for cond in (False, True):
        voc = WaveNeXt(input_channels=32, dim=48, intermediate_dim=96,
                       num_layers=2, n_fft=256, hop_length=64, f0_cond=cond)
        params = voc.init(jax.random.PRNGKey(0), x, f0=f0a)
        wa = voc.apply(params, x, f0=f0a)
        wb = voc.apply(params, x, f0=f0b)
        assert wa.shape == (2, 24 * 64)
        if cond:
            assert "f0_embed" in params["params"]
            assert float(jnp.abs(wa - wb).max()) > 0, "f0 change must move audio"
        else:
            np.testing.assert_array_equal(np.asarray(wa), np.asarray(wb))

    # shape tolerance: (B, 1, T) (the training segment layout) == (B, T)
    voc = WaveNeXt(input_channels=32, dim=48, intermediate_dim=96,
                   num_layers=2, n_fft=256, hop_length=64, f0_cond=True)
    params = voc.init(jax.random.PRNGKey(0), x, f0=f0a)
    np.testing.assert_array_equal(
        np.asarray(voc.apply(params, x, f0=f0a)),
        np.asarray(voc.apply(params, x, f0=f0a[:, None, :])))

    # fail-loud contract: conditioned vocoder without f0
    with pytest.raises(ValueError):
        voc.apply(params, x)


def test_generator_f0_cond_training_forward(rng):
    model = OptiSpeechGenerator(f0_cfg())
    batch = make_batch(rng)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key, "segment": key},
                           **batch, deterministic=True)
    out = model.apply(
        variables, **batch, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1), "segment": jax.random.PRNGKey(2)},
    )
    assert out["wav_hat"].shape == (2, 16 * 64)
    for k in ("loss", "align_loss", "duration_loss", "pitch_loss", "energy_loss"):
        assert np.isfinite(float(out[k])), k


def test_p_factor_moves_f0_conditioned_waveform():
    """With f0_cond, scaling the predicted pitch MUST change the waveform even
    at init — the architectural guarantee the hidden-stream pathway lacked."""
    api = _api(f0_cfg())
    wavs = {}
    for pf in (0.25, 4.0):
        out = api.synthesise(api.prepare_input(
            "hello world", split_sentences=False, d_factor=2.0, p_factor=pf))
        wavs[pf] = np.asarray(out.wav)[0][: int(out.wav_lengths[0])]
    n = min(len(wavs[0.25]), len(wavs[4.0]))
    assert n > 0
    delta = np.abs(wavs[0.25][:n] - wavs[4.0][:n]).max()
    assert delta > 1e-6, f"p_factor did not reach the vocoder (max delta {delta})"


def test_streaming_matches_full_decode_f0_cond():
    api = _api(f0_cfg())
    inputs = api.prepare_input("hello world this is a longer sentence for streaming",
                               split_sentences=False, d_factor=3.0)
    full_out = api.synthesise(inputs)
    full = np.asarray(full_out.wav)[0][: int(full_out.wav_lengths[0])]

    streamer = StreamingSynthesiser(api, chunk_frames=16, overlap=16)
    chunks = list(streamer.stream(inputs, max_frames=512))
    assert len(chunks) > 1
    streamed = np.concatenate(chunks)
    n = min(len(full), len(streamed))
    assert n > api.hop_length * 20
    np.testing.assert_allclose(streamed[:n], full[:n], atol=2e-3)


def test_export_roundtrip_f0_cond(tmp_path):
    from optispeech_tpu.export.exporter import (
        ExportedOptiSpeech,
        ExportedStreamingSynthesiser,
        export_model,
    )

    api = _api(f0_cfg(num_speakers=2, num_languages=1))
    path = export_model(api, str(tmp_path / "art"), text_buckets=(16,),
                        batch_sizes=(1,), stream_chunk_frames=16,
                        stream_overlap=16)
    ex = ExportedOptiSpeech(path)
    assert ex.metadata["inference"]["f0_cond"] is True

    inputs = api.prepare_input("hello world", speaker=1, split_sentences=False,
                               d_factor=2.0, p_factor=1.3)
    live = api.synthesise(inputs)
    rep = ex.synthesise(inputs)
    n = int(live.wav_lengths[0])
    assert int(rep.wav_lengths[0]) == n
    np.testing.assert_allclose(np.asarray(rep.wav)[0][:n],
                               np.asarray(live.wav)[0][:n], atol=2e-3)

    st = ExportedStreamingSynthesiser(ex)
    streamed = np.concatenate(list(st.stream(inputs)))
    m = min(len(streamed), n)
    assert m > 0
    np.testing.assert_allclose(streamed[:m], np.asarray(live.wav)[0][:m], atol=2e-3)
