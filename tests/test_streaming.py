"""Chunked streaming synthesis: chunked output must match the full-utterance
decode in the interior (overlap >= receptive field)."""

import numpy as np

from optispeech_tpu.config import DataConfig, ExperimentConfig, TextProcessorConfig
from optispeech_tpu.models.optispeech import OptiSpeech
from optispeech_tpu.models.streaming import StreamingSynthesiser

from test_generator import tiny_cfg


def _api():
    cfg = ExperimentConfig(
        generator=tiny_cfg(),
        data=DataConfig(
            text_bucket_size=16, mel_bucket_size=32,
            text_processor=TextProcessorConfig(tokenizer="char"),
        ),
    )
    return OptiSpeech(cfg, seed=0)


def test_streaming_matches_full_decode():
    api = _api()
    inputs = api.prepare_input("hello world this is a longer sentence for streaming",
                               split_sentences=False, d_factor=3.0)
    hop = api.hop_length

    # full decode via the fixed single-graph path
    full_out = api.synthesise(inputs)
    full = np.asarray(full_out.wav)[0][: int(full_out.wav_lengths[0])]

    # tiny decoder: receptive field = 2 blocks k7 (6) + vocoder embed k7 +
    # 2 blocks k7 (9) = 15 frames; overlap 16 suffices
    streamer = StreamingSynthesiser(api, chunk_frames=16, overlap=16)
    chunks = list(streamer.stream(inputs, max_frames=512))
    assert len(chunks) > 1, "expected multiple chunks"
    streamed = np.concatenate(chunks)

    n = min(len(full), len(streamed))
    assert n > hop * 20
    np.testing.assert_allclose(streamed[:n], full[:n], atol=2e-3)


def test_streaming_chunk_sizes():
    api = _api()
    inputs = api.prepare_input("hello world again", split_sentences=False, d_factor=3.0)
    streamer = StreamingSynthesiser(api, chunk_frames=8, overlap=16)
    chunks = list(streamer.stream(inputs, max_frames=64))
    hop = api.hop_length
    assert all(len(c) % hop == 0 for c in chunks)
    assert all(len(c) <= 8 * hop for c in chunks)
