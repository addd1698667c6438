"""StableHLO export + exported-runtime round-trip (reference ONNX
export/infer capability)."""

import numpy as np

from optispeech_tpu.config import DataConfig, ExperimentConfig, TextProcessorConfig
from optispeech_tpu.export.exporter import ExportedOptiSpeech, export_model
from optispeech_tpu.models.optispeech import OptiSpeech

from test_generator import tiny_cfg


def test_export_roundtrip(tmp_path):
    cfg = ExperimentConfig(
        generator=tiny_cfg(),
        data=DataConfig(
            text_bucket_size=16, mel_bucket_size=32,
            text_processor=TextProcessorConfig(tokenizer="char"),
        ),
    )
    api = OptiSpeech(cfg, seed=0)
    out_dir = str(tmp_path / "exported")
    export_model(api, out_dir, text_buckets=(16, 32), frames_per_token=8)

    runtime = ExportedOptiSpeech(out_dir)
    # metadata rebuilt the text processor
    assert runtime.text_processor.tokenizer.name == "char"
    assert runtime.sample_rate == cfg.generator.features.sample_rate

    inputs = runtime.prepare_input("hello world")
    out = runtime.synthesise(inputs)
    assert out.wav.ndim == 2 and out.wav.shape[0] == 1
    assert np.isfinite(out.wav).all()
    assert out.rtf > 0

    # parity with the live model for the same bucket
    live = api.synthesise(api.prepare_input("hello world", split_sentences=False))
    n = min(out.wav.shape[-1], live.wav.shape[-1])
    np.testing.assert_allclose(out.wav[0, :n], np.asarray(live.wav)[0, :n], atol=2e-3)

    # every graph must be dual-platform: a single-platform artifact raises
    # "exported for ('cpu',) but used on ('tpu',)" the moment it is served
    # on the other backend (round-5 campaign regression; exporter
    # _EXPORT_PLATFORMS)
    for key, g in runtime._graphs.items():
        assert tuple(g.platforms) == ("cpu", "tpu"), (key, g.platforms)


def test_artifact_prewarm_touches_every_rung(tmp_path):
    """cli/serve.prewarm on an exported artifact replays every
    (text bucket x batch rung) graph before the server binds (VERDICT r3
    item 8)."""
    from optispeech_tpu.cli.serve import prewarm

    cfg = ExperimentConfig(
        generator=tiny_cfg(),
        data=DataConfig(
            text_bucket_size=16, mel_bucket_size=32,
            text_processor=TextProcessorConfig(tokenizer="char"),
        ),
    )
    api = OptiSpeech(cfg, seed=0)
    out_dir = str(tmp_path / "exported_pw")
    export_model(api, out_dir, text_buckets=(16, 32), frames_per_token=8,
                 batch_sizes=(1, 2), stream_chunk_frames=None)
    runtime = ExportedOptiSpeech(out_dir)
    timings = prewarm(runtime)
    assert set(timings) == {"encode_16_b1", "encode_16_b2",
                            "encode_32_b1", "encode_32_b2"}
    assert all(t >= 0 for t in timings.values())


def test_export_roundtrip_multispeaker_multilang(tmp_path):
    """sids/lids as exported-graph inputs (reference onnx/export.py:56-66,
    onnx/infer.py:57-107): outputs must match the live model per speaker and
    differ across speakers."""
    cfg = ExperimentConfig(
        generator=tiny_cfg(num_speakers=3, num_languages=2),
        data=DataConfig(
            text_bucket_size=16, mel_bucket_size=32,
            text_processor=TextProcessorConfig(tokenizer="char", languages=("en-us", "de")),
        ),
    )
    api = OptiSpeech(cfg, seed=0, speakers=["alice", "bob", "carol"])
    out_dir = str(tmp_path / "exported_ms")
    export_model(api, out_dir, text_buckets=(16, 32), frames_per_token=8)

    runtime = ExportedOptiSpeech(out_dir)
    assert runtime.has_speaker_inputs
    assert runtime.speakers == ["alice", "bob", "carol"]
    assert runtime.num_speakers == 3 and runtime.num_languages == 2

    wavs = {}
    for speaker in ("alice", "carol"):
        inputs = runtime.prepare_input("hello world", speaker=speaker, lang="de")
        assert inputs.sids is not None and inputs.lids is not None
        assert int(inputs.lids[0]) == 1
        out = runtime.synthesise(inputs)
        assert np.isfinite(out.wav).all()
        wavs[speaker] = out.wav

        live = api.synthesise(api.prepare_input(
            "hello world", speaker=speaker, language="de", split_sentences=False))
        n = min(out.wav.shape[-1], live.wav.shape[-1])
        np.testing.assert_allclose(out.wav[0, :n], np.asarray(live.wav)[0, :n], atol=2e-3)

    # speaker embedding actually flows through the exported graph
    n = min(wavs["alice"].shape[-1], wavs["carol"].shape[-1])
    assert np.abs(wavs["alice"][0, :n] - wavs["carol"][0, :n]).max() > 1e-4

    # unknown speaker name errors like the reference
    try:
        runtime.prepare_input("hi", speaker="nobody")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_speak_cli_writes_wavs(tmp_path):
    """ospeech-tpu console entry point: artifact -> wav files (the reference's
    standalone `ospeech` CLI role, ospeech/inference/__init__.py:148-200)."""
    cfg = ExperimentConfig(
        generator=tiny_cfg(),
        data=DataConfig(
            text_bucket_size=16, mel_bucket_size=32,
            text_processor=TextProcessorConfig(tokenizer="char"),
        ),
    )
    api = OptiSpeech(cfg, seed=0)
    art = str(tmp_path / "artifact")
    export_model(api, art, text_buckets=(16, 32), frames_per_token=8)

    from optispeech_tpu.cli.speak import main as speak_main

    out_dir = str(tmp_path / "wavs")
    speak_main([art, "hello world. bye now.", out_dir, "--d-factor", "1.2"])
    import os

    wavs = sorted(os.listdir(out_dir))
    assert wavs == ["gen-1.wav", "gen-2.wav"]  # sentence-split -> two wavs
    from optispeech_tpu.utils.wavio import load_wav

    wav, sr = load_wav(os.path.join(out_dir, "gen-1.wav"))
    assert sr == cfg.generator.features.sample_rate
    assert len(wav) > 0 and np.isfinite(wav).all()
