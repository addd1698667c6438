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
