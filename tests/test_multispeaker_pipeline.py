"""Multi-speaker / multi-language path: preprocess (3/4-column metadata) ->
collate with sids/lids -> train step with speaker embeddings."""

import dataclasses

import jax
import numpy as np

from optispeech_tpu.config import DataConfig, TextProcessorConfig
from optispeech_tpu.data.datamodule import BucketedCollate, TextWavDataset
from optispeech_tpu.data.preprocess import FeatureExtractor, preprocess_dataset
from optispeech_tpu.models.discriminator.vocos import VocosDiscriminator
from optispeech_tpu.models.generator import OptiSpeechGenerator
from optispeech_tpu.text import TextProcessor
from optispeech_tpu.training.state import init_train_state
from optispeech_tpu.training.step import make_train_step
from optispeech_tpu.utils.wavio import save_wav

from test_train_step import tiny_experiment


def test_multispeaker_end_to_end(tmp_path, rng):
    # dataset with 2 speakers (3-column metadata)
    sr = 24000
    ds_dir = tmp_path / "ds"
    (ds_dir / "wavs").mkdir(parents=True)
    lines = []
    for i in range(6):
        wav = (np.sin(2 * np.pi * (150 + 40 * i) * np.arange(sr) / sr) * 0.4).astype(np.float32)
        save_wav(str(ds_dir / "wavs" / f"u{i}.wav"), wav, sr)
        lines.append(f"u{i}|spk{'AB'[i % 2]}|utterance number {i}")
    (ds_dir / "metadata.csv").write_text("\n".join(lines))

    tp = TextProcessor.from_config(TextProcessorConfig(tokenizer="char"))
    from optispeech_tpu.config import FeatureConfig

    feats = FeatureConfig(sample_rate=sr, n_feats=20, n_fft=256, hop_length=64, win_length=256)
    fe = FeatureExtractor(features=feats)
    out = tmp_path / "prep"
    preprocess_dataset(str(ds_dir), str(out), tp, fe, val_fraction=0.2)

    import json

    sid_map = json.loads((out / "speaker_ids.json").read_text())
    assert set(sid_map) == {"spkA", "spkB"}

    ds = TextWavDataset(str(out / "train.txt"), f_min=feats.f_min)
    items = [ds[i] for i in range(4)]
    assert all(it["sid"] in (0, 1) for it in items)

    cfg = tiny_experiment(pretraining_steps=0)
    cfg = dataclasses.replace(
        cfg,
        generator=dataclasses.replace(cfg.generator, num_speakers=2, features=feats),
        data=dataclasses.replace(cfg.data, num_speakers=2),
    )
    collate = BucketedCollate(n_feats=20, statistics=cfg.data.statistics, hop_length=64,
                              text_bucket=cfg.data.text_bucket_size,
                              mel_bucket=cfg.data.mel_bucket_size,
                              max_text_len=cfg.data.text_bucket_size,
                              max_mel_len=cfg.data.mel_bucket_size)
    batch = collate(items)
    assert batch["sids"] is not None and batch["sids"].shape == (4,)

    generator = OptiSpeechGenerator(cfg.generator)
    discriminator = VocosDiscriminator(cfg.discriminator, cfg.generator.features)
    state = init_train_state(cfg, generator, discriminator, jax.random.PRNGKey(0))
    assert "sid_embed" in state.g_params
    step_fn = make_train_step(cfg, generator, discriminator)
    dev_batch = {k: v for k, v in batch.items()
                 if k in ("x", "wav", "mel", "x_lengths", "wav_lengths", "mel_lengths",
                          "energies", "pitches", "sids", "lids")}
    state, logs = step_fn(state, dev_batch)
    assert np.isfinite(float(logs["total_loss/generator"]))


def test_multilanguage_preprocess_lids(tmp_path, rng):
    """4-column metadata -> language id maps and lids in datafiles."""
    sr = 24000
    ds_dir = tmp_path / "ds"
    (ds_dir / "wavs").mkdir(parents=True)
    lines = []
    langs = ["en-us", "de"]
    for i in range(4):
        wav = (np.sin(2 * np.pi * 200 * np.arange(sr // 2) / sr) * 0.4).astype(np.float32)
        save_wav(str(ds_dir / "wavs" / f"u{i}.wav"), wav, sr)
        lines.append(f"u{i}|spk0|{langs[i % 2]}|utterance {i}")
    (ds_dir / "metadata.csv").write_text("\n".join(lines))

    tp = TextProcessor.from_config(
        TextProcessorConfig(tokenizer="char", languages=("en-us", "de"))
    )
    from optispeech_tpu.config import FeatureConfig

    feats = FeatureConfig(sample_rate=sr, n_feats=20, n_fft=256, hop_length=64, win_length=256)
    out = tmp_path / "prep"
    preprocess_dataset(str(ds_dir), str(out), tp, FeatureExtractor(features=feats),
                       val_fraction=0.25)
    import json

    lid_map = json.loads((out / "language_ids.json").read_text())
    assert set(lid_map) == {"en-us", "de"}
    ds = TextWavDataset(str(out / "train.txt"), f_min=feats.f_min)
    assert all(ds[i]["lid"] in (0, 1) for i in range(len(ds)))
