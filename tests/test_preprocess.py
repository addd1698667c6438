"""Host DSP + offline preprocessing pipeline tests."""

import jax.numpy as jnp
import numpy as np

from optispeech_tpu.config import FeatureConfig, TextProcessorConfig
from optispeech_tpu.data import dsp
from optispeech_tpu.data.preprocess import (
    FeatureExtractor,
    get_sids_and_lids,
    parse_metadata,
    preprocess_dataset,
)
from optispeech_tpu.ops import frame_energy, log_mel_spectrogram
from optispeech_tpu.text import TextProcessor
from optispeech_tpu.utils.wavio import load_wav, save_wav


def test_numpy_dsp_matches_jax_ops(rng):
    """Host (numpy) feature path must match the on-device ops bit-for-bit-ish:
    data preprocessed on host trains a model whose losses recompute the same
    features on device."""
    wav = (rng.normal(size=6000) * 0.2).astype(np.float32)
    sr, n_fft, hop, win, n_mels, fmin, fmax = 24000, 1024, 256, 1024, 80, 80, 8000
    mel_np = dsp.log_mel_spectrogram_np(wav, sr, n_fft, hop, win, n_mels, fmin, fmax)
    mel_jax = np.asarray(log_mel_spectrogram(jnp.asarray(wav), sr, n_fft, hop, win, n_mels, fmin, fmax))
    assert mel_np.shape == mel_jax.shape
    np.testing.assert_allclose(mel_np, mel_jax, atol=5e-3)
    e_np = dsp.frame_energy_np(wav, n_fft, hop, win)
    e_jax = np.asarray(frame_energy(jnp.asarray(wav), n_fft, hop, win))
    np.testing.assert_allclose(e_np, e_jax, rtol=1e-3, atol=1e-2)


def test_autocorr_pitch_tracks_sine():
    sr, hop = 24000, 256
    t = np.arange(sr) / sr
    for f0 in (110.0, 220.0, 440.0):
        wav = np.sin(2 * np.pi * f0 * t).astype(np.float32)
        n_frames = len(wav) // hop
        pitch = dsp.autocorr_pitch(wav, sr, hop, n_frames)
        mid = pitch[10:-10]
        assert np.abs(np.median(mid) - f0) < f0 * 0.03, (f0, np.median(mid))


def test_loudness_normalization():
    rng = np.random.default_rng(0)
    wav = (rng.normal(size=48000) * 0.05).astype(np.float32)
    normed = dsp.normalize_loudness(wav, 24000, target_db=-24.0)
    measured = dsp.integrated_loudness(normed, 24000)
    assert abs(measured - (-24.0)) < 1.0


def test_trim_silence_energy():
    sr = 24000
    sig = np.concatenate([
        np.zeros(sr // 2), np.sin(2 * np.pi * 220 * np.arange(sr) / sr) * 0.5, np.zeros(sr // 2)
    ]).astype(np.float32)
    trimmed = dsp.trim_silence_energy(sig, sr)
    assert len(trimmed) < len(sig)
    assert len(trimmed) >= sr  # kept the tone


def test_wav_io_roundtrip(tmp_path, rng):
    wav = (rng.normal(size=12000) * 0.3).clip(-1, 1).astype(np.float32)
    path = str(tmp_path / "x.wav")
    save_wav(path, wav, 24000)
    loaded, sr = load_wav(path, sr=24000)
    assert sr == 24000
    np.testing.assert_allclose(loaded, wav, atol=1e-3)
    # resampling path
    loaded16, sr16 = load_wav(path, sr=16000)
    assert sr16 == 16000 and abs(len(loaded16) - 8000) < 10


def test_metadata_parsing():
    import tempfile, pathlib

    with tempfile.TemporaryDirectory() as d:
        p = pathlib.Path(d) / "metadata.csv"
        p.write_text("utt1|hello\nutt2|spk_a|world\nutt3|spk_a|en-us|hi there\n")
        rows = parse_metadata(p)
        assert rows[0]["speaker"] is None
        assert rows[1]["speaker"] == "spk_a"
        assert rows[2]["lang"] == "en-us"
        sid_map, lid_map = get_sids_and_lids(rows)
        assert sid_map == {"spk_a": 0}
        assert lid_map == {"en-us": 0}


def test_preprocess_dataset_end_to_end(tmp_path, rng):
    # build a tiny 4-utterance dataset of sines
    sr = 24000
    ds_dir = tmp_path / "dataset"
    (ds_dir / "wavs").mkdir(parents=True)
    lines = []
    for i in range(4):
        wav = (np.sin(2 * np.pi * (200 + 50 * i) * np.arange(sr) / sr) * 0.5).astype(np.float32)
        save_wav(str(ds_dir / "wavs" / f"utt{i}.wav"), wav, sr)
        lines.append(f"utt{i}|hello world number {i}")
    (ds_dir / "metadata.csv").write_text("\n".join(lines))

    tp = TextProcessor.from_config(TextProcessorConfig(tokenizer="char"))
    fe = FeatureExtractor(features=FeatureConfig())
    out_dir = tmp_path / "out"
    train, val = preprocess_dataset(str(ds_dir), str(out_dir), tp, fe, val_fraction=0.25)
    assert len(train) == 3 and len(val) == 1
    # datafiles load through the training dataset class
    from optispeech_tpu.data.datamodule import TextWavDataset

    ds = TextWavDataset(str(out_dir / "train.txt"))
    item = ds[0]
    assert item["mel"].shape[0] == 100
    assert item["mel"].shape[1] == item["pitch"].shape[0] == item["energy"].shape[0]
    assert np.isfinite(item["mel"]).all()
    assert len(item["x"]) > 0
