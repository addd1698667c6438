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


def test_biquad_filters_frequency_response():
    """RBJ low/high-pass biquads (torchaudio lowpass_biquad/highpass_biquad
    semantics, Q=0.707): -3 dB at cutoff, passband preserved, stopband
    attenuated (reference feature_extractors/__init__.py:88-95)."""
    sr = 24000

    def tone(f, dur=0.5):
        return np.sin(2 * np.pi * f * np.arange(int(sr * dur)) / sr).astype(np.float32)

    def rms(x):
        return float(np.sqrt(np.mean(x[len(x) // 4:] ** 2)))  # skip transient

    lp = lambda f: rms(dsp.lowpass_biquad(tone(f), sr, 2000.0)) / rms(tone(f))
    assert lp(200.0) > 0.95          # passband
    assert abs(lp(2000.0) - 0.707) < 0.05  # -3 dB at cutoff
    assert lp(8000.0) < 0.1          # stopband (-12 dB/oct, 2 octaves)

    hp = lambda f: rms(dsp.highpass_biquad(tone(f), sr, 2000.0)) / rms(tone(f))
    assert hp(8000.0) > 0.95
    assert abs(hp(2000.0) - 0.707) < 0.05
    assert hp(500.0) < 0.15


def test_biquad_matches_difference_equation():
    """lfilter path == direct-form-I oracle of the RBJ coefficients."""
    rng = np.random.default_rng(7)
    wav = rng.normal(size=400).astype(np.float32)
    sr, fc = 24000, 3000.0
    out = dsp.lowpass_biquad(wav, sr, fc)
    b, a = dsp._rbj_biquad_coeffs(sr, fc, 0.707, "lowpass")
    y = np.zeros(len(wav))
    x = wav.astype(np.float64)
    for n in range(len(wav)):
        y[n] = b[0] * x[n] + b[1] * (x[n - 1] if n >= 1 else 0) \
            + b[2] * (x[n - 2] if n >= 2 else 0) \
            - a[1] * (y[n - 1] if n >= 1 else 0) - a[2] * (y[n - 2] if n >= 2 else 0)
    np.testing.assert_allclose(out, y, atol=1e-5)


def test_feature_extractor_applies_band_filters(tmp_path):
    """lowpass_freq knob removes high-frequency content from the mel."""
    from optispeech_tpu.data.preprocess import FeatureExtractor
    from optispeech_tpu.config import FeatureConfig

    sr = 24000
    t = np.arange(sr) / sr
    wav = (0.4 * np.sin(2 * np.pi * 220 * t)
           + 0.4 * np.sin(2 * np.pi * 7000 * t)).astype(np.float32)
    path = str(tmp_path / "x.wav")
    save_wav(path, wav, sr)
    feats = FeatureConfig(sample_rate=sr, n_feats=80, f_min=0.0, f_max=12000.0)
    plain = FeatureExtractor(features=feats, loudness_norm_target_db=None,
                             pitch_extractor="autocorr")
    filtered = FeatureExtractor(features=feats, loudness_norm_target_db=None,
                                lowpass_freq=2000.0, pitch_extractor="autocorr")
    _, mel_a, _, _ = plain(path)
    _, mel_b, _, _ = filtered(path)
    # peak re-normalization shifts absolute levels, so compare the 7 kHz tone
    # peak RELATIVE to the 220 Hz passband peak: the contrast must collapse
    prof_a, prof_b = mel_a.mean(axis=1), mel_b.mean(axis=1)
    contrast_a = prof_a[55:75].max() - prof_a[:20].max()
    contrast_b = prof_b[55:75].max() - prof_b[:20].max()
    assert contrast_b < contrast_a - 2.0


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
