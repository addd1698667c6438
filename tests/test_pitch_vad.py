"""Pitch-extractor zoo + spectral VAD tests on synthetic known-truth signals
(VERDICT r1 items 6 and 9; reference pitch_extractors.py / norm_audio)."""

import numpy as np
import pytest

from optispeech_tpu.config import FeatureConfig
from optispeech_tpu.data.pitch import (
    EnsemblePitchExtractor,
    PITCH_EXTRACTORS,
    make_pitch_extractor,
    yin_pitch,
)
from optispeech_tpu.data.vad import SpectralVoiceActivityDetector, trim_silence_spectral

SR = 24000
HOP = 256


def linear_sweep(f0, f1, dur, sr=SR, amp=0.4, n_harm=1):
    """Sine sweep with known instantaneous F0; `n_harm>1` adds 1/k-weighted
    harmonics (speech-like; a pure sine is the degenerate case for cepstral
    pitch, which measures harmonic spacing)."""
    t = np.arange(int(dur * sr)) / sr
    inst = f0 + (f1 - f0) * t / dur
    phase = 2 * np.pi * np.cumsum(inst) / sr
    sig = sum((amp / k) * np.sin(k * phase) for k in range(1, n_harm + 1))
    return sig.astype(np.float32), inst


def harmonic_tone(f0, dur, sr=SR, amp=0.3, n_harm=6):
    t = np.arange(int(dur * sr)) / sr
    sig = sum((amp / (k + 1)) * np.sin(2 * np.pi * f0 * (k + 1) * t) for k in range(n_harm))
    return sig.astype(np.float32)


def _feats():
    return FeatureConfig(sample_rate=SR, n_feats=80, n_fft=1024, hop_length=HOP,
                         win_length=1024, f_min=0.0, f_max=8000.0)


@pytest.mark.parametrize("name", sorted(PITCH_EXTRACTORS))
def test_tracker_median_error_under_5hz_on_sweep(name):
    wav, inst = linear_sweep(150.0, 250.0, 2.0, n_harm=5)
    n_frames = len(wav) // HOP
    ex = make_pitch_extractor(name, _feats(), interpolate=False)
    f0 = ex(wav, n_frames)
    assert f0.shape == (n_frames,)
    centers = np.minimum(np.arange(n_frames) * HOP, len(inst) - 1)
    truth = inst[centers]
    core = slice(4, n_frames - 4)  # edge frames see reflect-padding artifacts
    voiced = f0[core] > 0
    assert voiced.mean() > 0.9, f"{name} missed voicing on a clean sweep"
    err = np.abs(f0[core][voiced] - truth[core][voiced])
    assert np.median(err) < 5.0, f"{name}: median F0 error {np.median(err):.2f} Hz"


def test_yin_harmonic_tone_no_octave_error():
    """Harmonic-rich tone: the tracker must report the fundamental, not a
    harmonic or subharmonic."""
    wav = harmonic_tone(180.0, 1.5)
    n_frames = len(wav) // HOP
    f0 = yin_pitch(wav, SR, HOP, n_frames, interpolate=False)
    voiced = f0 > 0
    assert voiced.mean() > 0.9
    assert abs(np.median(f0[voiced]) - 180.0) < 4.0


@pytest.mark.parametrize("name", ["yin", "cepstrum", "ensemble"])
def test_tracker_reports_unvoiced_on_noise(name):
    rng = np.random.default_rng(0)
    wav = (rng.normal(size=SR) * 0.1).astype(np.float32)
    n_frames = len(wav) // HOP
    ex = make_pitch_extractor(name, _feats(), interpolate=False)
    f0 = ex(wav, n_frames)
    assert (f0 == 0).mean() > 0.8, f"{name} hallucinated pitch in white noise"


def test_ensemble_uv_mask_and_interpolation():
    tone = harmonic_tone(220.0, 1.0)
    pad = np.zeros(int(0.3 * SR), np.float32)
    wav = np.concatenate([pad, tone, pad])
    n_frames = len(wav) // HOP
    feats = _feats()

    raw = EnsemblePitchExtractor(
        sample_rate=SR, n_feats=80, hop_length=HOP, n_fft=1024, win_length=1024,
        f_min=65.0, f_max=800.0, interpolate=False,
    )(wav, n_frames)
    # silence regions masked to 0, tone region near 220 Hz
    lead = raw[: int(0.25 * SR / HOP)]
    mid = raw[int(0.4 * SR / HOP) : int(1.1 * SR / HOP)]
    assert (lead == 0).mean() > 0.7
    assert abs(np.median(mid[mid > 0]) - 220.0) < 5.0

    interp = make_pitch_extractor("ensemble", feats, interpolate=True)(wav, n_frames)
    assert (interp > 0).all()  # unvoiced runs filled by interpolation


def test_ensemble_members_disagreement_is_weighted():
    """The ensemble must track the designated UV detector's voicing decisions
    and stay within the members' estimates elsewhere."""
    wav, _ = linear_sweep(200.0, 200.0, 1.0)
    n_frames = len(wav) // HOP
    feats = _feats()
    members = np.stack([
        make_pitch_extractor(n, feats, interpolate=False)(wav, n_frames)
        for n in ("autocorr", "yin", "cepstrum")
    ])
    ens = make_pitch_extractor("ensemble", feats, interpolate=False)(wav, n_frames)
    voiced = ens > 0
    # the per-frame renormalized average uses only VOICED member estimates
    vm = np.where(members > 0, members, np.nan)
    lo = np.nanmin(vm, axis=0)[voiced]
    hi = np.nanmax(vm, axis=0)[voiced]
    assert ((ens[voiced] >= lo - 1e-3) & (ens[voiced] <= hi + 1e-3)).all()


# ---------------------------------------------------------------------------
# spectral VAD


def _speech_with_noise(lead_s=0.5, speech_s=1.0, trail_s=0.7, noise_db=-45.0):
    rng = np.random.default_rng(3)
    noise_amp = 10 ** (noise_db / 20)
    lead = (rng.normal(size=int(lead_s * SR)) * noise_amp).astype(np.float32)
    trail = (rng.normal(size=int(trail_s * SR)) * noise_amp).astype(np.float32)
    # amplitude-modulated harmonic "speech"
    speech = harmonic_tone(140.0, speech_s)
    t = np.arange(len(speech)) / SR
    speech = (speech * (0.6 + 0.4 * np.sin(2 * np.pi * 3.1 * t))).astype(np.float32)
    return np.concatenate([lead, speech, trail]), len(lead), len(lead) + len(speech)


def test_vad_trims_leading_and_trailing_noise_with_margins():
    wav, s0, s1 = _speech_with_noise()
    chunk = 480
    out = trim_silence_spectral(wav, SR, samples_per_chunk=chunk,
                                keep_chunks_before=2, keep_chunks_after=2)
    # most of the lead/trail noise gone, all speech kept
    assert len(out) < len(wav) - int(0.6 * SR)
    assert len(out) >= (s1 - s0)  # speech region + margins survives
    # the trimmed audio still contains the loudest samples (speech)
    assert np.max(np.abs(out)) == pytest.approx(np.max(np.abs(wav)))


def test_vad_probabilities_separate_speech_from_noise():
    wav, s0, s1 = _speech_with_noise()
    chunk = 480
    probs = SpectralVoiceActivityDetector()(wav, SR, chunk)
    speech_probs = probs[s0 // chunk + 1 : s1 // chunk - 1]
    noise_probs = np.concatenate([probs[: s0 // chunk - 1], probs[s1 // chunk + 1 :]])
    assert np.median(speech_probs) > 0.5
    assert np.median(noise_probs) < 0.1


def test_vad_keeps_unscored_tail_remainder():
    """Speech running into the final partial chunk keeps the tail remainder
    (< samples_per_chunk, never scored by the chunk VAD)."""
    chunk = 480
    lead = np.zeros(chunk * 10, np.float32)
    speech = harmonic_tone(140.0, 1.0)
    wav = np.concatenate([lead, speech])
    remainder = 137  # partial final chunk, still inside the speech tone
    wav = wav[: (len(wav) - remainder) // chunk * chunk + remainder]
    out = trim_silence_spectral(wav, SR, samples_per_chunk=chunk,
                                keep_chunks_before=1, keep_chunks_after=1)
    # trailing remainder retained: output ends exactly at the input's end
    assert np.array_equal(out[-remainder:], wav[-remainder:])


def test_vad_no_speech_returns_untrimmed():
    rng = np.random.default_rng(5)
    wav = (rng.normal(size=SR) * 0.01).astype(np.float32)
    out = trim_silence_spectral(wav, SR)
    assert len(out) == len(wav)


def test_preprocess_uses_spectral_trim(tmp_path):
    """FeatureExtractor wires method='spectral' through to the VAD trim."""
    from optispeech_tpu.data.preprocess import FeatureExtractor
    from optispeech_tpu.utils.wavio import save_wav

    wav, s0, s1 = _speech_with_noise()
    path = tmp_path / "utt.wav"
    save_wav(str(path), wav, SR)
    feats = FeatureConfig(sample_rate=SR, n_feats=20, n_fft=256, hop_length=64,
                          win_length=256)
    fe = FeatureExtractor(
        features=feats, trim_silence=True,
        trim_silence_args=dict(method="spectral", threshold=0.2, chunk=480,
                               keep_chunks_before=2, keep_chunks_after=2),
        pitch_extractor="yin", loudness_norm_target_db=None,
    )
    out_wav, mel, energy, pitch = fe(str(path))
    assert len(out_wav) < len(wav) - int(0.6 * SR)
    assert mel.shape[-1] == len(pitch)
