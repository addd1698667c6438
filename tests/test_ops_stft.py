"""STFT / mel parity tests against torch.stft (CPU oracle) and reference
feature-extraction conventions (SURVEY.md hard-part #5)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from optispeech_tpu.ops import (
    frame_energy,
    hann_window,
    log_mel_spectrogram,
    mel_filterbank,
    stft_magnitude,
)


def _torch_stft_mag(x, n_fft, hop, win_length, window, center=True, floor=0.0):
    spec = torch.stft(
        torch.tensor(x),
        n_fft,
        hop_length=hop,
        win_length=win_length,
        window=window,
        center=center,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    mag = torch.sqrt(torch.view_as_real(spec).pow(2).sum(-1) + floor)
    return mag.numpy()  # (B, freq, frames)


def test_hann_window_matches_torch():
    for n in (240, 600, 1024):
        np.testing.assert_allclose(
            np.asarray(hann_window(n)), torch.hann_window(n).numpy(), atol=1e-6
        )


@pytest.mark.parametrize("method", ["matmul", "fft"])
@pytest.mark.parametrize(
    "n_fft,hop,win", [(1024, 256, 1024), (1024, 120, 600), (512, 50, 240), (2048, 240, 1200)]
)
def test_stft_magnitude_vs_torch(rng, n_fft, hop, win, method):
    x = rng.normal(size=(2, 4096)).astype(np.float32)
    got = stft_magnitude(jnp.asarray(x), n_fft, hop, win, window="hann", method=method)
    expect = _torch_stft_mag(x, n_fft, hop, win, torch.hann_window(win))
    got = np.asarray(got).transpose(0, 2, 1)  # frame-major -> freq-major
    assert got.shape == expect.shape
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=2e-4)


def test_stft_rect_window_vs_torch(rng):
    """MRD discriminator uses a rectangular (ones) window (_discriminators.py:206-214)."""
    x = rng.normal(size=(1, 4000)).astype(np.float32)
    n_fft, hop, win = 1024, 256, 1024
    got = np.asarray(stft_magnitude(jnp.asarray(x), n_fft, hop, win, window="ones"))
    expect = _torch_stft_mag(x, n_fft, hop, win, torch.ones(n_fft))
    np.testing.assert_allclose(got.transpose(0, 2, 1), expect, rtol=1e-3, atol=3e-4)


def _reference_get_mel_torch(wav, sr, n_fft, hop, win, n_mels, fmin, fmax):
    """Oracle transcription of CommonFeatureExtractor.get_mel
    (feature_extractors/__init__.py:157-200) using our numpy mel basis
    (librosa is unavailable in this image; the basis itself is tested
    separately for filterbank properties)."""
    from optispeech_tpu.ops.stft import _mel_filterbank_np

    y = torch.tensor(wav).unsqueeze(0)
    pad = int((n_fft - hop) / 2)
    y = torch.nn.functional.pad(y.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(
        y, n_fft, hop_length=hop, win_length=win, window=torch.hann_window(win),
        center=True, pad_mode="reflect", normalized=False, onesided=True, return_complex=True,
    )
    spec = torch.view_as_real(spec)
    mag = torch.sqrt(spec.pow(2).sum(-1) + 1e-9)
    fb = torch.tensor(_mel_filterbank_np(sr, n_fft, n_mels, float(fmin), float(fmax), False, "slaney"))
    mel = torch.matmul(fb, mag)
    return torch.log(torch.clamp(mel, min=1e-5)).squeeze(0).numpy()


def test_log_mel_spectrogram_parity(rng):
    sr, n_fft, hop, win, n_mels, fmin, fmax = 24000, 1024, 256, 1024, 100, 80, 8000
    wav = (rng.normal(size=(12000,)) * 0.2).astype(np.float32)
    got = np.asarray(log_mel_spectrogram(jnp.asarray(wav), sr, n_fft, hop, win, n_mels, fmin, fmax))
    expect = _reference_get_mel_torch(wav, sr, n_fft, hop, win, n_mels, fmin, fmax)
    assert got.shape == expect.shape
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=2e-3)


def test_frame_energy_parity(rng):
    """get_energy oracle (feature_extractors/__init__.py:114-147)."""
    n_fft, hop, win = 1024, 256, 1024
    wav = (rng.normal(size=(8000,)) * 0.3).astype(np.float32)
    y = torch.tensor(wav).unsqueeze(0)
    pad = int((n_fft - hop) / 2)
    y = torch.nn.functional.pad(y.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.view_as_real(
        torch.stft(y, n_fft, hop_length=hop, win_length=win, window=torch.hann_window(win),
                   center=True, pad_mode="reflect", normalized=False, onesided=True, return_complex=True)
    )
    mags = torch.sqrt(spec.pow(2).sum(-1) + 1e-9)
    expect = torch.norm(mags, dim=1).squeeze(0).numpy()
    got = np.asarray(frame_energy(jnp.asarray(wav), n_fft, hop, win))
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-2)


def test_mel_filterbank_properties():
    fb = np.asarray(mel_filterbank(24000, 1024, 100, 80, 8000, htk=False, norm="slaney"))
    assert fb.shape == (100, 513)
    assert (fb >= 0).all()
    # each filter has support and a single peak region
    assert (fb.sum(axis=1) > 0).all()
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()
    # htk variant without norm has peak height ~1
    fb_htk = np.asarray(mel_filterbank(24000, 1024, 100, 0, 12000, htk=True, norm=None))
    assert 0.5 < fb_htk.max() <= 1.0 + 1e-6
