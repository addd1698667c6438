"""GAN + spectral reconstruction losses.

Capability parity with
/root/reference/optispeech/model/vocoder/wavenext/disc/loss.py: hinge
generator/discriminator losses, feature matching, mel-L1 (torchaudio htk mel,
power=1, log clip 1e-7), multi-resolution STFT (spectral convergence + log-mag
L1, magnitudes clamped at 1e-7). All spectral math runs in f32 (SURVEY.md
hard part #6: f32 islands for STFT under bf16 training).
"""

from typing import Sequence

import jax.numpy as jnp

from ...ops.audio import safe_log
from ...ops.stft import mel_filterbank, stft_magnitude


def generator_adv_loss(disc_outputs: Sequence[jnp.ndarray]):
    """Hinge loss on fake scores (reference loss.py:11-32)."""
    losses = [jnp.mean(jnp.maximum(1.0 - dg, 0.0)) for dg in disc_outputs]
    return sum(losses), losses


def discriminator_adv_loss(real_outputs, generated_outputs):
    """(reference loss.py:35-65)."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(real_outputs, generated_outputs):
        r = jnp.mean(jnp.maximum(1.0 - dr, 0.0))
        g = jnp.mean(jnp.maximum(1.0 + dg, 0.0))
        loss = loss + r + g
        r_losses.append(r)
        g_losses.append(g)
    return loss, r_losses, g_losses


def feature_matching_loss(fmap_r, fmap_g):
    """(reference loss.py:68-85)."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss = loss + jnp.mean(jnp.abs(rl - gl))
    return loss


def mel_spec_reconstruction_loss(
    y_hat, y, sample_rate, n_fft, hop_length, win_length, n_mels, f_min, f_max,
    clip_val: float = 1e-7,
):
    """L1 over log-mel magnitudes, torchaudio MelSpectrogram(power=1, htk,
    norm=None) conventions (reference loss.py:88-120)."""
    fb = mel_filterbank(sample_rate, n_fft, n_mels, f_min, f_max, htk=True, norm=None)

    def logmel(w):
        mag = stft_magnitude(w.astype(jnp.float32), n_fft, hop_length, win_length,
                             window="hann", center=True)
        mel = jnp.matmul(mag, fb.T, precision="highest")
        return safe_log(mel, clip_val)

    return jnp.mean(jnp.abs(logmel(y) - logmel(y_hat)))


def _stft_mag(x, fft_size, hop, win_length):
    """Reference stft() helper: hann(win_length) window, sqrt clamp 1e-7
    (loss.py:123-142)."""
    return stft_magnitude(x.astype(jnp.float32), fft_size, hop, win_length,
                          window="hann", center=True, magnitude_floor=0.0,
                          ).clip(min=jnp.sqrt(1e-7))


def stft_loss(x, y, fft_size, hop, win_length):
    """(spectral convergence, log-magnitude L1) (reference loss.py:197-270)."""
    x_mag = _stft_mag(x, fft_size, hop, win_length)
    y_mag = _stft_mag(y, fft_size, hop, win_length)
    sc = jnp.linalg.norm(y_mag - x_mag) / jnp.linalg.norm(y_mag)
    mag = jnp.mean(jnp.abs(jnp.log(y_mag) - jnp.log(x_mag)))
    return sc, mag


def multi_resolution_stft_loss(
    x, y,
    fft_sizes=(1024, 2048, 512),
    hop_sizes=(120, 240, 50),
    win_lengths=(600, 1200, 240),
):
    """(reference loss.py:145-194)."""
    sc_loss, mag_loss = 0.0, 0.0
    for fs, ss, wl in zip(fft_sizes, hop_sizes, win_lengths):
        sc, mag = stft_loss(x, y, fs, ss, wl)
        sc_loss = sc_loss + sc
        mag_loss = mag_loss + mag
    n = len(fft_sizes)
    return sc_loss / n, mag_loss / n
