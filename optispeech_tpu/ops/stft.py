"""STFT / mel-spectrogram ops with torch/librosa-convention parity.

The reference computes spectra three ways, all of which we reproduce:
- feature extraction mel: manual reflect pad of (n_fft-hop)/2 then
  `torch.stft(center=True)` with a Hann window, `sqrt(re^2+im^2+1e-9)`,
  librosa slaney-scale slaney-norm mel basis, log-clamp 1e-5
  (/root/reference/optispeech/dataset/feature_extractors/__init__.py:152-200).
- training mel-L1 loss: torchaudio MelSpectrogram power=1, htk scale, no norm
  (/root/reference/optispeech/model/vocoder/wavenext/disc/loss.py:94-107).
- MR-STFT loss + MRD discriminator: plain torch.stft magnitudes
  (loss.py:123-142, _discriminators.py:196-216).

TPU-first design: framing is a strided gather and the DFT is a single real
matmul against a precomputed cos/sin basis — MXU work instead of an FFT
butterfly, which is the faster formulation for the small FFT sizes used here
(<= 2048). `method="fft"` falls back to jnp.fft.rfft.
"""

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _hann_np(win_length: int, periodic: bool = True) -> np.ndarray:
    n = win_length + 1 if periodic else win_length
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / max(n - 1, 1))
    return w[:win_length].astype(np.float32)


def hann_window(win_length: int, periodic: bool = True) -> jnp.ndarray:
    """Hann window matching ``torch.hann_window`` (periodic by default)."""
    return jnp.asarray(_hann_np(win_length, periodic))


@lru_cache(maxsize=None)
def _dft_basis(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag DFT bases (n_fft, n_fft//2+1) for a onesided transform."""
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    ang = -2.0 * np.pi * np.outer(n, k) / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


# ---------------------------------------------------------------------------
# Framing + STFT
# ---------------------------------------------------------------------------

def frame_signal(x: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """Slice (..., T) into overlapping frames (..., n_frames, frame_length)."""
    t = x.shape[-1]
    n_frames = 1 + (t - frame_length) // hop_length
    idx = jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(frame_length)[None, :]
    return x[..., idx]


def _reflect_pad_1d(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    if pad == 0:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")


def stft_magnitude(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    window: jnp.ndarray | str | None = "hann",
    center: bool = True,
    magnitude_floor: float = 0.0,
    method: str = "matmul",
) -> jnp.ndarray:
    """Onesided STFT magnitude, torch.stft conventions.

    Args:
        x: (..., T) signal.
        window: "hann" | "ones" | explicit (win_length,) array | None (ones).
        center: reflect-pad n_fft//2 on both sides (torch default behaviour).
        magnitude_floor: added inside sqrt (reference uses 1e-9 for features,
            clamps at 1e-7 for the MR-STFT loss — pass 0 and clamp outside).

    Returns:
        (..., n_frames, n_fft//2 + 1) magnitudes. NOTE: frame-major layout
        (torch returns freq-major; transpose at call sites that need it).
    """
    win_length = win_length or n_fft
    if window is None or window == "ones":
        win = jnp.ones((win_length,), jnp.float32)
    elif isinstance(window, str):
        if window != "hann":
            raise ValueError(f"unknown window {window}")
        win = hann_window(win_length)
    else:
        win = window
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        win = jnp.pad(win, (lpad, n_fft - win_length - lpad))

    if center:
        x = _reflect_pad_1d(x, n_fft // 2)
    frames = frame_signal(x, n_fft, hop_length)  # (..., F, n_fft)
    frames = frames.astype(jnp.float32) * win[None, :]

    if method == "matmul":
        cos_b, sin_b = _dft_basis(n_fft)
        re = jnp.matmul(frames, jnp.asarray(cos_b), precision="highest")
        im = jnp.matmul(frames, jnp.asarray(sin_b), precision="highest")
        power = re * re + im * im
    else:
        spec = jnp.fft.rfft(frames, axis=-1)
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    if magnitude_floor:
        return jnp.sqrt(power + magnitude_floor)
    return jnp.sqrt(jnp.maximum(power, 1e-14))


# ---------------------------------------------------------------------------
# Mel filterbanks (librosa-slaney and htk variants, pure numpy)
# ---------------------------------------------------------------------------

def _hz_to_mel(freq: np.ndarray, htk: bool) -> np.ndarray:
    freq = np.asarray(freq, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(freq >= min_log_hz, min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep, mels)


def _mel_to_hz(mels: np.ndarray, htk: bool) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(mels >= min_log_mel, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)


@lru_cache(maxsize=None)
def _mel_filterbank_np(
    sample_rate: int, n_fft: int, n_mels: int, f_min: float, f_max: float,
    htk: bool, norm: str | None,
) -> np.ndarray:
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(_hz_to_mel(np.array(f_min), htk), _hz_to_mel(np.array(f_max), htk), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, htk)  # (n_mels + 2,)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]  # (n_mels+2, n_freq)
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
        weights *= enorm[:, None]
    return weights.astype(np.float32)  # (n_mels, n_freq)


def mel_filterbank(
    sample_rate: int, n_fft: int, n_mels: int, f_min: float, f_max: float,
    htk: bool = False, norm: str | None = "slaney",
) -> jnp.ndarray:
    """Mel filterbank (n_mels, n_fft//2 + 1).

    ``htk=False, norm="slaney"`` matches librosa defaults (feature extraction);
    ``htk=True, norm=None`` matches the torchaudio config used by the training
    mel loss (reference wavenext/disc/loss.py:94-107).
    """
    return jnp.asarray(_mel_filterbank_np(sample_rate, n_fft, n_mels, float(f_min), float(f_max), htk, norm))


# ---------------------------------------------------------------------------
# Feature-extraction spectrogram variants
# ---------------------------------------------------------------------------

def _feature_stft(wav, n_fft, hop_length, win_length, center):
    """The reference's double-padded STFT: manual (n_fft-hop)/2 reflect pad,
    then a center=True torch.stft (feature_extractors/__init__.py:175-196)."""
    pad = int((n_fft - hop_length) / 2)
    wav = _reflect_pad_1d(wav, pad)
    return stft_magnitude(
        wav, n_fft, hop_length, win_length, window="hann", center=center,
        magnitude_floor=1e-9,
    )  # (..., F, n_freq)


def log_mel_spectrogram(
    wav: jnp.ndarray,
    sample_rate: int,
    n_fft: int,
    hop_length: int,
    win_length: int,
    n_mels: int,
    f_min: float,
    f_max: float,
    center: bool = True,
) -> jnp.ndarray:
    """Log-mel features matching CommonFeatureExtractor.get_mel
    (feature_extractors/__init__.py:157-200). Input (..., T) -> (..., n_mels, F)."""
    mag = _feature_stft(wav, n_fft, hop_length, win_length, center)
    fb = mel_filterbank(sample_rate, n_fft, n_mels, f_min, f_max, htk=False, norm="slaney")
    mel = jnp.matmul(mag, fb.T, precision="highest")  # (..., F, n_mels)
    mel = jnp.moveaxis(mel, -1, -2)  # (..., n_mels, F)
    return dynamic_range_compression(mel)


def frame_energy(
    wav: jnp.ndarray, n_fft: int, hop_length: int, win_length: int, center: bool = True
) -> jnp.ndarray:
    """Per-frame spectral L2 energy matching FeatureExtractor.get_energy
    (feature_extractors/__init__.py:114-147). Input (..., T) -> (..., F)."""
    mag = _feature_stft(wav, n_fft, hop_length, win_length, center)
    return jnp.sqrt(jnp.sum(mag * mag, axis=-1))


from .audio import dynamic_range_compression  # noqa: E402  (cycle-free tail import)
