"""Random segment cropping for GAN vocoder training.

Capability parity with /root/reference/optispeech/utils/segments.py:12-72,
vectorized: the reference loops over the batch copying slices; here a single
batched gather keeps everything on device.
"""

import jax
import jax.numpy as jnp


def get_segments(x: jnp.ndarray, start_idxs: jnp.ndarray, segment_size: int) -> jnp.ndarray:
    """Crop fixed-size segments at given start indices.

    Args:
        x: (B, C, T) input.
        start_idxs: (B,) int start indices.
        segment_size: static segment length.

    Returns:
        (B, C, segment_size)
    """
    b = x.shape[0]
    offs = jnp.arange(segment_size)
    idx = start_idxs[:, None] + offs[None, :]  # (B, S)
    idx = jnp.clip(idx, 0, x.shape[-1] - 1)
    return jax.vmap(lambda xi, ii: xi[:, ii])(x, idx)


def get_random_segments(
    rng: jax.Array,
    x: jnp.ndarray,
    x_lengths: jnp.ndarray,
    segment_size: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Randomly crop segments respecting per-item valid lengths.

    Mirrors reference `get_random_segments` (utils/segments.py:12):
    ``start = floor(U[0,1) * max(len - segment_size, 0))``.

    Returns (segments (B, C, S), start_idxs (B,)).
    """
    b = x.shape[0]
    max_start = jnp.maximum(x_lengths - segment_size, 0)
    u = jax.random.uniform(rng, (b,))
    start_idxs = jnp.floor(u * max_start).astype(jnp.int32)
    return get_segments(x, start_idxs, segment_size), start_idxs


def host_sample_segment_starts(rng, mel_lengths, segment_size: int):
    """Host-side (numpy) counterpart of the generator's segment sampling.

    Same distribution as `get_random_segments` fed with the generator's
    `num_frames = max(mel_lengths - 4, 1)` bound (models/generator.py:187).
    Sampling on the host lets the trainer ship only the cropped GT waveform
    segment to the device instead of the full padded batch — the full-length
    wav is ~75% of the batch's host->device bytes and is only ever read at
    these start indices (reference base_lightning_module.py:38-44).

    Args:
        rng: np.random.Generator.
        mel_lengths: (B,) int array of true mel lengths.
        segment_size: static segment length in mel frames.

    Returns (B,) int32 start indices in mel frames.
    """
    import numpy as np

    num_frames = np.maximum(np.asarray(mel_lengths) - 4, 1)
    max_start = np.maximum(num_frames - segment_size, 0)
    u = rng.random(len(num_frames))
    return np.floor(u * max_start).astype(np.int32)


def host_slice_wav_segments(wav, start_idxs, segment_size: int, hop_length: int):
    """Slice (B, S*hop) GT waveform segments out of a host (B, T_wav) batch."""
    import numpy as np

    wav = np.asarray(wav)
    b = wav.shape[0]
    s_wav = segment_size * hop_length
    idx = np.asarray(start_idxs, np.int64)[:, None] * hop_length + np.arange(s_wav)[None, :]
    idx = np.clip(idx, 0, wav.shape[-1] - 1)
    return np.take_along_axis(wav, idx, axis=1)
