"""µ-law (G.711-style, µ=255) 8-bit audio companding for the serving wire.

Role: the reference serves f32/int16 waveforms from onnxruntime
(/root/reference/ospeech/onnx/__init__.py); on this harness the device->host
tunnel is the serving bottleneck (CLAUDE.md: ~2.4-25 MB/s, varies), so the
wire format is computed ON DEVICE inside the synthesis graph: pcm16 halves
the f32 bytes, µ-law quarters them at ~38 dB SNR on speech-shaped signals
(logarithmic companding keeps quantization noise proportional to amplitude).

`mulaw_encode` is jnp (traced into the synthesis jit); `mulaw_decode` is
dtype-generic (numpy for clients, jnp if traced).
"""

import numpy as np

MU = 255.0


def mulaw_encode(wav, mu: float = MU):
    """f32 waveform in [-1, 1] -> uint8 µ-law codes (device-side, jit-safe)."""
    import jax.numpy as jnp

    x = jnp.clip(wav, -1.0, 1.0)
    y = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / np.log1p(mu)
    return jnp.round((y + 1.0) * 0.5 * 255.0).astype(jnp.uint8)


def mulaw_decode(codes, mu: float = MU):
    """uint8 µ-law codes -> f32 waveform in [-1, 1] (numpy; client-side)."""
    y = np.asarray(codes).astype(np.float32) / 255.0 * 2.0 - 1.0
    return (np.sign(y) * ((1.0 + mu) ** np.abs(y) - 1.0) / mu).astype(np.float32)


def pack_valid_rows(codes, lengths):
    """Compact a padded (B, T) code matrix so each row's valid prefix sits
    contiguously at cumulative offsets (device-side, jit-safe).

    The serving fetch then ships ONLY real samples: a padded synthesis
    buffer is typically ~3x the valid audio (power-of-two frame rungs +
    per-row length spread), and on a bandwidth-limited device->host link
    that padding is pure waste. Returns (packed (B*T,) with the valid data
    in the prefix, offsets (B,)); total valid length is `lengths.sum()`.
    Unpack row i as packed[offsets[i] : offsets[i] + lengths[i]]."""
    import jax.numpy as jnp

    b, t = codes.shape
    lengths = lengths.astype(jnp.int32)
    offs = jnp.cumsum(lengths) - lengths
    t_idx = jnp.arange(t, dtype=jnp.int32)[None, :]
    valid = t_idx < lengths[:, None]
    pos = jnp.where(valid, offs[:, None] + t_idx, b * t)  # OOB rows drop
    packed = jnp.zeros((b * t,), codes.dtype).at[pos.reshape(-1)].set(
        codes.reshape(-1), mode="drop")
    return packed, offs


def mulaw_encode_np(wav, mu: float = MU):
    """numpy twin of `mulaw_encode` (host-side transcoding in the server's
    mixed-format batches; bit-identical to the device encode up to f32
    rounding)."""
    x = np.clip(np.asarray(wav, np.float32), -1.0, 1.0)
    y = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
    return np.round((y + 1.0) * 0.5 * 255.0).astype(np.uint8)
