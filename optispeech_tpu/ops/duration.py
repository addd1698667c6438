"""Duration <-> frame mapping ops.

Capability parity with /root/reference/optispeech/model/generator/alignments.py:
- `gaussian_upsample`  <- GaussianUpsampling (alignments.py:126)
- `expand_by_duration` <- expand_by_duration (alignments.py:283)
- `average_by_duration` <- numba `_average_by_duration` (alignments.py:242),
  re-expressed as one masked matmul so it stays on the TPU (the reference
  forces a device->host sync per batch: alignments.py:277).

All ops take static max lengths and explicit length vectors, so they are
jit/bucketing friendly.
"""

import jax.numpy as jnp

from .masking import sequence_mask

_NEG_INF = -1e9


def _interval_matrix(durations: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    """(B, n_frames, T_text) 0/1 matrix: M[b, t, k] = 1 iff frame t belongs to token k.

    Frame t belongs to token k when cumsum_exclusive[k] <= t < cumsum[k].
    """
    dur = durations.astype(jnp.float32)
    cs = jnp.cumsum(dur, axis=1)  # inclusive (B, T_text)
    cs_ex = cs - dur  # exclusive
    t = jnp.arange(n_frames, dtype=jnp.float32)[None, :, None]  # (1, F, 1)
    m = (cs_ex[:, None, :] <= t) & (cs[:, None, :] > t)
    return m


def expand_by_duration(
    x: jnp.ndarray, durations: jnp.ndarray, n_frames: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Expand token-level features to frame level (reference alignments.py:283).

    Args:
        x: (B, T_text, C)
        durations: (B, T_text) int/float durations.
        n_frames: static output frame count (>= max total duration); frames
            past the total duration are zero.

    Returns:
        expanded (B, n_frames, C), lengths (B,) total durations.
    """
    mult = _interval_matrix(durations, n_frames).astype(x.dtype)
    expanded = jnp.matmul(mult, x, precision="highest")
    lengths = jnp.sum(durations, axis=1).astype(jnp.int32)
    return expanded, lengths


def duration_to_frame_index(durations: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    """Per-frame token index (B, n_frames): which token each frame belongs to.

    Frames past the total duration map to the last token index.
    """
    dur = durations.astype(jnp.float32)
    cs = jnp.cumsum(dur, axis=1)
    t = jnp.arange(n_frames, dtype=jnp.float32)[None, :, None]
    # index = number of tokens fully finished before frame t; frames past the
    # total duration would count every token, so clamp to the last index
    idx = jnp.sum(cs[:, None, :] <= t, axis=-1).astype(jnp.int32)
    return jnp.minimum(idx, durations.shape[1] - 1)


def average_by_duration(
    durations: jnp.ndarray,
    xs: jnp.ndarray,
    text_lengths: jnp.ndarray,
    feats_lengths: jnp.ndarray,
) -> jnp.ndarray:
    """Average frame-level features into token-level means (alignments.py:242-280).

    Args:
        durations: (B, T_text) token durations (padding tokens have 0).
        xs: (B, T_feats) frame-level values (e.g. pitch).
        text_lengths: (B,)
        feats_lengths: (B,)

    Returns:
        (B, T_text) token-level means; tokens with zero frames (incl. padding)
        are 0, matching the numba kernel.
    """
    b, t_text = durations.shape
    t_feats = xs.shape[1]
    frame_valid = sequence_mask(feats_lengths, t_feats)  # (B, F)
    xs = jnp.where(frame_valid, xs, 0.0).astype(jnp.float32)
    token_valid = sequence_mask(text_lengths, t_text)  # (B, T)
    dur = jnp.where(token_valid, durations, 0)

    m = _interval_matrix(dur, t_feats)  # (B, F, T)
    m = m & frame_valid[:, :, None]
    mf = m.astype(jnp.float32)
    sums = jnp.einsum("bft,bf->bt", mf, xs, precision="highest")
    counts = jnp.sum(mf, axis=1)
    avg = sums / jnp.maximum(counts, 1.0)
    return jnp.where(token_valid & (counts > 0), avg, 0.0)


def gaussian_upsample(
    hs: jnp.ndarray,
    ds: jnp.ndarray,
    h_masks: jnp.ndarray | None,
    d_masks: jnp.ndarray | None,
    delta: float = 0.1,
) -> jnp.ndarray:
    """Gaussian upsampling with fixed temperature (alignments.py:126-174).

    Args:
        hs: (B, T_text, C) token hidden states.
        ds: (B, T_text) durations.
        h_masks: (B, T_feats) bool valid-frame mask (None -> all valid);
            its static width defines the output length.
        d_masks: (B, T_text) bool valid-token mask.
        delta: temperature.

    Returns:
        (B, T_feats, C)
    """
    if h_masks is None:
        raise ValueError("h_masks is required under jit (defines static T_feats)")
    t_feats = h_masks.shape[-1]
    ds = ds.astype(jnp.float32)
    t = jnp.arange(t_feats, dtype=jnp.float32)[None, :]
    t = t * h_masks.astype(jnp.float32)
    c = jnp.cumsum(ds, axis=-1) - ds / 2  # (B, T_text)
    energy = -delta * (t[:, :, None] - c[:, None, :]) ** 2  # (B, F, T)
    if d_masks is not None:
        energy = jnp.where(d_masks[:, None, :], energy, _NEG_INF)
    p_attn = jnp.exp(energy - jnp.max(energy, axis=2, keepdims=True))
    p_attn = p_attn / jnp.sum(p_attn, axis=2, keepdims=True)
    return jnp.matmul(p_attn.astype(hs.dtype), hs, precision="highest")
