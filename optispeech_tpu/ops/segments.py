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
