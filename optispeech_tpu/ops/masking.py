"""Length/padding mask helpers.

Capability parity with the reference's mask utilities
(/root/reference/optispeech/utils/model.py:12-27) in jit-safe form: every
function takes an explicit static ``max_length`` because under ``jax.jit`` the
maximum of a traced length vector is not available as a Python int.
"""

import jax.numpy as jnp


def sequence_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """Boolean mask (B, T): True for valid (non-pad) positions.

    Equivalent to reference `sequence_mask` (utils/model.py:12) with an
    explicit static length.
    """
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def make_non_pad_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """(B, T) bool, True on valid positions (utils/model.py:19)."""
    return sequence_mask(lengths, max_length)


def make_pad_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """(B, T) bool, True on PAD positions (utils/model.py:24)."""
    return ~sequence_mask(lengths, max_length)


# Alias used throughout model code to mirror the reference's
# `input_padding_mask` convention (True == padded).
lengths_to_padding_mask = make_pad_mask
