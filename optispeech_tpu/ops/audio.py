"""Scalar audio math helpers (reference: optispeech/utils/model.py:74-191,
optispeech/utils/audio.py:15-38)."""

import jax.numpy as jnp
import numpy as np


def safe_log(x, clip_val: float = 1e-7):
    """log(clip(x, min=clip_val)) — reference utils/model.py:168."""
    return jnp.log(jnp.clip(x, min=float(clip_val)))


def dynamic_range_compression(x, C: float = 1.0, clip_val: float = 1e-5):
    """log-compression used on mel magnitudes (utils/audio.py:15)."""
    return jnp.log(jnp.clip(x, min=clip_val) * C)


def dynamic_range_decompression(x, C: float = 1.0):
    return jnp.exp(x) / C


def normalize(data, mu, std):
    """Broadcast (x - mu) / std; mu/std scalars or per-channel vectors
    (reference utils/model.py:74 broadcasts over the trailing time axis)."""
    mu = _as_col(mu, data)
    std = _as_col(std, data)
    return (data - mu) / std


def denormalize(data, mu, std):
    mu = _as_col(mu, data)
    std = _as_col(std, data)
    return data * std + mu


def _as_col(v, data):
    if isinstance(v, (float, int)):
        return v
    v = jnp.asarray(v) if not isinstance(v, (jnp.ndarray, np.ndarray)) else v
    # per-channel vector broadcasts over trailing time axis like the reference
    return jnp.asarray(v)[..., None]
