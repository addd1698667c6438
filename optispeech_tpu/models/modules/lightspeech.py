"""LightSpeech separable-conv transformer backbone.

Capability parity with
/root/reference/optispeech/model/generator/modules/lightspeech_transformer.py
(+ EncSepConvLayer, layers.py:478-504). NAS-derived per-layer kernel sizes
([5,25,13,9] encoder / [17,21,9,13] decoder, configs/model/generator/
encoder/lightspeech_transformer.yaml). Layout is (B, T, C) throughout — the
reference shuttles through (T, B, C).
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .core import ScaledSinusoidalEmbedding


class EncSepConvLayer(nn.Module):
    """LN -> (mask) -> sepconv -> act -> dropout -> sepconv -> act -> dropout
    -> residual (reference layers.py:478-504)."""

    dim: int
    kernel_size: int
    dropout: float = 0.0
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask=None, deterministic: bool = True):
        from .core import ConvSeparable

        act = {"relu": nn.relu, "gelu": nn.gelu, "tanh": nn.tanh, "sigmoid": nn.sigmoid}[self.activation]
        residual = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="layer_norm")(x)
        if padding_mask is not None:
            x = x * (~padding_mask)[..., None].astype(x.dtype)
        x = ConvSeparable(self.dim, self.kernel_size, dropout=self.dropout,
                          dtype=self.dtype, name="conv1")(x)
        x = act(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = ConvSeparable(self.dim, self.kernel_size, dropout=self.dropout,
                          dtype=self.dtype, name="conv2")(x)
        x = act(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return residual + x


class LightSpeechTransformerEncoder(nn.Module):
    """(reference lightspeech_transformer.py:13-47)."""

    dim: int
    kernel_sizes: Sequence[int] = (5, 25, 13, 9)
    activation: str = "relu"
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask=None, deterministic: bool = True):
        for i, k in enumerate(self.kernel_sizes):
            x = EncSepConvLayer(self.dim, k, self.dropout, self.activation,
                                dtype=self.dtype, name=f"layer_{i}")(
                x, padding_mask, deterministic=deterministic
            )
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="layer_norm")(x)
        if padding_mask is not None:
            x = x * (~padding_mask)[..., None].astype(x.dtype)
        return x


class LightSpeechTransformerDecoder(nn.Module):
    """Adds scaled-sinusoidal positions before the conv stack
    (reference lightspeech_transformer.py:50-96)."""

    dim: int
    kernel_sizes: Sequence[int] = (17, 21, 9, 13)
    activation: str = "relu"
    dropout: float = 0.2
    max_source_positions: int = 2000
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask=None, deterministic: bool = True):
        positions = ScaledSinusoidalEmbedding(self.dim, theta=self.max_source_positions,
                                              name="pos_emb")(x.shape[1], dtype=x.dtype)
        x = x + positions[None]
        if padding_mask is not None:
            x = x * (~padding_mask)[..., None].astype(x.dtype)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        for i, k in enumerate(self.kernel_sizes):
            x = EncSepConvLayer(self.dim, k, self.dropout, self.activation,
                                dtype=self.dtype, name=f"layer_{i}")(
                x, padding_mask, deterministic=deterministic
            )
        # reference decoder uses a plain torch LayerNorm (eps 1e-5),
        # lightspeech_transformer.py:65
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(x)
