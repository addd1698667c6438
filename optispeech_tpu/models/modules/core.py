"""Text embedding and variance (duration/pitch/energy) predictors.

Capability parity with /root/reference/optispeech/model/generator/modules/core.py.
All modules take/return (B, T, C) and a (B, T) bool padding mask (True = PAD).
"""

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .convnext import trunc_init

DEFAULT_MAX_SOURCE_POSITIONS = 2000


class ScaledSinusoidalEmbedding(nn.Module):
    """Sinusoidal positions with a learnable scalar scale
    (reference modules/layers.py:48-70)."""

    dim: int
    theta: float = 10000.0

    @nn.compact
    def __call__(self, seq_len: int, dtype=jnp.float32):
        scale = self.param("scale", nn.initializers.constant(self.dim**-0.5), (1,))
        half = self.dim // 2
        freq_seq = jnp.arange(half, dtype=jnp.float32) / half
        inv_freq = self.theta**-freq_seq
        pos = jnp.arange(seq_len, dtype=jnp.float32)
        emb = pos[:, None] * inv_freq[None, :]
        emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
        return (emb * scale).astype(dtype)


class TextEmbedding(nn.Module):
    """sqrt(dim)-scaled token embedding + scaled sinusoidal positions + dropout
    (reference modules/core.py:10-31). padding_idx embeddings are zeroed."""

    dim: int
    n_vocab: int = 250
    dropout: float = 0.0
    padding_idx: int = 0
    max_source_positions: int = DEFAULT_MAX_SOURCE_POSITIONS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src_tokens, deterministic: bool = True):
        embed_scale = math.sqrt(self.dim)
        table = nn.Embed(
            self.n_vocab, self.dim, dtype=self.dtype,
            embedding_init=nn.initializers.normal(stddev=self.dim**-0.5),
            name="embed_tokens",
        )
        emb = table(src_tokens)
        # torch nn.Embedding(padding_idx=0) pins the pad row to zero
        emb = emb * (src_tokens != self.padding_idx)[..., None].astype(emb.dtype)
        embed = embed_scale * emb
        positions = ScaledSinusoidalEmbedding(self.dim, theta=self.max_source_positions, name="embed_positions")(
            src_tokens.shape[1], dtype=embed.dtype
        )
        x = embed + positions[None, :, :]
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x, embed


class ConvSeparable(nn.Module):
    """Depthwise + pointwise 1-D conv (reference modules/layers.py:455-476),
    used by the `light` model variant's predictors."""

    channels: int
    kernel_size: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        std = math.sqrt((4 * (1.0 - self.dropout)) / (self.kernel_size * self.channels))
        init = nn.initializers.normal(stddev=std)
        x = nn.Conv(
            in_ch, (self.kernel_size,), padding=(self.kernel_size - 1) // 2,
            feature_group_count=in_ch, use_bias=False, kernel_init=init,
            dtype=self.dtype, name="depthwise",
        )(x)
        x = nn.Conv(self.channels, (1,), kernel_init=init,
                    bias_init=nn.initializers.zeros, dtype=self.dtype, name="pointwise")(x)
        return x


class VariancePredictor(nn.Module):
    """FastSpeech2 variance predictor: [conv -> ReLU -> LN -> dropout] x N ->
    linear -> (B, T) (reference modules/core.py:34-97)."""

    dim: int
    num_layers: int = 2
    intermediate_dim: int = 384
    kernel_size: int = 3
    dropout: float = 0.1
    separable: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask, deterministic: bool = True):
        for i in range(self.num_layers):
            if self.separable:
                x = ConvSeparable(self.intermediate_dim, self.kernel_size,
                                  dropout=self.dropout, dtype=self.dtype, name=f"conv_{i}")(x)
            else:
                x = nn.Conv(self.intermediate_dim, (self.kernel_size,),
                            padding=(self.kernel_size - 1) // 2, dtype=self.dtype,
                            name=f"conv_{i}")(x)
            x = nn.relu(x)
            x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name=f"ln_{i}")(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(1, dtype=self.dtype, name="linear")(x)[..., 0]
        return jnp.where(padding_mask, 0.0, x)


class DurationPredictor(nn.Module):
    """Predicts log-durations in training; `infer` maps to linear-domain integer
    durations with a speed factor (reference modules/core.py:100-133)."""

    dim: int
    num_layers: int = 2
    intermediate_dim: int = 384
    kernel_size: int = 3
    dropout: float = 0.1
    separable: bool = False
    clip_val: float = 1e-8
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.predictor = VariancePredictor(
            dim=self.dim, num_layers=self.num_layers, intermediate_dim=self.intermediate_dim,
            kernel_size=self.kernel_size, dropout=self.dropout, separable=self.separable,
            dtype=self.dtype,
        )

    def __call__(self, x, padding_mask, deterministic: bool = True):
        return self.predictor(x, padding_mask, deterministic=deterministic)

    def infer(self, x, padding_mask, factor: float = 1.0):
        log_durations = self.predictor(x, padding_mask, deterministic=True)
        durations = jnp.exp(log_durations) - self.clip_val
        durations = jnp.ceil(durations * factor)
        durations = jnp.maximum(durations, 0.0)
        return jnp.where(padding_mask, 0.0, durations).astype(jnp.int32)


class PitchPredictor(nn.Module):
    """Variance predictor + value-embedding conv added back into the hidden
    stream; teacher-forced in training (reference modules/core.py:136-176)."""

    dim: int
    num_layers: int = 5
    intermediate_dim: int = 256
    kernel_size: int = 5
    dropout: float = 0.5
    embed_kernel_size: int = 9
    embed_dropout: float = 0.2
    separable: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.predictor = VariancePredictor(
            dim=self.dim, num_layers=self.num_layers, intermediate_dim=self.intermediate_dim,
            kernel_size=self.kernel_size, dropout=self.dropout, separable=self.separable,
            dtype=self.dtype,
        )
        # the reference builds the embed conv from the same conv_layer_class as
        # the predictor stack (modules/core.py:142-151), so the lite variant's
        # embed is separable too
        if self.separable:
            self.embed = ConvSeparable(
                self.dim, self.embed_kernel_size, dtype=self.dtype, name="embed"
            )
        else:
            self.embed = nn.Conv(
                self.dim, (self.embed_kernel_size,), padding=(self.embed_kernel_size - 1) // 2,
                dtype=self.dtype, name="embed",
            )
        self.embed_drop = nn.Dropout(self.embed_dropout)

    def _add_embedding(self, x, values, padding_mask, deterministic):
        emb = self.embed(values[..., None])
        emb = self.embed_drop(emb, deterministic=deterministic)
        x = x + emb
        return x * (~padding_mask)[..., None].astype(x.dtype)

    def __call__(self, x, padding_mask, target, deterministic: bool = True):
        preds = self.predictor(x, padding_mask, deterministic=deterministic)
        x = self._add_embedding(x, target.astype(x.dtype), padding_mask, deterministic)
        return x, preds

    def infer(self, x, padding_mask, factor: float = 1.0):
        preds = self.predictor(x, padding_mask, deterministic=True)
        preds = preds * factor
        x = self._add_embedding(x, preds, padding_mask, True)
        return x, preds


class EnergyPredictor(PitchPredictor):
    """Identical structure (reference modules/core.py:179)."""
