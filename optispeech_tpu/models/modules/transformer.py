"""FastSpeech2-style Transformer encoder backbone.

Capability parity with the reference's vendored ESPnet transformer
(/root/reference/optispeech/model/generator/modules/transformer.py +
_transformer/: pre-norm MHA blocks, positionwise conv1d FFN, scaled sinusoidal
positional encoding with learnable alpha), re-implemented directly in flax
rather than porting the 2.4k-line vendor tree. Defaults mirror
configs/model/generator/encoder/transformer.yaml (dim 256, 2 heads, 1024
linear units, 4 blocks, conv1d FFN kernel 1).
"""

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def sinusoidal_encoding(length: int, dim: int) -> np.ndarray:
    """Standard transformer PE (reference _transformer/embedding.py:34)."""
    pos = np.arange(length, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float32) * -(np.log(10000.0) / dim))
    pe = np.zeros((length, dim), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


class MultiHeadSelfAttention(nn.Module):
    dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask=None, deterministic: bool = True):
        b, t, _ = x.shape
        h, d_k = self.num_heads, self.dim // self.num_heads
        q = nn.Dense(self.dim, dtype=self.dtype, name="linear_q")(x)
        k = nn.Dense(self.dim, dtype=self.dtype, name="linear_k")(x)
        v = nn.Dense(self.dim, dtype=self.dtype, name="linear_v")(x)
        q, k, v = (y.reshape(b, t, h, d_k).transpose(0, 2, 1, 3) for y in (q, k, v))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(d_k).astype(x.dtype)
        if padding_mask is not None:
            scores = jnp.where(padding_mask[:, None, None, :], -1e9, scores)
        attn = nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v).transpose(0, 2, 1, 3).reshape(b, t, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="linear_out")(out)


class ConvFFN(nn.Module):
    """Positionwise conv1d FFN (reference _transformer/multi_layer_conv.py:11)."""

    dim: int
    linear_units: int
    kernel_size: int = 1
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Conv(self.linear_units, (self.kernel_size,),
                    padding=(self.kernel_size - 1) // 2, dtype=self.dtype, name="w_1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Conv(self.dim, (self.kernel_size,),
                       padding=(self.kernel_size - 1) // 2, dtype=self.dtype, name="w_2")(x)


class TransformerBackbone(nn.Module):
    dim: int
    attention_heads: int = 2
    linear_units: int = 1024
    num_blocks: int = 4
    dropout_rate: float = 0.2
    positional_dropout_rate: float = 0.2
    attention_dropout_rate: float = 0.2
    normalize_before: bool = True
    positionwise_conv_kernel_size: int = 1
    use_scaled_pos_enc: bool = True
    init_alpha: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask=None, deterministic: bool = True):
        t = x.shape[1]
        pe = jnp.asarray(sinusoidal_encoding(t, self.dim), dtype=x.dtype)
        if self.use_scaled_pos_enc:
            alpha = self.param("pos_alpha", nn.initializers.constant(self.init_alpha), (1,))
            x = x + alpha.astype(x.dtype) * pe[None]
        else:
            x = x * jnp.sqrt(jnp.asarray(self.dim, x.dtype)) + pe[None]
        x = nn.Dropout(self.positional_dropout_rate)(x, deterministic=deterministic)

        for i in range(self.num_blocks):
            # self-attention sublayer (pre-norm)
            residual = x
            y = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name=f"norm1_{i}")(x) if self.normalize_before else x
            y = MultiHeadSelfAttention(self.dim, self.attention_heads,
                                       self.attention_dropout_rate, dtype=self.dtype,
                                       name=f"self_attn_{i}")(y, padding_mask, deterministic)
            y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
            x = residual + y
            if not self.normalize_before:
                x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name=f"norm1_{i}")(x)
            # FFN sublayer
            residual = x
            y = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name=f"norm2_{i}")(x) if self.normalize_before else x
            y = ConvFFN(self.dim, self.linear_units, self.positionwise_conv_kernel_size,
                        self.dropout_rate, dtype=self.dtype, name=f"ffn_{i}")(y, deterministic)
            y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
            x = residual + y
            if not self.normalize_before:
                x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name=f"norm2_{i}")(x)

        if self.normalize_before:
            x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="after_norm")(x)
        # NOTE: no trailing pad-zeroing — the reference wrapper
        # (modules/transformer.py:24-27) returns the encoder output as-is, and
        # the variance predictors' convs see those pad values at boundary
        # windows, so zeroing here would break checkpoint parity.
        return x
