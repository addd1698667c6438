"""Conformer encoder backbone.

Capability parity with the reference's vendored ESPnet conformer
(/root/reference/optispeech/model/generator/modules/conformer.py +
_conformer/: macaron FFN, Transformer-XL-style relative-position
self-attention with pos_bias_u/v + rel-shift, conv module k=7 with GLU and
Swish). Re-implemented in flax; one documented deviation: the conv-module norm
is LayerNorm instead of BatchNorm1d (batch-size independent, jit/shard
friendly — BatchNorm's cross-replica running stats are an anti-pattern under
pjit). Defaults mirror configs/model/generator/encoder/conformer.yaml.
"""

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .transformer import ConvFFN, sinusoidal_encoding


def rel_positional_encoding(t: int, dim: int) -> np.ndarray:
    """Positions t-1 .. -(t-1), transformer-XL convention
    (reference _transformer/embedding.py rel-pos variant)."""
    pos = np.arange(t - 1, -t, -1, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float32) * -(np.log(10000.0) / dim))
    pe = np.zeros((2 * t - 1, dim), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def _rel_shift(x):
    """(B, H, T, 2T-1) -> (B, H, T, T) Transformer-XL relative shift:
    out[q, k] = x[q, T-1 - (q-k)] (reference _transformer attention rel_shift)."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))  # (B, H, T, 2T)
    x = x.reshape(b, h, 2 * t, t)
    x = x[:, :, 1:, :].reshape(b, h, t, 2 * t - 1)
    return x[:, :, :, :t]


class RelPosSelfAttention(nn.Module):
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
        q, k, v = (y.reshape(b, t, h, d_k) for y in (q, k, v))

        pe = jnp.asarray(rel_positional_encoding(t, self.dim), dtype=x.dtype)
        p = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="linear_pos")(pe)
        p = p.reshape(2 * t - 1, h, d_k)

        u = self.param("pos_bias_u", nn.initializers.zeros, (h, d_k))
        w = self.param("pos_bias_v", nn.initializers.zeros, (h, d_k))

        q_u = (q + u.astype(x.dtype)).transpose(0, 2, 1, 3)  # (B,H,T,d)
        q_v = (q + w.astype(x.dtype)).transpose(0, 2, 1, 3)
        k_t = k.transpose(0, 2, 1, 3)
        ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k_t)
        bd = jnp.einsum("bhqd,phd->bhqp", q_v, p)  # (B,H,T,2T-1)
        bd = _rel_shift(bd)
        scores = (ac + bd) / jnp.sqrt(d_k).astype(x.dtype)
        if padding_mask is not None:
            scores = jnp.where(padding_mask[:, None, None, :], -1e9, scores)
        attn = nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v.transpose(0, 2, 1, 3))
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="linear_out")(out)


class ConvModule(nn.Module):
    """pointwise x2 -> GLU -> depthwise k -> norm -> swish -> pointwise
    (reference _conformer/convolution.py:12)."""

    dim: int
    kernel_size: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(2 * self.dim, (1,), dtype=self.dtype, name="pointwise_conv1")(x)
        y = nn.glu(y, axis=-1)
        y = nn.Conv(self.dim, (self.kernel_size,), padding=(self.kernel_size - 1) // 2,
                    feature_group_count=self.dim, dtype=self.dtype, name="depthwise_conv")(y)
        y = nn.LayerNorm(dtype=self.dtype, name="norm")(y)
        y = nn.swish(y)
        return nn.Conv(self.dim, (1,), dtype=self.dtype, name="pointwise_conv2")(y)


class ConformerBackbone(nn.Module):
    dim: int
    attention_heads: int = 2
    linear_units: int = 1024
    num_blocks: int = 4
    dropout_rate: float = 0.2
    positional_dropout_rate: float = 0.2
    attention_dropout_rate: float = 0.2
    macaron_style: bool = True
    use_cnn_module: bool = True
    cnn_module_kernel: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask=None, deterministic: bool = True):
        x = nn.Dropout(self.positional_dropout_rate)(x, deterministic=deterministic)
        drop = lambda y: nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)  # noqa: E731

        for i in range(self.num_blocks):
            if self.macaron_style:
                residual = x
                y = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name=f"norm_ff_macaron_{i}")(x)
                y = ConvFFN(self.dim, self.linear_units, 1, self.dropout_rate,
                            dtype=self.dtype, name=f"ff_macaron_{i}")(y, deterministic)
                x = residual + 0.5 * drop(y)

            residual = x
            y = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name=f"norm_mha_{i}")(x)
            y = RelPosSelfAttention(self.dim, self.attention_heads,
                                    self.attention_dropout_rate, dtype=self.dtype,
                                    name=f"self_attn_{i}")(y, padding_mask, deterministic)
            x = residual + drop(y)

            if self.use_cnn_module:
                residual = x
                y = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name=f"norm_conv_{i}")(x)
                if padding_mask is not None:
                    y = y * (~padding_mask)[..., None].astype(y.dtype)
                y = ConvModule(self.dim, self.cnn_module_kernel, dtype=self.dtype,
                               name=f"conv_module_{i}")(y)
                x = residual + drop(y)

            residual = x
            y = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name=f"norm_ff_{i}")(x)
            y = ConvFFN(self.dim, self.linear_units, 1, self.dropout_rate,
                        dtype=self.dtype, name=f"ff_{i}")(y, deterministic)
            scale = 0.5 if self.macaron_style else 1.0
            x = residual + scale * drop(y)
            x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name=f"norm_final_{i}")(x)

        if padding_mask is not None:
            x = x * (~padding_mask)[..., None].astype(x.dtype)
        return x
