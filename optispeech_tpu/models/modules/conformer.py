"""Conformer encoder backbone.

Capability parity with the reference's vendored ESPnet conformer
(/root/reference/optispeech/model/generator/modules/conformer.py +
_conformer/: macaron FFN, Transformer-XL-style relative-position
self-attention with pos_bias_u/v + rel-shift, conv module k=7 with GLU and
Swish, input xscale, per-block norm_final plus encoder-level after_norm).

One configurable deviation: the conv-module norm. The reference uses
BatchNorm1d (_conformer/convolution.py:44); cross-replica batch stats are an
anti-pattern under pjit, so training-from-scratch defaults to LayerNorm
(`conv_norm="layernorm"`). For faithful checkpoint import,
`conv_norm="affine"` applies the frozen-BatchNorm affine transform
(running stats folded into scale/bias by compat.torch_import).
"""

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .transformer import ConvFFN


def rel_positional_encoding(t: int, dim: int) -> np.ndarray:
    """Positions t-1 .. -(t-1), transformer-XL convention
    (reference _transformer/embedding.py:252-330 RelPositionalEncoding)."""
    pos = np.arange(t - 1, -t, -1, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float32) * -(np.log(10000.0) / dim))
    pe = np.zeros((2 * t - 1, dim), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def _rel_shift(x):
    """(B, H, T, 2T-1) -> (B, H, T, T) Transformer-XL relative shift:
    out[q, k] = x[q, T-1 - (q-k)] (reference _transformer/attention.py:249-270)."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))  # (B, H, T, 2T)
    x = x.reshape(b, h, 2 * t, t)
    x = x[:, :, 1:, :].reshape(b, h, t, 2 * t - 1)
    return x[:, :, :, :t]


class RelPosSelfAttention(nn.Module):
    """RelPositionMultiHeadedAttention (reference _transformer/attention.py:221-318)."""

    dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb, padding_mask=None, deterministic: bool = True):
        b, t, _ = x.shape
        h, d_k = self.num_heads, self.dim // self.num_heads
        q = nn.Dense(self.dim, dtype=self.dtype, name="linear_q")(x)
        k = nn.Dense(self.dim, dtype=self.dtype, name="linear_k")(x)
        v = nn.Dense(self.dim, dtype=self.dtype, name="linear_v")(x)
        q, k, v = (y.reshape(b, t, h, d_k) for y in (q, k, v))

        p = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="linear_pos")(pos_emb)
        p = p.reshape(2 * t - 1, h, d_k)

        u = self.param("pos_bias_u", nn.initializers.xavier_uniform(), (h, d_k))
        w = self.param("pos_bias_v", nn.initializers.xavier_uniform(), (h, d_k))

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
    (reference _conformer/convolution.py:12-80)."""

    dim: int
    kernel_size: int = 7
    norm_kind: str = "layernorm"  # "layernorm" | "affine" (folded BatchNorm)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(2 * self.dim, (1,), dtype=self.dtype, name="pointwise_conv1")(x)
        y = nn.glu(y, axis=-1)
        y = nn.Conv(self.dim, (self.kernel_size,), padding=(self.kernel_size - 1) // 2,
                    feature_group_count=self.dim, dtype=self.dtype, name="depthwise_conv")(y)
        if self.norm_kind == "layernorm":
            y = nn.LayerNorm(dtype=self.dtype, name="norm")(y)
        elif self.norm_kind == "affine":
            scale = self.param("norm_scale", nn.initializers.ones, (self.dim,))
            bias = self.param("norm_bias", nn.initializers.zeros, (self.dim,))
            y = y * scale.astype(y.dtype) + bias.astype(y.dtype)
        else:
            raise ValueError(f"unknown conv_norm {self.norm_kind}")
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
    conv_norm: str = "layernorm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask=None, deterministic: bool = True):
        t = x.shape[1]
        # RelPositionalEncoding scales the input by sqrt(dim) and emits the
        # (dropout'd) relative positions shared by every block
        # (reference _transformer/embedding.py:300-330)
        x = x * jnp.sqrt(jnp.asarray(self.dim, x.dtype))
        x = nn.Dropout(self.positional_dropout_rate)(x, deterministic=deterministic)
        pos_emb = jnp.asarray(rel_positional_encoding(t, self.dim), dtype=x.dtype)
        pos_emb = nn.Dropout(self.positional_dropout_rate)(pos_emb, deterministic=deterministic)
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
                                    name=f"self_attn_{i}")(y, pos_emb, padding_mask, deterministic)
            x = residual + drop(y)

            if self.use_cnn_module:
                # NOTE: no pad-zeroing before the conv — the reference applies
                # the conv module to the raw normed stream
                # (_conformer/encoder_layer.py:148-153)
                residual = x
                y = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name=f"norm_conv_{i}")(x)
                y = ConvModule(self.dim, self.cnn_module_kernel, norm_kind=self.conv_norm,
                               dtype=self.dtype, name=f"conv_module_{i}")(y)
                x = residual + drop(y)

            residual = x
            y = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name=f"norm_ff_{i}")(x)
            y = ConvFFN(self.dim, self.linear_units, 1, self.dropout_rate,
                        dtype=self.dtype, name=f"ff_{i}")(y, deterministic)
            scale = 0.5 if self.macaron_style else 1.0
            x = residual + scale * drop(y)
            if self.use_cnn_module:
                x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name=f"norm_final_{i}")(x)

        # encoder-level after_norm (reference _conformer/encoder.py:278-279);
        # padded positions are NOT zeroed (the wrapper returns the output
        # as-is, modules/conformer.py:25-28)
        return nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="after_norm")(x)
