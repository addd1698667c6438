"""WaveNeXt vocoder: ConvNeXt trunk + trainable linear waveform head.

Capability parity with /root/reference/optispeech/model/vocoder/wavenext/__init__.py:
conv-embed (k=7) -> LN -> ConvNeXt backbone (dim 384, intermediate 1152, 8
layers by default) -> Linear(dim -> n_fft+2) -> Linear(n_fft+2 -> hop, no bias)
-> reshape (B, T*hop) -> clip [-1, 1]. ISTFT-free head (WaveNeXt paper).

The two head matmuls are the inference FLOPs hot spot; they are plain Dense
layers so XLA fuses them onto the MXU with the trunk. The `f0` conditioning
argument is accepted and, by default, unused — matching the reference
(wavenext/__init__.py:82-86). With `f0_cond=True` the frame-level pitch
(normalized domain, as the training pipeline ships it) is embedded by a small
conv and added to the trunk input: the renderer then has a direct, learnable
F0 channel instead of having to recover pitch from the detached decoder
features (see VocoderConfig.f0_cond in config.py for the campaign evidence).
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..modules.convnext import ConvNeXtBackbone, trunc_init


class WaveNeXtHead(nn.Module):
    """(B, T, H) frame features -> (B, T*hop) waveform (reference :9-48)."""

    n_fft: int
    hop_length: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, _ = x.shape
        x = nn.Dense(self.n_fft + 2, kernel_init=trunc_init, dtype=self.dtype, name="linear_1")(x)
        x = nn.Dense(self.hop_length, use_bias=False, kernel_init=trunc_init,
                     dtype=self.dtype, name="linear_2")(x)
        audio = x.reshape(b, t * self.hop_length)
        return jnp.clip(audio, -1.0, 1.0)


class WaveNeXt(nn.Module):
    input_channels: int
    dim: int = 384
    intermediate_dim: int = 1152
    num_layers: int = 8
    n_fft: int = 1024
    hop_length: int = 256
    sample_rate: int = 24000
    drop_path: float = 0.1
    layer_scale_init_value: Optional[float] = None
    # inference: run each trunk block as one fused Pallas kernel so the
    # (T, intermediate_dim=1152) MLP activation stays in VMEM (VERDICT r1
    # item 4; A/B'd in bench.py detail). Training always uses the XLA path.
    fused_pallas: bool = False
    f0_cond: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, f0=None, padding_mask=None, deterministic: bool = True):
        """x: (B, T, input_channels) frame features -> (B, T*hop) waveform.

        f0: frame-level pitch, any of (B, T) / (B, 1, T) / (B, T, 1) —
        consumed only when `f0_cond` is on (required then)."""
        x = nn.Conv(self.dim, (7,), padding=3, dtype=self.dtype, name="embed")(x)
        if self.f0_cond:
            if f0 is None:
                raise ValueError("WaveNeXt(f0_cond=True) requires the f0 argument")
            f0 = jnp.reshape(f0, (x.shape[0], x.shape[1], 1)).astype(x.dtype)
            x = x + nn.Conv(self.dim, (3,), padding=1, dtype=self.dtype,
                            name="f0_embed")(f0)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        fused = self.fused_pallas and deterministic
        x = ConvNeXtBackbone(
            dim=self.dim, intermediate_dim=self.intermediate_dim,
            num_layers=self.num_layers, drop_path=self.drop_path,
            layer_scale_init_value=self.layer_scale_init_value,
            dtype=self.dtype, name="backbone",
        )(x, padding_mask, deterministic=deterministic, fused=fused)
        return WaveNeXtHead(self.n_fft, self.hop_length, dtype=self.dtype, name="head")(x)
