"""Multi-period and multi-resolution discriminators.

Capability parity with
/root/reference/optispeech/model/vocoder/wavenext/disc/_discriminators.py:
MPD (HiFi-GAN, periods 2/3/5/7/11, weight-norm conv2d stacks over
(frame, period) views) and MRD (UnivNet, rectangular-window STFT magnitude
conv2d stacks at three resolutions). Layout is NHWC (XLA-native); the
reference's NCHW tensors map as (B, H, W, C).
"""

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...ops.stft import stft_magnitude


def _wn_conv(features, kernel, strides, padding, name):
    return nn.WeightNorm(
        nn.Conv(features, kernel, strides=strides, padding=padding),
        name=name,
    )


class DiscriminatorP(nn.Module):
    """(reference _discriminators.py:41-97)."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    lrelu_slope: float = 0.1

    @nn.compact
    def __call__(self, x):
        """x: (B, T) -> (score (B, frames*period), fmaps)."""
        b, t = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
            t = t + n_pad
        x = x.reshape(b, t // self.period, self.period, 1)  # NHWC

        fmap = []
        pad = ((self.kernel_size // 2, self.kernel_size // 2), (0, 0))
        channels = [32, 128, 512, 1024]
        for i, ch in enumerate(channels):
            x = _wn_conv(ch, (self.kernel_size, 1), (self.stride, 1), pad, f"conv_{i}")(x)
            x = nn.leaky_relu(x, self.lrelu_slope)
            if i > 0:
                fmap.append(x)
        x = _wn_conv(1024, (self.kernel_size, 1), (1, 1), pad, "conv_4")(x)
        x = nn.leaky_relu(x, self.lrelu_slope)
        fmap.append(x)
        x = _wn_conv(1, (3, 1), (1, 1), ((1, 1), (0, 0)), "conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    """(reference _discriminators.py:10-38)."""

    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, y, y_hat):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for p in self.periods:
            d = DiscriminatorP(period=p, name=f"disc_p{p}")
            s_r, f_r = d(y)
            s_g, f_g = d(y_hat)
            y_d_rs.append(s_r)
            y_d_gs.append(s_g)
            fmap_rs.append(f_r)
            fmap_gs.append(f_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class DiscriminatorR(nn.Module):
    """(reference _discriminators.py:139-216). Rectangular-window STFT."""

    resolution: Tuple[int, int, int]  # (n_fft, hop, win_length)
    channels: int = 64
    lrelu_slope: float = 0.1

    @nn.compact
    def __call__(self, x):
        n_fft, hop, win = self.resolution
        mag = stft_magnitude(x, n_fft, hop, win, window="ones", center=True)
        # (B, frames, freq) -> NHWC (B, freq, frames, 1) matching torch (B,1,freq,frames)
        x = jnp.swapaxes(mag, 1, 2)[..., None]

        fmap = []
        specs = [
            ((7, 5), (2, 2), ((3, 3), (2, 2))),
            ((5, 3), (2, 1), ((2, 2), (1, 1))),
            ((5, 3), (2, 2), ((2, 2), (1, 1))),
            ((3, 3), (2, 1), ((1, 1), (1, 1))),
            ((3, 3), (2, 2), ((1, 1), (1, 1))),
        ]
        for i, (k, s, p) in enumerate(specs):
            x = _wn_conv(self.channels, k, s, p, f"conv_{i}")(x)
            x = nn.leaky_relu(x, self.lrelu_slope)
            fmap.append(x)
        x = _wn_conv(1, (3, 3), (1, 1), ((1, 1), (1, 1)), "conv_post")(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


class MultiResolutionDiscriminator(nn.Module):
    """(reference _discriminators.py:100-136)."""

    resolutions: Tuple[Tuple[int, int, int], ...] = (
        (1024, 256, 1024), (2048, 512, 2048), (512, 128, 512),
    )
    channels: int = 64

    @nn.compact
    def __call__(self, y, y_hat):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for r in self.resolutions:
            d = DiscriminatorR(resolution=r, channels=self.channels, name=f"disc_r{r[0]}")
            s_r, f_r = d(y)
            s_g, f_g = d(y_hat)
            y_d_rs.append(s_r)
            y_d_gs.append(s_g)
            fmap_rs.append(f_r)
            fmap_gs.append(f_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
