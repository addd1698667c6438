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


# torch Conv2d reset_parameters: kaiming_uniform(a=sqrt(5)) == uniform with
# bound 1/sqrt(fan_in) == variance_scaling(1/3, fan_in, uniform). The
# reference wraps plain Conv2d in weight_norm (g initialised to ||v||), so
# the effective init kernel IS this kaiming sample — flax's lecun-normal
# default would start every channel ~sqrt(3) larger. (torch's uniform bias
# init is approximated by flax's zeros; |bias| <= 1/sqrt(fan_in) is small.)
_torch_conv_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def _wn_conv(features, kernel, strides, padding, name):
    return nn.WeightNorm(
        nn.Conv(features, kernel, strides=strides, padding=padding,
                kernel_init=_torch_conv_kernel_init),
        name=name,
    )


def torch_weight_norm_init(params):
    """Rescale flax WeightNorm scales to torch's init convention.

    torch weight_norm initializes g = ||v|| per output channel, so the
    effective kernel at init EQUALS the raw kaiming-uniform kernel v
    (reference _discriminators.py wraps every conv this way). flax
    nn.WeightNorm initializes the scale to ones — effective kernel v/||v||,
    i.e. every channel forced to unit norm — which rescales the initial
    discriminator logits and shifts the from-scratch GAN equilibrium.
    Call on freshly-initialized discriminator params (imported checkpoints
    carry their own g and are untouched by init)."""

    def fix(d):
        out = {k: (fix(v) if isinstance(v, dict) else v) for k, v in d.items()}
        for wn_name, wn_sub in out.items():
            if not isinstance(wn_sub, dict):
                continue
            for pname, scale in wn_sub.items():
                # flax WeightNorm scope layout: the scale is ONE param named
                # "<Layer>/kernel/scale" (literal slashes) under the wrapper's
                # scope, next to the wrapped layer's raw kernel at
                # <scope>/<Layer>/kernel
                if not (isinstance(pname, str) and pname.endswith("/kernel/scale")):
                    continue
                layer = pname[: -len("/kernel/scale")]
                sibling = out.get(layer)
                if isinstance(sibling, dict) and sibling.get("kernel") is not None:
                    v = sibling["kernel"]
                    axes = tuple(range(v.ndim - 1))  # all but out-channels
                    wn_sub[pname] = jnp.sqrt(
                        jnp.sum(jnp.square(v), axis=axes)
                    ).astype(scale.dtype)
        return out

    return fix(dict(params))


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
