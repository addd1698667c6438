"""1-D ConvNeXt backbone (the default encoder/decoder and the WaveNeXt trunk).

Capability parity with /root/reference/optispeech/model/generator/modules/convnext.py.
TPU-first choices: NWC layout throughout (XLA's native conv layout — the
reference transposes to NCW and back every block), bf16-friendly compute dtype
knob, and layer iteration via a plain Python loop (static unroll; 4-8 layers).
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

trunc_init = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


def drop_path(rng, x, drop_prob: float, scale_by_keep: bool = True):
    """Per-sample stochastic depth (reference convnext.py:106-129)."""
    keep = 1.0 - drop_prob
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    mask = mask.astype(x.dtype)
    if scale_by_keep and keep > 0.0:
        mask = mask / keep
    return x * mask


class ConvNeXtBlock(nn.Module):
    """dwconv(k=7) -> LN -> pw-linear x4 -> GELU -> pw-linear -> layer scale
    -> DropPath residual (reference convnext.py:8-47)."""

    dim: int
    intermediate_dim: int
    drop_path_rate: float = 0.0
    layer_scale_init_value: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, fused: bool = False):
        if fused and not self.is_initializing():
            # whole-block fused Pallas kernel (ops/pallas_convnext.py): the
            # (T, intermediate) MLP activation never leaves VMEM. Params were
            # created by the standard path at init; read them directly.
            from ...ops.pallas_convnext import (
                convnext_block_fused,
                fused_supported,
                pick_tile,
            )

            t_tile = pick_tile(x.shape[1], self.dim, self.intermediate_dim)
            p = self.variables["params"]
            if fused_supported() and t_tile is not None and "gamma" in p:
                return convnext_block_fused(
                    x,
                    p["dwconv"]["kernel"][:, 0, :], p["dwconv"]["bias"],
                    p["norm"]["scale"], p["norm"]["bias"],
                    p["pwconv1"]["kernel"], p["pwconv1"]["bias"],
                    p["pwconv2"]["kernel"], p["pwconv2"]["bias"],
                    p["gamma"].astype(jnp.float32),
                    t_tile=t_tile,
                )
        residual = x
        x = nn.Conv(
            self.dim, (7,), padding=3, feature_group_count=self.dim,
            kernel_init=trunc_init, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="dwconv",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.intermediate_dim, kernel_init=trunc_init,
                     bias_init=nn.initializers.zeros, dtype=self.dtype, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, kernel_init=trunc_init,
                     bias_init=nn.initializers.zeros, dtype=self.dtype, name="pwconv2")(x)
        if self.layer_scale_init_value is not None and self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma", nn.initializers.constant(self.layer_scale_init_value), (self.dim,)
            )
            x = gamma.astype(self.dtype) * x
        if self.drop_path_rate > 0.0 and not deterministic:
            x = drop_path(self.make_rng("dropout"), x, self.drop_path_rate)
        return residual + x


class ConvNeXtBackbone(nn.Module):
    """Stack of ConvNeXt blocks with inter-block padding masks and a final LN
    (reference convnext.py:50-103). Input/output (B, T, C)."""

    dim: int
    intermediate_dim: int = 1024
    num_layers: int = 4
    drop_path: float = 0.0
    layer_scale_init_value: Optional[float] = None
    # module-level fused default (e.g. the generator decoder, which is always
    # called without a per-call flag); OR'd with the call-time `fused` arg
    fused_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask=None, deterministic: bool = True,
                 fused: bool = False):
        """padding_mask: (B, T) bool, True on PAD positions (torch convention).
        `fused=True` routes each block through the whole-block Pallas kernel
        (inference only — it has no drop-path and assumes deterministic; the
        block itself falls back off-TPU or at non-tileable lengths)."""
        fused = (fused or self.fused_pallas) and deterministic
        lsiv = self.layer_scale_init_value or 1.0 / self.num_layers
        if self.num_layers > 1:
            rates = [self.drop_path * i / (self.num_layers - 1) for i in range(self.num_layers)]
        else:
            rates = [0.0]
        keep = None if padding_mask is None else (~padding_mask)[:, :, None].astype(x.dtype)
        for i, dpr in enumerate(rates):
            x = ConvNeXtBlock(
                dim=self.dim, intermediate_dim=self.intermediate_dim,
                drop_path_rate=dpr, layer_scale_init_value=lsiv,
                dtype=self.dtype, name=f"block_{i}",
            )(x, deterministic=deterministic, fused=fused)
            if keep is not None:
                x = x * keep
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="final_layer_norm")(x)
