"""LeanSpeech backbone: parallel LSTM(tanh) + ConvGLU branches.

Capability parity with
/root/reference/optispeech/model/generator/modules/leanspeech.py. The LSTM is
a flax `nn.RNN(nn.OptimizedLSTMCell)` — a `lax.scan` under jit. Reference
checkpoints import via compat/torch_import.py (_lstm_cell maps the packed
torch gate matrices onto the per-gate flax Denses) and are parity-tested
end-to-end (tests/test_reference_parity.py).
"""

import flax.linen as nn
import jax.numpy as jnp

from .convnext import drop_path
from .core import ConvSeparable


class ConvGLU(nn.Module):
    """x + GLU(LN(sepconv(x))) (reference leanspeech.py:68-96)."""

    dim: int
    kernel_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = ConvSeparable(self.dim * 2, self.kernel_size, dtype=self.dtype, name="conv")(x)
        y = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="ln")(y)
        y = nn.glu(y, axis=-1)
        return x + y


class LeanSpeechBlock(nn.Module):
    dim: int
    kernel_size: int
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask=None, deterministic: bool = True):
        residual = x
        lstm = nn.RNN(nn.OptimizedLSTMCell(self.dim), name="lstm")
        lx = jnp.tanh(lstm(x))
        cx = ConvGLU(self.dim, self.kernel_size, dtype=self.dtype, name="conv")(x)
        if padding_mask is not None:
            cx = cx * (~padding_mask)[..., None].astype(cx.dtype)
        x = lx + cx
        # torch nn.LayerNorm default eps (reference leanspeech.py final_layer_norm)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_layer_norm")(x)
        if self.drop_path_rate > 0.0 and not deterministic:
            x = drop_path(self.make_rng("dropout"), x, self.drop_path_rate)
        return residual + x


class LeanSpeechBackbone(nn.Module):
    dim: int
    kernel_size: int = 9
    num_layers: int = 4
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask=None, deterministic: bool = True):
        if self.num_layers > 1:
            rates = [self.drop_path * i / (self.num_layers - 1) for i in range(self.num_layers)]
        else:
            rates = [0.0]
        for i, r in enumerate(rates):
            x = LeanSpeechBlock(self.dim, self.kernel_size, r, dtype=self.dtype,
                                name=f"layer_{i}")(x, padding_mask, deterministic=deterministic)
        return x
