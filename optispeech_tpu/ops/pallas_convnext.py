"""Fused ConvNeXt-block Pallas kernel (inference hot path).

One ConvNeXt block is dwconv(k=7) -> LN -> Dense(C->I) -> GELU -> Dense(I->C)
-> layer-scale -> residual. XLA materializes the (T, I) intermediate in HBM
between the two matmuls; at the WaveNeXt trunk's I=1152 that is the dominant
HBM traffic of synthesis. This kernel keeps the whole block in VMEM: the tile
(plus neighbour tiles for the k=7 halo) streams in through the pallas
pipeline, the dwconv is 7 shifted multiply-adds on the VPU, both matmuls run
back-to-back on the MXU, and only the (T_tile, C) result returns to HBM.

Forward-only (inference); training uses the XLA path.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 3  # k=7 depthwise conv, symmetric


def pick_tile(t: int, candidates=(512, 256, 128, 64)) -> int | None:
    """Largest tile length dividing T (None = no legal tiling; caller falls
    back to the XLA path). Mel buckets are multiples of 128, so production
    shapes always tile."""
    for c in candidates:
        if t % c == 0 and t >= c:
            return c
    return None


def fused_supported() -> bool:
    """Mosaic (Pallas TPU) compiles only on TPU backends; the tunneled chip
    registers as platform 'axon' but is a TPU underneath."""
    import jax

    return jax.default_backend() in ("tpu", "axon")


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational approximation (|err| <= 1.5e-7 —
    below f32 resolution here); Pallas TPU does not lower lax.erf."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _block_kernel(t_tile, c, inter,
                  xc_ref, xp_ref, xn_ref, dw_ref, dwb_ref, lnw_ref, lnb_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref, gamma_ref, out_ref):
    i = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    xc = xc_ref[0].astype(jnp.float32)  # (t_tile, C)
    # halo rows from neighbour tiles; zeros at sequence boundaries
    left = xp_ref[0][t_tile - HALO :, :].astype(jnp.float32)
    left = jnp.where(i == 0, 0.0, left)
    right = xn_ref[0][:HALO, :].astype(jnp.float32)
    right = jnp.where(i == n_tiles - 1, 0.0, right)
    x = jnp.concatenate([left, xc, right], axis=0)  # (t_tile + 6, C)

    # depthwise conv as 7 shifted multiply-adds (VPU)
    acc = jnp.zeros((t_tile, c), jnp.float32)
    for k in range(7):
        acc = acc + x[k : k + t_tile, :] * dw_ref[k, :][None, :]
    acc = acc + dwb_ref[0, :][None, :]

    # layer norm over channels (f32)
    mean = jnp.mean(acc, axis=1, keepdims=True)
    centred = acc - mean
    var = jnp.mean(centred * centred, axis=1, keepdims=True)
    h = centred * jax.lax.rsqrt(var + 1e-6)
    h = h * lnw_ref[0, :][None, :] + lnb_ref[0, :][None, :]

    # pointwise MLP on the MXU, intermediate stays in VMEM
    h1 = jnp.dot(h.astype(jnp.bfloat16), w1_ref[:], preferred_element_type=jnp.float32)
    h1 = h1 + b1_ref[0, :][None, :]
    h1 = 0.5 * h1 * (1.0 + _erf(h1 * np.float32(1.0 / np.sqrt(2.0))))  # exact GELU
    h2 = jnp.dot(h1.astype(jnp.bfloat16), w2_ref[:], preferred_element_type=jnp.float32)
    h2 = h2 + b2_ref[0, :][None, :]

    out_ref[0] = (xc + gamma_ref[0, :][None, :] * h2).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("t_tile", "interpret"))
def convnext_block_fused(x, dw, dwb, lnw, lnb, w1, b1, w2, b2, gamma,
                         t_tile: int = 512, interpret: bool = False):
    """Apply one ConvNeXt block.

    Args:
        x: (B, T, C) input, T divisible by t_tile.
        dw: (7, C) depthwise kernel; dwb: (C,).
        lnw/lnb: (C,) layer norm scale/bias.
        w1: (C, I); b1: (I,); w2: (I, C); b2: (C,); gamma: (C,).

    Returns (B, T, C), same dtype as x.
    """
    b, t, c = x.shape
    inter = w1.shape[1]
    assert t % t_tile == 0, (t, t_tile)
    n_tiles = t // t_tile
    w1b = w1.astype(jnp.bfloat16)
    w2b = w2.astype(jnp.bfloat16)

    kernel = partial(_block_kernel, t_tile, c, inter)
    grid = (b, n_tiles)
    cur = lambda bi, ti: (bi, ti, 0)  # noqa: E731
    prv = lambda bi, ti: (bi, jnp.maximum(ti - 1, 0), 0)  # noqa: E731
    nxt = lambda bi, ti: (bi, jnp.minimum(ti + 1, n_tiles - 1), 0)  # noqa: E731
    const = lambda *_: (0, 0)  # noqa: E731  — weights resident across grid steps
    tile = lambda idx: pl.BlockSpec((1, t_tile, c), idx, memory_space=pltpu.VMEM)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            tile(cur), tile(prv), tile(nxt),
            pl.BlockSpec((7, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, inter), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, inter), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((inter, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile, c), cur, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, x, x, dw, dwb[None], lnw[None], lnb[None], w1b, b1[None], w2b, b2[None], gamma[None])
