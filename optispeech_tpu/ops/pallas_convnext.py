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


def pick_tile(t: int, c: int = 384, inter: int = 1152,
              candidates=(896, 768, 640, 512, 448, 384, 256, 128, 64)) -> int | None:
    """Largest tile length dividing T that fits VMEM (None = no legal tiling;
    caller falls back to the XLA path). Mel buckets are multiples of 128, so
    production shapes always tile. Bigger tiles win measurably — fewer halo
    rows recomputed, fewer grid steps, taller MXU operands: the 8-block
    WaveNeXt trunk at T=1792 runs 7.84 ms with 256-tiles and 7.30 ms with
    896-tiles (scripts/int8_ab.py --t-tile, device time, 2026-08-18). The
    VMEM bound keeps the (tile, inter) f32 intermediate + pipelined input
    tiles + weights inside ~12 MB for non-flagship channel widths."""
    for cand in candidates:
        if t % cand == 0 and t >= cand:
            vmem = cand * (3 * c + inter) * 4 + 4 * c * inter
            if vmem <= 12 * 1024 * 1024:
                return cand
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
    xc, h = _dwconv_ln(t_tile, c, i, n_tiles, xc_ref, xp_ref, xn_ref,
                       dw_ref, dwb_ref, lnw_ref, lnb_ref)

    # pointwise MLP on the MXU, intermediate stays in VMEM
    h1 = jnp.dot(h.astype(jnp.bfloat16), w1_ref[:], preferred_element_type=jnp.float32)
    h1 = h1 + b1_ref[0, :][None, :]
    h1 = 0.5 * h1 * (1.0 + _erf(h1 * np.float32(1.0 / np.sqrt(2.0))))  # exact GELU
    h2 = jnp.dot(h1.astype(jnp.bfloat16), w2_ref[:], preferred_element_type=jnp.float32)
    h2 = h2 + b2_ref[0, :][None, :]

    out_ref[0] = (xc + gamma_ref[0, :][None, :] * h2).astype(out_ref.dtype)


def _dwconv_ln(t_tile, c, i, n_tiles, xc_ref, xp_ref, xn_ref,
               dw_ref, dwb_ref, lnw_ref, lnb_ref):
    """Shared front half of the fused block: halo gather + depthwise conv
    (7 shifted multiply-adds on the VPU) + channel LayerNorm, all f32."""
    xc = xc_ref[0].astype(jnp.float32)  # (t_tile, C)
    left = xp_ref[0][t_tile - HALO :, :].astype(jnp.float32)
    left = jnp.where(i == 0, 0.0, left)
    right = xn_ref[0][:HALO, :].astype(jnp.float32)
    right = jnp.where(i == n_tiles - 1, 0.0, right)
    x = jnp.concatenate([left, xc, right], axis=0)  # (t_tile + 6, C)

    acc = jnp.zeros((t_tile, c), jnp.float32)
    for k in range(7):
        acc = acc + x[k : k + t_tile, :] * dw_ref[k, :][None, :]
    acc = acc + dwb_ref[0, :][None, :]

    mean = jnp.mean(acc, axis=1, keepdims=True)
    centred = acc - mean
    var = jnp.mean(centred * centred, axis=1, keepdims=True)
    h = centred * jax.lax.rsqrt(var + 1e-6)
    return xc, h * lnw_ref[0, :][None, :] + lnb_ref[0, :][None, :]


def _quant_rows(h):
    """Dynamic per-row (per-frame) symmetric int8 quantization: returns
    (int8 values, f32 per-row scale) with h ~= q * scale."""
    amax = jnp.maximum(jnp.max(jnp.abs(h), axis=1, keepdims=True), 1e-12)
    q = jnp.round(h * (127.0 / amax)).astype(jnp.int8)
    return q, amax * np.float32(1.0 / 127.0)


def _block_kernel_int8(t_tile, c, inter,
                       xc_ref, xp_ref, xn_ref, dw_ref, dwb_ref, lnw_ref, lnb_ref,
                       w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                       gamma_ref, out_ref):
    """Int8 variant: both pointwise matmuls run int8 x int8 -> int32 on the
    MXU (2x the bf16 MACs/cycle on v5e). Activations are dynamically
    quantized per frame; weights arrive pre-quantized with per-output-channel
    scales. dwconv/LN/GELU stay f32 on the VPU."""
    i = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    xc, h = _dwconv_ln(t_tile, c, i, n_tiles, xc_ref, xp_ref, xn_ref,
                       dw_ref, dwb_ref, lnw_ref, lnb_ref)

    hq, hs = _quant_rows(h)
    acc1 = jax.lax.dot_general(
        hq, w1_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    h1 = acc1.astype(jnp.float32) * hs * s1_ref[0, :][None, :] + b1_ref[0, :][None, :]
    h1 = 0.5 * h1 * (1.0 + _erf(h1 * np.float32(1.0 / np.sqrt(2.0))))  # exact GELU

    h1q, h1s = _quant_rows(h1)
    acc2 = jax.lax.dot_general(
        h1q, w2_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    h2 = acc2.astype(jnp.float32) * h1s * s2_ref[0, :][None, :] + b2_ref[0, :][None, :]

    out_ref[0] = (xc + gamma_ref[0, :][None, :] * h2).astype(out_ref.dtype)


def quantize_weight_int8(w):
    """Per-output-channel symmetric int8 quantization of a (in, out) matmul
    weight: returns (int8 weight, (out,) f32 scale) with w ~= q * scale."""
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-12) * (1.0 / 127.0)
    return jnp.round(w / s[None, :]).astype(jnp.int8), s.astype(jnp.float32)


@partial(jax.jit, static_argnames=("t_tile", "interpret"))
def convnext_block_fused_int8(x, dw, dwb, lnw, lnb, w1, b1, w2, b2, gamma,
                              t_tile: int = 512, interpret: bool = False):
    """Int8-quantized fused ConvNeXt block (serving path).

    Same contract as `convnext_block_fused`; the two pointwise matmuls run
    int8 on the MXU with dynamic per-frame activation scales and per-channel
    weight scales. Weights are quantized in-graph (O(C*I) elementwise — noise
    next to the matmuls; XLA CSEs it across calls with the same params)."""
    b, t, c = x.shape
    inter = w1.shape[1]
    assert t % t_tile == 0, (t, t_tile)
    n_tiles = t // t_tile
    w1q, s1 = quantize_weight_int8(w1)
    w2q, s2 = quantize_weight_int8(w2)

    kernel = partial(_block_kernel_int8, t_tile, c, inter)
    grid = (b, n_tiles)
    cur = lambda bi, ti: (bi, ti, 0)  # noqa: E731
    prv = lambda bi, ti: (bi, jnp.maximum(ti - 1, 0), 0)  # noqa: E731
    nxt = lambda bi, ti: (bi, jnp.minimum(ti + 1, n_tiles - 1), 0)  # noqa: E731
    const = lambda *_: (0, 0)  # noqa: E731
    tile = lambda idx: pl.BlockSpec((1, t_tile, c), idx, memory_space=pltpu.VMEM)  # noqa: E731
    vec = lambda n: pl.BlockSpec((1, n), const, memory_space=pltpu.VMEM)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            tile(cur), tile(prv), tile(nxt),
            pl.BlockSpec((7, c), const, memory_space=pltpu.VMEM),
            vec(c), vec(c), vec(c),
            pl.BlockSpec((c, inter), const, memory_space=pltpu.VMEM),
            vec(inter), vec(inter),
            pl.BlockSpec((inter, c), const, memory_space=pltpu.VMEM),
            vec(c), vec(c), vec(c),
        ],
        out_specs=pl.BlockSpec((1, t_tile, c), cur, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, x, x, dw, dwb[None], lnw[None], lnb[None],
      w1q, s1[None], b1[None], w2q, s2[None], b2[None], gamma[None])


def convnext_block_int8_oracle(x, dw, dwb, lnw, lnb, w1, b1, w2, b2, gamma):
    """Pure-jnp oracle of the exact int8 math the kernel performs (same
    quantizers, f32 elsewhere) — for equality tests against the kernel."""
    xf = x.astype(jnp.float32)
    pad = jnp.pad(xf, ((0, 0), (HALO, HALO), (0, 0)))
    acc = sum(pad[:, k : k + x.shape[1], :] * dw[k][None, None, :] for k in range(7))
    acc = acc + dwb[None, None, :]
    mean = acc.mean(axis=-1, keepdims=True)
    var = ((acc - mean) ** 2).mean(axis=-1, keepdims=True)
    h = (acc - mean) * jax.lax.rsqrt(var + 1e-6) * lnw + lnb

    def qmat(h, w, b):
        # bit-identical quantizer expressions to the kernel's (_quant_rows /
        # quantize_weight_int8) — a/b vs a*(1/b) round ties differently
        wq, ws = quantize_weight_int8(w)
        amax = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True), 1e-12)
        hq = jnp.round(h * (127.0 / amax)).astype(jnp.int8)
        hs = amax * np.float32(1.0 / 127.0)
        y = jax.lax.dot_general(
            hq, wq, (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return y.astype(jnp.float32) * hs * ws[None, None, :] + b

    h1 = qmat(h, w1, b1)
    h1 = 0.5 * h1 * (1.0 + _erf(h1 * np.float32(1.0 / np.sqrt(2.0))))  # as kernel
    h2 = qmat(h1, w2, b2)
    return (xf + gamma[None, None, :] * h2).astype(x.dtype)


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
