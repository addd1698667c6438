"""Monotonic alignment search as a Pallas TPU kernel (optional path).

The production MAS is the vmapped lax.scan in ops/mas.py (already fully
device-resident — the reference's numba/CPU sync is the thing being replaced).
This kernel is the SURVEY §7 step-3 "Pallas second" variant: one grid step per
batch item, the whole (T_feats, T_text) problem resident in VMEM, the forward
DP as a fori_loop over frames with a vectorized shift-max column update, and a
gather-free backtrace that accumulates durations and the binarization-loss sum
via one-hot reductions (dynamic scalar gathers are awkward on TPU vector
memory; one-hot multiply-reduce is VPU-friendly at T_text <= a few hundred).

Returns the same (durations, per-item bin-loss numerator) contract as the scan
version; numerically cross-checked against it in tests.

STATUS: COMPILES on Mosaic (and matches the scan exactly in both interpret
and compiled mode). Mosaic on jax 0.9.0 cannot lower dynamic SINGLE-sublane
accesses (`q_scr[pl.ds(j, 1), :]` at a traced frame index raises "Not
implemented: Sublane broadcast"), so the DP is tiled into 8-frame sublane
tiles: each fori_loop step loads/stores one (8, T_text) tile at a dynamic
8-aligned offset (which Mosaic lowers fine) and the 8 per-frame updates
inside the tile are statically unrolled. Requires T_feats % 8 == 0 (mel
buckets are multiples of 128). Production training MAS remains ops/mas.py's
lax.scan (its gather carries the bin-loss gradient); this kernel serves
extract-durations workloads.

Measured A/B on a v5e chip (T_text=384, T_mel=768, f32, jit, sync timing):
scan 4.04 ms vs pallas 4.57 ms at B=16; scan 10.94 ms vs pallas 27.25 ms at
B=128 (durations bit-identical). The sublane-tiling workaround (8-way static
unroll per tile) and the one-hot backtrace reductions cost more than the
XLA scan's fused shift-max — so the scan stays the production path by
measurement, not just by default.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG_NEG = -1e9
TILE = 8  # sublane tile height: frames per dynamic scratch access


def _mas_kernel(t_feats, t_text, tl_ref, fl_ref, lp_ref, ds_ref, binsum_ref, q_scr):
    bi = pl.program_id(0)
    tl = tl_ref[bi]  # scalar-prefetch arrays hold the whole batch in SMEM
    fl = fl_ref[bi]

    col = jax.lax.broadcasted_iota(jnp.int32, (1, t_text), 1)
    n_tiles = t_feats // TILE

    # ---- forward DP: Q[j] = max(Q[j-1], shift(Q[j-1])) + lp[j], 8-row tiles
    def fwd_tile(t, q):
        lp_tile = lp_ref[0, pl.ds(t * TILE, TILE), :]  # (TILE, T_text)
        rows = []
        for k in range(TILE):  # static unroll: all sublane indices constant
            q_shift = pltpu.roll(q, 1, 1)
            q_shift = jnp.where(col == 0, BIG_NEG, q_shift)
            q_new = jnp.maximum(q, q_shift) + lp_tile[k : k + 1, :]
            if k == 0:
                # frame 0 (tile 0 only): path starts at token 0
                q_init = jnp.where(col == 0, lp_tile[0:1, :], BIG_NEG)
                q_new = jnp.where(t == 0, q_init, q_new)
            rows.append(q_new)
            q = q_new
        q_scr[pl.ds(t * TILE, TILE), :] = jnp.concatenate(rows, axis=0)
        return q

    jax.lax.fori_loop(0, n_tiles, fwd_tile, jnp.full((1, t_text), BIG_NEG, jnp.float32))

    # ---- backtrace with one-hot state (gather-free), 8-row tiles -----------
    # a = current token index as a one-hot row; start at token tl-1 for the
    # last valid frame
    a0 = (col == tl - 1).astype(jnp.float32)
    ones_row = jnp.ones((1, t_text), jnp.float32)
    pin_onehot = (col == tl - 1).astype(jnp.float32)

    def bwd_frame(j, q_prev, lp_row, carry):
        """One backtrace step at frame j given Q[j-1] and lp[j]."""
        a, ds, binsum = carry
        # keep every predicate as a (1, t_text) f32 row: scalar->row sublane
        # broadcasts do not lower in Mosaic
        valid = (j < fl).astype(jnp.float32) * ones_row
        pin = (j == fl - 1).astype(jnp.float32) * ones_row
        # at the last valid frame the path is pinned to token tl-1
        a = valid * (pin * pin_onehot + (1.0 - pin) * a) + (1.0 - valid) * a

        # accumulate this frame's duration + per-token bin-loss contribution
        # (host sums the bin row over tokens afterwards)
        ds = ds + valid * a
        binsum = binsum + valid * a * lp_row

        # decide A[j-1] in {A[j]-1, A[j]} by comparing Q values at frame j-1
        # (reference alignments.py:195-207 with its Q[token, frame] layout)
        v_here = jnp.sum(a * q_prev, axis=1, keepdims=True)  # Q[j-1, A[j]]
        a_shift = pltpu.roll(a, t_text - 1, 1)  # one-hot of A[j]-1 (roll by -1)
        a_shift = jnp.where(col == t_text - 1, 0.0, a_shift)
        v_left = jnp.sum(a_shift * q_prev, axis=1, keepdims=True)  # Q[j-1, A[j]-1]
        at_zero = jnp.sum(a * (col == 0).astype(jnp.float32), axis=1, keepdims=True)
        take_left = (at_zero < 0.5).astype(jnp.float32) * (v_left >= v_here).astype(jnp.float32)
        a_next = take_left * a_shift + (1.0 - take_left) * a
        step_ok = valid * (j > 0).astype(jnp.float32)
        a = step_ok * a_next + (1.0 - step_ok) * a
        return a, ds, binsum

    def bwd_tile(i, carry):
        t = n_tiles - 1 - i
        q_tile = q_scr[pl.ds(t * TILE, TILE), :]
        lp_tile = lp_ref[0, pl.ds(t * TILE, TILE), :]
        # Q row for the frame just below this tile (tile 0: gated off by j>0)
        q_below = q_scr[pl.ds(jnp.maximum(t - 1, 0) * TILE, TILE), :][TILE - 1 : TILE, :]
        for k in reversed(range(TILE)):  # static unroll, frames high -> low
            q_prev = q_tile[k - 1 : k, :] if k > 0 else q_below
            carry = bwd_frame(t * TILE + k, q_prev, lp_tile[k : k + 1, :], carry)
        return carry

    ds0 = jnp.zeros((1, t_text), jnp.float32)
    _, ds, binsum = jax.lax.fori_loop(
        0, n_tiles, bwd_tile, (a0, ds0, jnp.zeros((1, t_text), jnp.float32))
    )
    ds_ref[0] = ds
    binsum_ref[0] = binsum


@partial(jax.jit, static_argnames=("interpret",))
def viterbi_decode_pallas(log_p_attn, text_lengths, feats_lengths, interpret: bool = False):
    """Same contract as ops.mas.viterbi_decode, computed by the Pallas kernel.

    Args: log_p_attn (B, T_feats, T_text); lengths (B,).
    Returns (durations (B, T_text) f32 [stop-gradient], bin_loss scalar).
    """
    b, t_feats, t_text = log_p_attn.shape
    if t_feats % TILE:  # pad to the 8-frame sublane tile (padded frames are
        # masked invalid below, so results are unchanged)
        pad = TILE - t_feats % TILE
        log_p_attn = jnp.pad(log_p_attn, ((0, 0), (0, pad), (0, 0)))
        t_feats += pad
    lp = log_p_attn.astype(jnp.float32)
    frame_valid = jnp.arange(t_feats)[None, :] < feats_lengths[:, None]
    token_valid = jnp.arange(t_text)[None, :] < text_lengths[:, None]
    lp_m = jnp.where(frame_valid[:, :, None] & token_valid[:, None, :], lp, BIG_NEG)
    lp_dp = jax.lax.stop_gradient(lp_m)

    kernel = partial(_mas_kernel, t_feats, t_text)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # text/feats lengths, whole batch in SMEM
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t_feats, t_text), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, t_text), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_text), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((t_feats, t_text), jnp.float32)],
    )
    ds, binsum = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, t_text), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, t_text), jnp.float32),
        ),
        interpret=interpret,
    )(text_lengths.astype(jnp.int32), feats_lengths.astype(jnp.int32), lp_dp)
    ds = ds[:, 0, :]
    binsum = jnp.sum(binsum[:, 0, :], axis=-1, keepdims=True)

    # differentiable bin-loss: recompute the gather against the LIVE tensor
    # would need the path; the kernel returns the summed log-prob instead, so
    # this variant is inference/extract-only — use ops.mas.viterbi_decode in
    # training (its gather carries the gradient). Matching value:
    fl = jnp.maximum(feats_lengths.astype(jnp.float32), 1.0)
    bin_loss = jnp.mean(-binsum[:, 0] / fl)
    return ds, bin_loss
