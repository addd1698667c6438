"""Monotonic alignment search: batch-on-lanes Pallas kernel (round 3).

Second-generation MAS kernel (the round-2 kernel in ops/pallas_mas.py lost
its A/B against the lax.scan — VERDICT r2 weak 4 asked for a formulation
that wins or retirement). The scan's cost at large batch is sequential-step
overhead: 768 tiny (B, T_text) updates for the forward pass plus a second
768-step backtrace scan with per-step dynamic gathers.

This kernel restructures the problem around the TPU's vector layout:

- **Batch on lanes, text on sublanes.** The DP state q is a single
  (T_text, 128) tile; one frame update is `roll(q) -> max -> add` on the
  VPU with all 128 batch items in flight — the layout the scan's vmap can
  only approximate through XLA's generic batching.
- **Whole DP in ONE kernel launch** (grid = lane-slabs of the batch): the
  768-frame forward loop and the backtrace both live inside the kernel, so
  there is no per-step XLA dispatch/stacking overhead at all.
- **Decision streaming instead of Q storage.** The forward pass emits one
  int8 take-left bit per (frame, token, item) — `dec[j][i] =
  (Q[j-1][i-1] >= Q[j-1][i])` — double-buffer-DMA'd to HBM (37 MB at the
  flagship shape vs 150 MB of f32 Q), and the backtrace re-streams it
  backwards. The backtrace keeps the current alignment as a ONE-HOT column
  (T_text, 128): "A[j-1] = A[j] - dec[j][A[j]]" becomes a multiply-reduce
  over sublanes plus a per-lane select between the one-hot and its rolled
  copy — no gathers anywhere.
- **Durations accumulate in-kernel** (ds += a_onehot on valid frames); the
  binarization-loss gather happens OUTSIDE against the live tensor (path
  reconstructed from durations via searchsorted), so — unlike the round-2
  kernel — this path is fully differentiable and could serve training.

Matches ops.mas.viterbi_decode bit-for-bit (same >= tie-breaking, same
frame pinning semantics; tested). Reference behaviour being replaced:
numba CPU DP at /root/reference/optispeech/model/generator/alignments.py:177-239.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG_NEG = -1e9
CF = 8     # frames per DMA chunk
LANES = 128


def _wf_kernel(t_feats, t_text, tl_ref, fl_ref, lp_any, ds_ref, dec_any,
               lp_buf, dec_buf, in_sem, out_sem):
    g = pl.program_id(0)
    n_chunks = t_feats // CF
    tl = tl_ref[0]  # (1, LANES) int32
    fl = fl_ref[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (t_text, LANES), 0)
    tl_onehot = (row == tl - 1).astype(jnp.float32)

    def in_dma(slot, chunk):
        return pltpu.make_async_copy(
            lp_any.at[g, pl.ds(chunk * CF, CF)], lp_buf.at[slot], in_sem.at[slot])

    def out_dma(slot, chunk):
        return pltpu.make_async_copy(
            dec_buf.at[slot], dec_any.at[g, pl.ds(chunk * CF, CF)], out_sem.at[slot])

    # ---- forward: q[j] = max(q[j-1], shift(q[j-1])) + lp[j]; emit dec bits
    in_dma(0, 0).start()

    def fwd_chunk(c, q):
        slot = c % 2

        @pl.when(c + 1 < n_chunks)
        def _():
            in_dma((c + 1) % 2, c + 1).start()

        in_dma(slot, c).wait()

        @pl.when(c >= 2)
        def _():
            out_dma(slot, c - 2).wait()  # dec_buf[slot] free to overwrite

        for k in range(CF):
            lp_j = lp_buf[slot, k]  # (t_text, LANES) f32
            q_shift = pltpu.roll(q, 1, 0)
            q_shift = jnp.where(row == 0, BIG_NEG, q_shift)
            dec = (q_shift >= q).astype(jnp.int8)
            q_new = jnp.maximum(q, q_shift) + lp_j
            if k == 0:
                # frame 0 (chunk 0 only): the path starts at token 0
                q0 = jnp.where(row == 0, lp_j, BIG_NEG)
                q_new = jnp.where(c == 0, q0, q_new)
                dec = jnp.where(c == 0, jnp.int8(0), dec)
            dec_buf[slot, k] = dec
            q = q_new
        out_dma(slot, c).start()
        return q

    q = jax.lax.fori_loop(
        0, n_chunks, fwd_chunk,
        jnp.full((t_text, LANES), BIG_NEG, jnp.float32),
    )
    # drain the in-flight dec writes before the backtrace re-reads them
    @pl.when(n_chunks >= 2)
    def _():
        out_dma((n_chunks - 2) % 2, n_chunks - 2).wait()

    out_dma((n_chunks - 1) % 2, n_chunks - 1).wait()

    # ---- backtrace: one-hot alignment column, dec streamed in reverse -----
    def back_dma(slot, chunk):
        return pltpu.make_async_copy(
            dec_any.at[g, pl.ds(chunk * CF, CF)], dec_buf.at[slot], in_sem.at[slot])

    back_dma(0, n_chunks - 1).start()

    def bwd_chunk(i, carry):
        a, ds = carry
        c = n_chunks - 1 - i
        slot = i % 2

        @pl.when(i + 1 < n_chunks)
        def _():
            back_dma((i + 1) % 2, c - 1).start()

        back_dma(slot, c).wait()
        for k in reversed(range(CF)):
            j = c * CF + k
            valid = (j < fl)          # (1, LANES) bool
            pin = (j == fl - 1)
            # the last valid frame is pinned to token tl-1
            a = jnp.where(pin, tl_onehot, a)
            ds = ds + jnp.where(valid, a, 0.0)
            # A[j-1] = A[j] - dec[j][A[j]]  (dec row 0 is 0 by construction)
            dec_j = dec_buf[slot, k].astype(jnp.float32)
            take_left = jnp.sum(a * dec_j, axis=0, keepdims=True) > 0.5
            stepped = pltpu.roll(a, t_text - 1, 0)  # circular shift by -1
            stepped = jnp.where(row == t_text - 1, 0.0, stepped)
            a_next = jnp.where(take_left, stepped, a)
            a = jnp.where(valid & (j > 0), a_next, a)
        return a, ds

    a0 = tl_onehot
    ds0 = jnp.zeros((t_text, LANES), jnp.float32)
    _, ds = jax.lax.fori_loop(0, n_chunks, bwd_chunk, (a0, ds0))
    ds_ref[0] = ds


def _pad_to(x, mult):
    return (x + mult - 1) // mult * mult


@partial(jax.jit, static_argnames=("interpret",))
def viterbi_decode_wavefront(log_p_attn, text_lengths, feats_lengths,
                             interpret: bool = False):
    """Same contract as ops.mas.viterbi_decode: (durations (B, T_text) f32
    [stop-gradient], bin_loss scalar with gradient into log_p_attn)."""
    b, t_feats, t_text = log_p_attn.shape
    lp = log_p_attn.astype(jnp.float32)
    frame_valid = jnp.arange(t_feats)[None, :] < feats_lengths[:, None]
    token_valid = jnp.arange(t_text)[None, :] < text_lengths[:, None]
    lp_m = jnp.where(frame_valid[:, :, None] & token_valid[:, None, :], lp, BIG_NEG)
    lp_dp = jax.lax.stop_gradient(lp_m)

    # pad: frames to >=2 DMA chunks, tokens to the int8 sublane tile, batch
    # to whole 128-wide lane slabs
    tf = max(_pad_to(t_feats, CF), 2 * CF)
    tt = _pad_to(t_text, 32)
    bp = _pad_to(b, LANES)
    g = bp // LANES
    lp_p = jnp.pad(lp_dp, ((0, bp - b), (0, tf - t_feats), (0, tt - t_text)),
                   constant_values=BIG_NEG)
    # (B, T, I) -> (G, T, I, LANES): batch becomes the minor (lane) dim
    lp_t = jnp.moveaxis(lp_p.reshape(g, LANES, tf, tt), 1, -1)
    tl = jnp.maximum(text_lengths.astype(jnp.int32), 1)
    fl = jnp.maximum(feats_lengths.astype(jnp.int32), 1)
    tl_p = jnp.pad(tl, (0, bp - b), constant_values=1).reshape(g, 1, LANES)
    fl_p = jnp.pad(fl, (0, bp - b), constant_values=1).reshape(g, 1, LANES)

    kernel = partial(_wf_kernel, tf, tt)
    ds, _dec = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0)),  # tl
            pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0)),  # fl
            pl.BlockSpec(memory_space=pl.ANY),              # lp (manual DMA)
        ],
        out_specs=(
            pl.BlockSpec((1, tt, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),              # dec scratch-out
        ),
        out_shape=(
            jax.ShapeDtypeStruct((g, tt, LANES), jnp.float32),
            jax.ShapeDtypeStruct((g, tf, tt, LANES), jnp.int8),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CF, tt, LANES), jnp.float32),  # lp chunks
            pltpu.VMEM((2, CF, tt, LANES), jnp.int8),     # dec chunks
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(tl_p, fl_p, lp_t)

    # (G, I, LANES) -> (B, I)
    ds = jnp.moveaxis(ds, -1, 1).reshape(bp, tt)[:b, :t_text]
    ds = jax.lax.stop_gradient(ds)

    # binarization loss OUTSIDE the kernel against the LIVE tensor: the path
    # A[j] = #{i : cumdur[i] <= j} reconstructs from durations, and the
    # take_along_axis gather carries the gradient (reference
    # alignments.py:237; same semantics as ops/mas.py)
    cum = jnp.cumsum(ds, axis=1)
    frames = jnp.arange(t_feats).astype(jnp.float32)
    a = jax.vmap(lambda c: jnp.searchsorted(c, frames, side="right"))(cum)
    a = jnp.minimum(a, jnp.maximum(text_lengths[:, None] - 1, 0)).astype(jnp.int32)
    picked = jnp.take_along_axis(lp_m, a[:, :, None], axis=2)[:, :, 0]
    flf = jnp.maximum(feats_lengths.astype(jnp.float32), 1.0)
    bin_losses = -jnp.sum(jnp.where(frame_valid, picked, 0.0), axis=1) / flf
    return ds, jnp.mean(bin_losses)
