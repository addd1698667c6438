"""Monotonic alignment search (MAS / Viterbi duration extraction), on device.

Capability parity with `_monotonic_alignment_search` + `viterbi_decode`
(/root/reference/optispeech/model/generator/alignments.py:177-239). The
reference JIT-compiles the O(T_mel * T_text) DP with numba and runs it
per-batch-item on the CPU, forcing a device->host sync in every training step
(alignments.py:232). Here the DP is reformulated as a `lax.scan` over mel
frames whose per-step update is a vectorized shift-max over the text axis, and
the backtrace as a reverse scan — the whole batch stays on the TPU and is
`vmap`-batched.

The recurrence (https://arxiv.org/abs/2005.11129):
    Q[i, j] = max(Q[i-1, j-1], Q[i, j-1]) + log_prob[i, j]
with row 0 initialized to the running sum of log_prob[0, :j+1]; backtrace
A[j] in {A[j+1]-1, A[j+1]} by comparing Q values.
"""

from functools import partial

import jax
import jax.numpy as jnp

BIG_NEG = -1e9


def _mas_forward(log_prob_t: jnp.ndarray) -> jnp.ndarray:
    """DP table for one item. log_prob_t: (T_text, T_mel). Returns Q (T_text, T_mel)."""
    t_text = log_prob_t.shape[0]

    q0 = jnp.full((t_text,), BIG_NEG, jnp.float32).at[0].set(log_prob_t[0, 0])

    def step(q, lp_col):
        # shift down: candidate from token i-1 at previous frame
        q_prev_shift = jnp.concatenate([jnp.full((1,), BIG_NEG, jnp.float32), q[:-1]])
        q_new = jnp.maximum(q, q_prev_shift) + lp_col
        return q_new, q_new

    _, q_cols = jax.lax.scan(step, q0, log_prob_t[:, 1:].T)  # (T_mel-1, T_text)
    return jnp.concatenate([q0[None, :], q_cols], axis=0).T  # (T_text, T_mel)


def _mas_backtrace(q: jnp.ndarray, text_len: jnp.ndarray, feats_len: jnp.ndarray) -> jnp.ndarray:
    """Backtrace A (T_mel,) for one item given Q (T_text, T_mel)."""
    t_mel = q.shape[1]
    a_last = text_len - 1

    def step(a, j):
        # computing A[j] from A[j+1]=a, reference alignments.py:195-207
        i_b = a
        i_a = jnp.maximum(a - 1, 0)
        q_col = q[:, j]
        take_a = jnp.where(i_b == 0, True, q_col[i_a] >= q_col[i_b])
        a_new = jnp.where(take_a, i_a, i_b)
        # frames at/after the last valid frame stay pinned at the final token
        a_new = jnp.where(j >= feats_len - 1, text_len - 1, a_new)
        return a_new, a_new

    js = jnp.arange(t_mel - 2, -1, -1)
    _, a_rev = jax.lax.scan(step, a_last, js)
    return jnp.concatenate([a_rev[::-1], a_last[None]])


@partial(jax.jit, static_argnames=())
def viterbi_decode(
    log_p_attn: jnp.ndarray,
    text_lengths: jnp.ndarray,
    feats_lengths: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Extract durations from attention log-probs (alignments.py:210-239).

    Args:
        log_p_attn: (B, T_feats, T_text) log attention probabilities.
        text_lengths: (B,)
        feats_lengths: (B,)

    Returns:
        durations (B, T_text) float32, bin_loss scalar
        (mean over batch of -mean_j log_p_attn[j, A[j]]).
    """
    b, t_feats, t_text = log_p_attn.shape
    lp = log_p_attn.astype(jnp.float32)
    # mask invalid cells so the DP can't route through padding
    frame_valid = jnp.arange(t_feats)[None, :] < feats_lengths[:, None]
    token_valid = jnp.arange(t_text)[None, :] < text_lengths[:, None]
    lp_m = jnp.where(frame_valid[:, :, None] & token_valid[:, None, :], lp, BIG_NEG)
    # the DP/backtrace is detached (the reference runs it on .detach().numpy(),
    # alignments.py:232) but the binarization-loss gather reads the LIVE
    # tensor (alignments.py:237) so its gradient trains the alignment module
    lp_dp = jax.lax.stop_gradient(lp_m)

    def per_item(lp_dp_i, lp_live_i, tl, fl):
        q = _mas_forward(lp_dp_i.T)  # (T_text, T_mel)
        a = _mas_backtrace(q, tl, fl)  # (T_mel,)
        fv = jnp.arange(t_feats) < fl
        ds = jax.ops.segment_sum(fv.astype(jnp.float32), a, num_segments=t_text)
        # gather aligned log-probs for the binarization loss (differentiable)
        picked = jnp.take_along_axis(lp_live_i, a[:, None], axis=1)[:, 0]
        bin_l = -jnp.sum(jnp.where(fv, picked, 0.0)) / jnp.maximum(fl.astype(jnp.float32), 1.0)
        return ds, bin_l

    ds, bin_losses = jax.vmap(per_item)(lp_dp, lp_m, text_lengths, feats_lengths)
    return jax.lax.stop_gradient(ds), jnp.mean(bin_losses)
