"""Batched forward-sum (CTC) alignment loss, on device.

Capability parity with ForwardSumLoss
(/root/reference/optispeech/model/generator/loss.py:143-194): the reference
loops over the batch calling torch's CTC with target sequence [1..N]. Because
every label is distinct, the generic CTC forward recursion needs no same-label
special case; we run one `lax.scan` over mel frames for the whole batch.

Semantics matched:
- a blank column with probability e^-1 is prepended (loss.py:175),
- log_softmax over the (T_text+1) label axis per frame (loss.py:185),
- per-item loss divided by target length (torch ctc_loss reduction="mean"
  with batch 1), then averaged over the batch,
- zero_infinity=True -> non-finite per-item losses become 0.
"""

import jax
import jax.numpy as jnp
import numpy as np

BIG_NEG = -1e9


def _log_softmax_masked(x, valid):
    x = jnp.where(valid, x, BIG_NEG)
    m = jnp.max(x, axis=-1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(x - m), axis=-1, keepdims=True))
    return x - lse


def forward_sum_loss(
    log_p_attn: jnp.ndarray,
    text_lengths: jnp.ndarray,
    feats_lengths: jnp.ndarray,
    blank_prob: float = float(np.e**-1),
) -> jnp.ndarray:
    """Args: log_p_attn (B, T_feats, T_text); lengths (B,). Returns scalar."""
    b, t_feats, t_text = log_p_attn.shape
    lp = log_p_attn.astype(jnp.float32)

    # prepend blank column -> (B, T_feats, T_text + 1)
    blank = jnp.full((b, t_feats, 1), float(np.log(blank_prob)), jnp.float32)
    lp = jnp.concatenate([blank, lp], axis=2)

    # per-frame log_softmax over valid labels (0..text_len inclusive)
    label_valid = jnp.arange(t_text + 1)[None, None, :] <= text_lengths[:, None, None]
    lp = _log_softmax_masked(lp, label_valid)

    # CTC states s=0..2N: even -> blank, odd -> label (s+1)//2
    n_states = 2 * t_text + 1
    s = jnp.arange(n_states)
    state_label = jnp.where(s % 2 == 1, (s + 1) // 2, 0)  # column index into lp
    state_valid = s[None, :] <= 2 * text_lengths[:, None]  # (B, S)

    emit = lp[:, :, state_label]  # (B, T_feats, S)
    emit = jnp.where(state_valid[:, None, :], emit, BIG_NEG)

    def shift(x, k):
        pad = jnp.full((b, k), BIG_NEG, jnp.float32)
        return jnp.concatenate([pad, x[:, :-k]], axis=1) if k else x

    alpha0 = jnp.full((b, n_states), BIG_NEG, jnp.float32)
    alpha0 = alpha0.at[:, 0].set(emit[:, 0, 0])
    if n_states > 1:
        alpha0 = alpha0.at[:, 1].set(emit[:, 0, 1])

    frame_valid = jnp.arange(t_feats)[None, :] < feats_lengths[:, None]  # (B, T)

    def step(alpha, inputs):
        emit_t, fv = inputs  # (B, S), (B,)
        a1, a2 = shift(alpha, 1), shift(alpha, 2)
        # skip (s-2) transition only for odd (label) states; labels are all
        # distinct so no same-label restriction applies
        odd = (s % 2 == 1)[None, :]
        a2 = jnp.where(odd, a2, BIG_NEG)
        stacked = jnp.stack([alpha, a1, a2], axis=0)
        m = jnp.max(stacked, axis=0)
        new = m + jnp.log(jnp.sum(jnp.exp(stacked - m[None]), axis=0)) + emit_t
        new = jnp.maximum(new, -1e30)
        alpha = jnp.where(fv[:, None], new, alpha)
        return alpha, None

    alpha, _ = jax.lax.scan(
        step, alpha0, (jnp.swapaxes(emit[:, 1:], 0, 1), jnp.swapaxes(frame_valid[:, 1:], 0, 1))
    )

    # final: logsumexp over states 2N and 2N-1
    idx_last = 2 * text_lengths  # (B,)
    a_last = jnp.take_along_axis(alpha, idx_last[:, None], axis=1)[:, 0]
    a_prev = jnp.take_along_axis(alpha, jnp.maximum(idx_last - 1, 0)[:, None], axis=1)[:, 0]
    m = jnp.maximum(a_last, a_prev)
    log_p = m + jnp.log(jnp.exp(a_last - m) + jnp.exp(a_prev - m))

    per_item = -log_p / jnp.maximum(text_lengths.astype(jnp.float32), 1.0)
    # zero_infinity: impossible alignments surface as log_p <= BIG_NEG/2
    # (we use a finite sentinel instead of -inf), zero them like torch does
    feasible = (log_p > 0.5 * BIG_NEG) & jnp.isfinite(per_item)
    per_item = jnp.where(feasible, per_item, 0.0)
    return jnp.mean(per_item)
