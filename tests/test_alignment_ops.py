"""Alignment subsystem tests: MAS vs numpy DP oracle, beta-binomial prior vs
scipy, forward-sum loss vs torch.nn.functional.ctc_loss (SURVEY.md hard parts
#1 and #4)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F
from scipy.stats import betabinom

from optispeech_tpu.ops.ctc import forward_sum_loss
from optispeech_tpu.ops.mas import viterbi_decode
from optispeech_tpu.ops.prior import beta_binomial_log_prior


def _np_mas(log_p_attn):
    """Transcription of the reference numba DP (alignments.py:177-207)."""
    t_mel, t_inp = log_p_attn.shape
    Q = np.full((t_inp, t_mel), -np.inf)
    log_prob = log_p_attn.T
    for j in range(t_mel):
        Q[0, j] = log_prob[0, : j + 1].sum()
    for j in range(1, t_mel):
        for i in range(1, min(j + 1, t_inp)):
            Q[i, j] = max(Q[i - 1, j - 1], Q[i, j - 1]) + log_prob[i, j]
    A = np.full((t_mel,), t_inp - 1)
    for j in range(t_mel - 2, -1, -1):
        i_a = A[j + 1] - 1
        i_b = A[j + 1]
        if i_b == 0:
            argmax_i = 0
        elif Q[i_a, j] >= Q[i_b, j]:
            argmax_i = i_a
        else:
            argmax_i = i_b
        A[j] = argmax_i
    return A


def test_mas_vs_numpy_oracle(rng):
    b = 4
    t_feats, t_text = 37, 11
    feats_lengths = np.array([37, 20, 30, 15])
    text_lengths = np.array([11, 6, 9, 4])
    lp = np.log(rng.dirichlet(np.ones(t_text), size=(b, t_feats)).astype(np.float32) + 1e-8)
    ds, bin_loss = viterbi_decode(
        jnp.asarray(lp), jnp.asarray(text_lengths), jnp.asarray(feats_lengths)
    )
    ds = np.asarray(ds)
    losses = []
    for i in range(b):
        fl, tl = feats_lengths[i], text_lengths[i]
        a = _np_mas(lp[i, :fl, :tl].astype(np.float64))
        expect = np.bincount(a, minlength=t_text)
        np.testing.assert_array_equal(ds[i], expect)
        losses.append(-lp[i, np.arange(fl), a].mean())
    assert ds.sum(axis=1).tolist() == feats_lengths.tolist()
    np.testing.assert_allclose(float(bin_loss), np.mean(losses), rtol=1e-4)


def test_mas_durations_monotonic_cover(rng):
    # durations must be >= 0 with first token >= 1, and sum to feats_len
    t_feats, t_text = 64, 16
    lp = np.log(rng.dirichlet(np.ones(t_text), size=(1, t_feats)).astype(np.float32) + 1e-8)
    ds, _ = viterbi_decode(jnp.asarray(lp), jnp.asarray([t_text]), jnp.asarray([t_feats]))
    ds = np.asarray(ds)[0]
    assert ds.sum() == t_feats
    assert ds[0] >= 1  # alignment starts at the first token


def test_beta_binomial_prior_vs_scipy():
    text_lengths = np.array([7, 4])
    feats_lengths = np.array([19, 11])
    got = np.asarray(
        beta_binomial_log_prior(jnp.asarray(text_lengths), jnp.asarray(feats_lengths), 9, 23)
    )
    assert got.shape == (2, 23, 9)
    for bi in range(2):
        T, N = feats_lengths[bi], text_lengths[bi]
        alpha = np.arange(1, T + 1, dtype=float)
        beta = np.array([T - t + 1 for t in alpha])
        k = np.arange(N)[..., None]
        prob = betabinom.logpmf(k, N, alpha, beta)  # (N, T)
        expect = prob.T  # (T, N)
        # f32 gammaln carries ~|gammaln|*eps ≈ 2e-3 absolute rounding at these
        # argument magnitudes; immaterial for a log-prior added to attention.
        np.testing.assert_allclose(got[bi, :T, :N], expect, rtol=5e-3, atol=5e-3)
        assert (got[bi, T:, :] <= -1e8).all()
        assert (got[bi, :, N:] <= -1e8).all()


def _torch_forward_sum(log_p_attn, ilens, olens):
    """Transcription of reference ForwardSumLoss (loss.py:150-194)."""
    log_p_attn = torch.tensor(log_p_attn)
    ilens = torch.tensor(ilens)
    olens = torch.tensor(olens)
    B = log_p_attn.size(0)
    log_p_attn_pd = F.pad(log_p_attn, (1, 0, 0, 0, 0, 0), value=np.log(np.e**-1))
    loss = 0
    for bidx in range(B):
        target_seq = torch.arange(1, ilens[bidx] + 1).unsqueeze(0)
        cur = log_p_attn_pd[bidx, : olens[bidx], : ilens[bidx] + 1].unsqueeze(1)
        cur = F.log_softmax(cur, dim=-1)
        loss = loss + F.ctc_loss(
            log_probs=cur,
            targets=target_seq,
            input_lengths=olens[bidx : bidx + 1],
            target_lengths=ilens[bidx : bidx + 1],
            zero_infinity=True,
        )
    return float(loss / B)


def test_forward_sum_loss_vs_torch(rng):
    b, t_feats, t_text = 3, 26, 8
    text_lengths = np.array([8, 5, 3])
    feats_lengths = np.array([26, 14, 9])
    lp = np.log(rng.dirichlet(np.ones(t_text), size=(b, t_feats)).astype(np.float32) + 1e-8)
    got = float(
        forward_sum_loss(jnp.asarray(lp), jnp.asarray(text_lengths), jnp.asarray(feats_lengths))
    )
    expect = _torch_forward_sum(lp, text_lengths, feats_lengths)
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-3)


def test_forward_sum_loss_grad_finite(rng):
    import jax

    b, t_feats, t_text = 2, 15, 6
    lp = np.log(rng.dirichlet(np.ones(t_text), size=(b, t_feats)).astype(np.float32) + 1e-8)
    g = jax.grad(
        lambda x: forward_sum_loss(x, jnp.asarray([6, 4]), jnp.asarray([15, 10]))
    )(jnp.asarray(lp))
    assert np.isfinite(np.asarray(g)).all()
