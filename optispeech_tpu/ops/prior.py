"""Beta-binomial alignment prior, computed batched on device.

Capability parity with AlignmentModule._generate_prior
(/root/reference/optispeech/model/generator/alignments.py:85-123), which loops
over the batch on host calling scipy.stats.betabinom and caches per-(T,N)
matrices. Here the logpmf is expressed with `gammaln` so the whole (B, T_feats,
T_text) prior is one fused XLA computation — no host loop, no cache needed.
"""

import jax.numpy as jnp
from jax.scipy.special import gammaln

BIG_NEG = -1e9


def _betaln(x, y):
    return gammaln(x) + gammaln(y) - gammaln(x + y)


def beta_binomial_log_prior(
    text_lengths: jnp.ndarray,
    feats_lengths: jnp.ndarray,
    max_text_len: int,
    max_feats_len: int,
    w: float = 1.0,
) -> jnp.ndarray:
    """Batched 2d static prior (B, T_feats, T_text).

    prior[b, t, k] = BetaBinom(k; n=N_b, a=w*(t+1), b=w*(N... T_b - w*(t+1) + 1))
    matching the reference construction; invalid (t, k) cells get BIG_NEG
    (the reference uses -inf, which poisons grads under jit).
    """
    n = text_lengths.astype(jnp.float32)[:, None, None]  # N trials
    t_feats = feats_lengths.astype(jnp.float32)[:, None, None]  # T
    t = jnp.arange(max_feats_len, dtype=jnp.float32)[None, :, None]  # frame idx
    k = jnp.arange(max_text_len, dtype=jnp.float32)[None, None, :]  # token idx

    a = w * (t + 1.0)
    b = w * (t_feats - w * (t + 1.0) + 1.0)

    valid = (t < t_feats) & (k < n)
    # clamp inputs on invalid cells so gammaln stays finite
    a_s = jnp.where(valid, a, 1.0)
    b_s = jnp.where(valid, jnp.maximum(b, 1e-3), 1.0)
    k_s = jnp.where(valid, k, 0.0)
    n_s = jnp.maximum(n, 1.0)

    logpmf = (
        gammaln(n_s + 1.0)
        - gammaln(k_s + 1.0)
        - gammaln(n_s - k_s + 1.0)
        + _betaln(k_s + a_s, n_s - k_s + b_s)
        - _betaln(a_s, b_s)
    )
    return jnp.where(valid, logpmf, BIG_NEG)
