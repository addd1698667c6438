"""JETS alignment module: learned text<->mel affinity + beta-binomial prior.

Capability parity with AlignmentModule
(/root/reference/optispeech/model/generator/alignments.py:14-123).

TPU-first: the reference materializes the (B, T_feats, T_text, C) pairwise
difference tensor to take an L2 norm (alignments.py:66-67); here
||f - t||^2 = ||f||^2 + ||t||^2 - 2 f.t is one batched matmul on the MXU with
no 4-D intermediate. The prior is the on-device batched formulation from
ops/prior.py instead of a host scipy loop.
"""

import flax.linen as nn
import jax.numpy as jnp

from ...ops.prior import beta_binomial_log_prior

BIG_NEG = -1e9


class AlignmentModule(nn.Module):
    adim: int
    odim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text, feats, text_lengths, feats_lengths, x_masks=None):
        """
        Args:
            text: (B, T_text, adim) encoded text.
            feats: (B, T_feats, odim) mel features.
            text_lengths/feats_lengths: (B,)
            x_masks: (B, T_text) bool, True = PAD.

        Returns:
            (B, T_feats, T_text) log attention probabilities.
        """
        t = nn.relu(nn.Conv(self.adim, (3,), padding=1, dtype=self.dtype, name="t_conv1")(text))
        t = nn.Conv(self.adim, (1,), dtype=self.dtype, name="t_conv2")(t)

        f = nn.relu(nn.Conv(self.adim, (3,), padding=1, dtype=self.dtype, name="f_conv1")(feats))
        f = nn.relu(nn.Conv(self.adim, (3,), padding=1, dtype=self.dtype, name="f_conv2")(f))
        f = nn.Conv(self.adim, (1,), dtype=self.dtype, name="f_conv3")(f)

        # squared-distance expansion (no (B, F, T, C) intermediate)
        f32, t32 = f.astype(jnp.float32), t.astype(jnp.float32)
        f_sq = jnp.sum(f32 * f32, axis=-1)  # (B, F)
        t_sq = jnp.sum(t32 * t32, axis=-1)  # (B, T)
        cross = jnp.einsum("bfc,btc->bft", f32, t32, precision="highest")
        dist_sq = jnp.maximum(f_sq[:, :, None] + t_sq[:, None, :] - 2.0 * cross, 0.0)
        score = -jnp.sqrt(dist_sq + 1e-12)

        if x_masks is not None:
            score = jnp.where(x_masks[:, None, :], BIG_NEG, score)

        log_p_attn = nn.log_softmax(score, axis=-1)
        bb_prior = beta_binomial_log_prior(
            text_lengths, feats_lengths, text.shape[1], feats.shape[1]
        )
        return log_p_attn + bb_prior
