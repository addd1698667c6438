"""Acoustic-model losses (duration / pitch / energy regression).

Capability parity with DurationPredictorLoss + FastSpeech2Loss
(/root/reference/optispeech/model/generator/loss.py:12-140): duration MSE in
log domain (clip 1e-8), pitch/energy SmoothL1, masked means over non-pad
tokens. The forward-sum alignment loss lives in ops/ctc.py.
"""

import jax.numpy as jnp

from ..ops.masking import sequence_mask


def _masked_mean(values, mask):
    total = jnp.sum(jnp.where(mask, values, 0.0))
    count = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    return total / count


def smooth_l1(pred, target, beta: float = 1.0):
    """torch.nn.SmoothL1Loss elementwise (default beta=1)."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def duration_loss(d_pred_log, d_target, token_mask, clip_val: float = 1e-8):
    """MSE between predicted log-durations and log(target + clip)
    (reference loss.py:12-46)."""
    target_log = jnp.log(d_target.astype(jnp.float32) + clip_val)
    sq = (d_pred_log.astype(jnp.float32) - target_log) ** 2
    return _masked_mean(sq, token_mask)


def fastspeech2_loss(
    d_outs, p_outs, e_outs, ds, ps, es, ilens, max_text_len: int,
    regression_loss_type: str = "l1",
):
    """Returns (duration_loss, pitch_loss, energy_loss) — masked means,
    matching FastSpeech2Loss(use_masking=True) (reference loss.py:83-140)."""
    mask = sequence_mask(ilens, max_text_len)
    d_l = duration_loss(d_outs, ds, mask)
    if regression_loss_type == "l1":
        p_l = _masked_mean(smooth_l1(p_outs.astype(jnp.float32), ps.astype(jnp.float32)), mask)
        e_l = _masked_mean(smooth_l1(e_outs.astype(jnp.float32), es.astype(jnp.float32)), mask)
    else:
        p_l = _masked_mean((p_outs.astype(jnp.float32) - ps.astype(jnp.float32)) ** 2, mask)
        e_l = _masked_mean((e_outs.astype(jnp.float32) - es.astype(jnp.float32)) ** 2, mask)
    return d_l, p_l, e_l
