"""Primitive sequence / DSP ops (layer L0 of the framework).

Mirrors the capability surface of the reference's
`optispeech/utils/model.py`, `optispeech/utils/segments.py` and
`optispeech/model/generator/alignments.py` utility functions, re-expressed as
batched, jit-compatible JAX ops.
"""

from .masking import sequence_mask, make_pad_mask, make_non_pad_mask, lengths_to_padding_mask
from .segments import get_segments, get_random_segments
from .duration import (
    average_by_duration,
    expand_by_duration,
    gaussian_upsample,
    duration_to_frame_index,
)
from .audio import (
    safe_log,
    normalize,
    denormalize,
    dynamic_range_compression,
    dynamic_range_decompression,
)
from .stft import (
    frame_signal,
    stft_magnitude,
    mel_filterbank,
    log_mel_spectrogram,
    frame_energy,
    hann_window,
)
from .mas import viterbi_decode
from .prior import beta_binomial_log_prior
from .ctc import forward_sum_loss

__all__ = [
    "sequence_mask",
    "make_pad_mask",
    "make_non_pad_mask",
    "lengths_to_padding_mask",
    "get_segments",
    "get_random_segments",
    "average_by_duration",
    "expand_by_duration",
    "gaussian_upsample",
    "duration_to_frame_index",
    "safe_log",
    "normalize",
    "denormalize",
    "dynamic_range_compression",
    "dynamic_range_decompression",
    "frame_signal",
    "stft_magnitude",
    "mel_filterbank",
    "log_mel_spectrogram",
    "frame_energy",
    "hann_window",
    "viterbi_decode",
    "beta_binomial_log_prior",
    "forward_sum_loss",
]
