"""Streaming / chunked long-form synthesis.

The reference ships an unfinished causal StreamGenerator
(/root/reference/optispeech/model/vocoder/streaming_hifigan/__init__.py:222,
broken imports, not wired into any config) whose *capability* — start emitting
audio before the whole utterance is decoded — is preserved here the TPU way:

The decoder + WaveNeXt vocoder are strictly local (stacked k=7 convs: decoder
4 blocks -> 12-frame receptive field, vocoder embed+8 blocks -> 27), so
frame-rate computation is chunked into fixed windows with `overlap` frames of
context on each side. One compiled program handles every chunk (static window
width), and each chunk's waveform can be fetched/streamed while the next chunk
computes. Overlap >= 48 frames makes chunked output exactly match full-window
output away from numerical noise.
"""

from functools import partial
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import expand_by_duration, gaussian_upsample, sequence_mask
from ..utils.bucketing import round_up_to_bucket
from .generator import OptiSpeechGenerator

# decoder (4 x k7) + vocoder (embed k7 + 8 x k7) one-sided receptive field
DEFAULT_OVERLAP = 48


class StreamingSynthesiser:
    """Wraps an OptiSpeech model with a chunked frame-rate pipeline."""

    def __init__(self, api, chunk_frames: int = 256, overlap: int = DEFAULT_OVERLAP):
        self.api = api
        self.gen = api.generator
        self.chunk = chunk_frames
        self.overlap = overlap
        self.window = chunk_frames + 2 * overlap
        self.hop = api.hop_length

        f0_cond = self.f0_cond = self.gen.cfg.vocoder.f0_cond

        # the two jits branch on f0_cond at CONSTRUCTION time so an
        # unconditioned model keeps the original 2-output/3-arg signatures —
        # mirroring export/exporter.py's stream graphs: same graph shapes,
        # same compile-cache keys, and no dead zeros traffic (ADVICE r4)
        if f0_cond:
            def upsample_fn(params, x, x_lengths, sids, lids, d, p, e, n_frames):
                enc = self.gen.apply(
                    {"params": params}, x, x_lengths, sids, lids, d, p, e,
                    method=OptiSpeechGenerator.encode,
                )
                y_lengths = jnp.minimum(enc["y_lengths"], n_frames)
                y_mask = sequence_mask(y_lengths, n_frames)
                frames = gaussian_upsample(
                    enc["hidden"], enc["durations"].astype(jnp.float32), y_mask, enc["x_mask"]
                )
                # frame-level pitch for the f0-conditioned vocoder, expanded
                # exactly as generator.decode does (hard repeat by duration)
                f0, _ = expand_by_duration(
                    enc["pitch"][..., None], enc["durations"], n_frames)
                f0 = f0[..., 0] * y_mask.astype(f0.dtype)
                return frames, f0, y_lengths

            def chunk_fn(params, window_frames, window_f0, window_padding_mask):
                # same masking semantics as the full-utterance path: frames
                # outside the valid utterance region are PAD for both stages, so
                # utterance-edge windows reproduce the full path's conv zero-padding
                return self.gen.apply(
                    {"params": params}, window_frames, window_f0, window_padding_mask,
                    method=lambda m, f, f0, pm:
                        m.vocoder(m.decoder(f, pm, deterministic=True),
                                  f0=f0, padding_mask=pm, deterministic=True),
                )
        else:
            def upsample_fn(params, x, x_lengths, sids, lids, d, p, e, n_frames):
                enc = self.gen.apply(
                    {"params": params}, x, x_lengths, sids, lids, d, p, e,
                    method=OptiSpeechGenerator.encode,
                )
                y_lengths = jnp.minimum(enc["y_lengths"], n_frames)
                y_mask = sequence_mask(y_lengths, n_frames)
                frames = gaussian_upsample(
                    enc["hidden"], enc["durations"].astype(jnp.float32), y_mask, enc["x_mask"]
                )
                return frames, y_lengths

            def chunk_fn(params, window_frames, window_padding_mask):
                return self.gen.apply(
                    {"params": params}, window_frames, window_padding_mask,
                    method=lambda m, f, pm:
                        m.vocoder(m.decoder(f, pm, deterministic=True),
                                  padding_mask=pm, deterministic=True),
                )

        self._upsample_jit = jax.jit(upsample_fn, static_argnames=("n_frames",))
        self._chunk_jit = jax.jit(chunk_fn)
        from ..ops.mulaw import mulaw_encode

        self._wire_enc = {
            "mulaw": jax.jit(mulaw_encode),
            "pcm16": jax.jit(lambda w: jnp.round(jnp.clip(w, -1, 1) * 32767.0)
                             .astype(jnp.int16)),
        }

    def stream(self, inputs, max_frames: int = 4096,
               wire: str | None = None) -> Iterator[np.ndarray]:
        """Yield waveform chunks (numpy) for the first batch item.

        `wire` compresses each chunk ON DEVICE before the fetch — "pcm16"
        (int16, half the f32 device->host bytes) or "mulaw" (uint8, quarter;
        decode with ops.mulaw.mulaw_decode). None yields f32."""
        inputs = inputs.as_numpy()
        b, t_text = inputs.x.shape
        t_bucket = round_up_to_bucket(t_text, self.api.text_bucket)
        x = np.zeros((b, t_bucket), np.int32)
        x[:, :t_text] = inputs.x
        sids = jnp.asarray(inputs.sids.astype(np.int32)) if inputs.sids is not None else None
        lids = jnp.asarray(inputs.lids.astype(np.int32)) if inputs.lids is not None else None

        out = self._upsample_jit(
            self.api.params, jnp.asarray(x),
            jnp.asarray(inputs.x_lengths.astype(np.int32)), sids, lids,
            jnp.float32(inputs.d_factor), jnp.float32(inputs.p_factor),
            jnp.float32(inputs.e_factor), max_frames,
        )
        if self.f0_cond:
            frames, f0_frames, y_lengths = out
        else:
            (frames, y_lengths), f0_frames = out, None
        total = int(np.asarray(y_lengths)[0])

        # pad `overlap` zeros on the left and a full window on the right so
        # the last chunk's slice never overruns (short utterances included)
        lpad = jnp.zeros((b, self.overlap, frames.shape[-1]), frames.dtype)
        rpad = jnp.zeros((b, self.window, frames.shape[-1]), frames.dtype)
        frames = jnp.concatenate([lpad, frames, rpad], axis=1)
        if self.f0_cond:
            f0_frames = jnp.concatenate([lpad[..., 0], f0_frames, rpad[..., 0]], axis=1)

        # window validity: position start-overlap+i is valid iff 0 <= pos < total
        pos0 = jnp.arange(self.window)

        start = 0
        pending = []  # (device wav, emit_start, emit_len) — overlap fetch & compute
        while start < total:
            emit = min(self.chunk, total - start)
            window = jax.lax.dynamic_slice_in_dim(frames, start, self.window, axis=1)
            pos = pos0 + (start - self.overlap)
            pad_mask = jnp.broadcast_to((pos < 0) | (pos >= total), (b, self.window))
            if self.f0_cond:
                window_f0 = jax.lax.dynamic_slice_in_dim(f0_frames, start, self.window, axis=1)
                wav = self._chunk_jit(self.api.params, window, window_f0, pad_mask)
            else:
                wav = self._chunk_jit(self.api.params, window, pad_mask)
            if wire is not None:
                wav = self._wire_enc[wire](wav)
            pending.append((wav, self.overlap * self.hop, emit * self.hop))
            start += emit
            if len(pending) > 1:
                w, s, n = pending.pop(0)
                yield np.asarray(w)[0, s : s + n]
        for w, s, n in pending:
            yield np.asarray(w)[0, s : s + n]

    def synthesise(self, inputs, max_frames: int = 4096) -> np.ndarray:
        """Convenience: concatenate the streamed chunks."""
        chunks = list(self.stream(inputs, max_frames))
        return np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
