"""Generator composition (L3): text -> frames -> waveform, plus AM losses.

Capability parity with OptiSpeechGenerator
(/root/reference/optispeech/model/generator/__init__.py): wiring order,
detach boundaries (duration predictor on stop-gradient hiddens, vocoder on
stop-gradient decoder output), segment cropping before the vocoder, loss
weighting — all preserved.

TPU-first structure: three entry methods so every jit has static shapes:
- `__call__`           training forward (padded text/mel buckets),
- `encode`             inference stage 1 at token rate (text bucket),
- `decode`             inference stage 2 at frame rate (mel bucket);
  the duration sum crosses stages as data, so stage 2's frame count is a
  host-chosen bucket — this replaces torch's dynamic `y_lengths.max()`
  (reference generator/__init__.py:258-259; SURVEY.md hard part #2).
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import GeneratorConfig
from ..ops import (
    average_by_duration,
    expand_by_duration,
    gaussian_upsample,
    get_random_segments,
    get_segments,
    sequence_mask,
)
from ..ops.ctc import forward_sum_loss
from ..ops.mas import viterbi_decode
from .losses import fastspeech2_loss
from .modules.alignment import AlignmentModule
from .modules.convnext import ConvNeXtBackbone
from .modules.conformer import ConformerBackbone
from .modules.core import DurationPredictor, EnergyPredictor, PitchPredictor, TextEmbedding
from .modules.leanspeech import LeanSpeechBackbone
from .modules.lightspeech import LightSpeechTransformerDecoder, LightSpeechTransformerEncoder
from .modules.transformer import TransformerBackbone


def make_backbone(cfg, dim, dtype, name, is_decoder=False):
    if cfg.kind == "convnext":
        return ConvNeXtBackbone(
            dim=dim, intermediate_dim=cfg.intermediate_dim, num_layers=cfg.num_layers,
            drop_path=cfg.drop_path, layer_scale_init_value=cfg.layer_scale_init_value,
            fused_pallas=cfg.fused_pallas, dtype=dtype, name=name,
        )
    if cfg.kind == "lightspeech":
        cls = LightSpeechTransformerDecoder if is_decoder else LightSpeechTransformerEncoder
        return cls(dim=dim, kernel_sizes=tuple(cfg.kernel_sizes), activation=cfg.activation,
                   dropout=cfg.dropout, dtype=dtype, name=name)
    if cfg.kind == "transformer":
        return TransformerBackbone(
            dim=dim, attention_heads=cfg.attention_heads, linear_units=cfg.linear_units,
            num_blocks=cfg.num_blocks, dropout_rate=cfg.dropout,
            positional_dropout_rate=cfg.positional_dropout_rate,
            attention_dropout_rate=cfg.attention_dropout_rate, dtype=dtype, name=name,
        )
    if cfg.kind == "conformer":
        return ConformerBackbone(
            dim=dim, attention_heads=cfg.attention_heads, linear_units=cfg.linear_units,
            num_blocks=cfg.num_blocks, dropout_rate=cfg.dropout,
            positional_dropout_rate=cfg.positional_dropout_rate,
            attention_dropout_rate=cfg.attention_dropout_rate,
            cnn_module_kernel=cfg.cnn_module_kernel, conv_norm=cfg.conv_norm,
            dtype=dtype, name=name,
        )
    if cfg.kind == "leanspeech":
        return LeanSpeechBackbone(dim=dim, kernel_size=cfg.kernel_size,
                                  num_layers=cfg.num_layers, drop_path=cfg.drop_path,
                                  dtype=dtype, name=name)
    raise ValueError(f"unknown backbone kind {cfg.kind}")


class OptiSpeechGenerator(nn.Module):
    cfg: GeneratorConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        te = c.text_embedding
        self.text_embedding = TextEmbedding(
            dim=c.dim, n_vocab=te.n_vocab, dropout=te.dropout, padding_idx=te.padding_idx,
            max_source_positions=te.max_source_positions, dtype=self.dtype,
        )
        self.encoder = make_backbone(c.encoder, c.dim, self.dtype, "encoder")
        self.decoder = make_backbone(c.decoder, c.dim, self.dtype, "decoder", is_decoder=True)
        dp = c.duration_predictor
        self.duration_predictor = DurationPredictor(
            dim=c.dim, num_layers=dp.num_layers, intermediate_dim=dp.intermediate_dim,
            kernel_size=dp.kernel_size, dropout=dp.dropout, separable=dp.separable,
            dtype=self.dtype,
        )
        pp = c.pitch_predictor
        self.pitch_predictor = PitchPredictor(
            dim=c.dim, num_layers=pp.num_layers, intermediate_dim=pp.intermediate_dim,
            kernel_size=pp.kernel_size, dropout=pp.dropout, separable=pp.separable,
            embed_kernel_size=pp.embed_kernel_size, embed_dropout=pp.embed_dropout,
            dtype=self.dtype,
        )
        ep = c.energy_predictor
        self.energy_predictor = EnergyPredictor(
            dim=c.dim, num_layers=ep.num_layers, intermediate_dim=ep.intermediate_dim,
            kernel_size=ep.kernel_size, dropout=ep.dropout, separable=ep.separable,
            embed_kernel_size=ep.embed_kernel_size, embed_dropout=ep.embed_dropout,
            dtype=self.dtype,
        )
        self.alignment_module = AlignmentModule(adim=c.dim, odim=c.features.n_feats, dtype=self.dtype)
        from .vocoder.wavenext import WaveNeXt

        v = c.vocoder
        self.vocoder = WaveNeXt(
            input_channels=c.dim, dim=v.dim, intermediate_dim=v.intermediate_dim,
            num_layers=v.num_layers, n_fft=c.features.n_fft, hop_length=c.features.hop_length,
            sample_rate=c.features.sample_rate, drop_path=v.drop_path,
            fused_pallas=v.fused_pallas, f0_cond=v.f0_cond, dtype=self.dtype,
        )
        if c.num_speakers > 1:
            self.sid_embed = nn.Embed(c.num_speakers, c.dim, dtype=self.dtype)
        if c.num_languages > 1:
            self.lid_embed = nn.Embed(c.num_languages, c.dim, dtype=self.dtype)

    # -- shared front half -------------------------------------------------
    def _encode_text(self, x, input_padding_mask, sids, lids, deterministic):
        h, _ = self.text_embedding(x, deterministic=deterministic)
        h = self.encoder(h, input_padding_mask, deterministic=deterministic)
        if self.cfg.num_speakers > 1:
            sids = jnp.zeros((x.shape[0],), jnp.int32) if sids is None else sids
            h = h + self.sid_embed(sids.reshape(-1))[:, None, :]
        if self.cfg.num_languages > 1:
            lids = jnp.zeros((x.shape[0],), jnp.int32) if lids is None else lids
            h = h + self.lid_embed(lids.reshape(-1))[:, None, :]
        return h

    # -- training ----------------------------------------------------------
    def __call__(self, x, x_lengths, mel, mel_lengths, pitches, energies,
                 sids=None, lids=None, deterministic: bool = False,
                 start_idx=None):
        """Training forward (reference generator/__init__.py:72-192).

        Args:
            x: (B, T_text) phoneme ids.  mel: (B, n_feats, T_mel).
            pitches/energies: (B, T_mel) frame-level values.
            start_idx: optional (B,) segment start indices sampled on the
                HOST (ops/segments.py host_sample_segment_starts). When given,
                the "segment" rng is not consumed and the trainer ships only
                the matching GT wav crop instead of the full waveform batch.

        Returns dict: wav_hat (B, segment*hop), start_idx, loss + sublosses.
        """
        c = self.cfg
        b, t_text = x.shape
        t_mel = mel.shape[-1]
        x_mask = sequence_mask(x_lengths, t_text)
        mel_mask = sequence_mask(mel_lengths, t_mel)
        input_padding_mask = ~x_mask
        target_padding_mask = ~mel_mask

        h = self._encode_text(x, input_padding_mask, sids, lids, deterministic)

        # alignment: learned affinity + prior -> MAS durations (device-resident)
        mel_btc = jnp.swapaxes(mel, 1, 2)  # (B, T_mel, n_feats)
        log_p_attn = self.alignment_module(
            h, mel_btc.astype(h.dtype), x_lengths, mel_lengths, x_masks=input_padding_mask
        )
        # bin_loss backpropagates into the alignment module; the DP itself is
        # detached inside viterbi_decode (reference alignments.py:232,237)
        durations, bin_loss = viterbi_decode(log_p_attn, x_lengths, mel_lengths)
        duration_hat = self.duration_predictor(
            jax.lax.stop_gradient(h), input_padding_mask, deterministic=deterministic
        )

        # frame-level -> token-level targets
        pitches_tok = average_by_duration(durations, pitches, x_lengths, mel_lengths)
        energies_tok = average_by_duration(durations, energies, x_lengths, mel_lengths)

        h, pitch_hat = self.pitch_predictor(
            h, input_padding_mask, pitches_tok, deterministic=deterministic
        )
        h, energy_hat = self.energy_predictor(
            h, input_padding_mask, energies_tok, deterministic=deterministic
        )

        y = gaussian_upsample(h, durations, mel_mask, x_mask)
        y = self.decoder(y, target_padding_mask, deterministic=deterministic)

        # random segment crop for the vocoder/GAN (reference :146-158)
        segment_size = min(c.segment_size, t_mel)
        if start_idx is None:
            num_frames = jnp.maximum(mel_lengths - 4, 1)
            seg, start_idx = get_random_segments(
                self.make_rng("segment"), jnp.swapaxes(y, 1, 2), num_frames,
                segment_size,
            )
        else:
            seg = get_segments(jnp.swapaxes(y, 1, 2), start_idx, segment_size)
        # vocoder trains on detached decoder output (reference :161) unless
        # cfg.detach_vocoder_input=False (config-flagged deviation — see
        # config.py GeneratorConfig); f0 is teacher-forced GT data either way
        seg = jnp.swapaxes(seg, 1, 2)  # (B, S, C)
        if c.detach_vocoder_input:
            seg = jax.lax.stop_gradient(seg)
        f0_cond = get_segments(pitches[:, None, :], start_idx, segment_size)
        wav_hat = self.vocoder(
            seg, f0=jax.lax.stop_gradient(f0_cond), deterministic=deterministic
        )

        # losses
        d_l, p_l, e_l = fastspeech2_loss(
            duration_hat, pitch_hat, energy_hat, durations, pitches_tok, energies_tok,
            x_lengths, t_text,
        )
        fs_loss = forward_sum_loss(log_p_attn, x_lengths, mel_lengths)
        align_loss = fs_loss + bin_loss
        lc = c.loss_coeffs
        loss = (
            align_loss * lc.lambda_align
            + d_l * lc.lambda_duration
            + p_l * lc.lambda_pitch
            + e_l * lc.lambda_energy
        )
        return {
            "wav_hat": wav_hat.astype(jnp.float32),
            "start_idx": start_idx,
            "segment_size": segment_size,
            "loss": loss,
            "align_loss": align_loss,
            "duration_loss": d_l,
            "pitch_loss": p_l,
            "energy_loss": e_l,
            "durations": durations,
        }

    # -- inference stage 1: token rate --------------------------------------
    def encode(self, x, x_lengths, sids=None, lids=None,
               d_factor: float = 1.0, p_factor: float = 1.0, e_factor: float = 1.0):
        """(reference generator/__init__.py:221-256 up to the upsampler)."""
        t_text = x.shape[1]
        x_mask = sequence_mask(x_lengths, t_text)
        input_padding_mask = ~x_mask
        h = self._encode_text(x, input_padding_mask, sids, lids, True)
        durations = self.duration_predictor.infer(h, input_padding_mask, factor=d_factor)
        h, pitch = self.pitch_predictor.infer(h, input_padding_mask, p_factor)
        h, energy = self.energy_predictor.infer(h, input_padding_mask, e_factor)
        y_lengths = jnp.sum(durations, axis=1)
        return {
            "hidden": h, "durations": durations, "pitch": pitch, "energy": energy,
            "y_lengths": y_lengths, "x_mask": x_mask,
        }

    # -- single-graph inference with a static frame cap ---------------------
    def synthesise_fixed(self, x, x_lengths, sids=None, lids=None,
                         d_factor: float = 1.0, p_factor: float = 1.0,
                         e_factor: float = 1.0, n_frames: int = 1024):
        """Full text->waveform in ONE jitted graph: durations stay on device
        and the output length is capped at the static `n_frames` bucket. No
        host sync anywhere — the zero-latency serving path (the two-stage
        `encode`/`decode` pair trades one scalar sync for exact bucketing)."""
        enc = self.encode(x, x_lengths, sids, lids, d_factor, p_factor, e_factor)
        y_lengths = jnp.minimum(enc["y_lengths"], n_frames)
        dec = self.decode(enc["hidden"], enc["durations"], enc["x_mask"], y_lengths, n_frames,
                          pitch=enc["pitch"])
        return {**dec, "durations": enc["durations"], "pitch": enc["pitch"],
                "energy": enc["energy"], "y_lengths": y_lengths}

    # -- inference stage 2: frame rate --------------------------------------
    def decode(self, hidden, durations, x_mask, y_lengths, n_frames: int, pitch=None):
        """Upsample -> decoder -> vocoder (reference :258-283). `n_frames` is
        the static mel bucket chosen by the host from y_lengths.

        `pitch`: token-level predictor output (p_factor already applied by
        `encode`); required when the vocoder is f0-conditioned — it is
        duration-expanded to frame level, mirroring the teacher-forced frame
        pitch the vocoder saw in training."""
        y_mask = sequence_mask(y_lengths, n_frames)
        target_padding_mask = ~y_mask
        y = gaussian_upsample(hidden, durations.astype(jnp.float32), y_mask, x_mask)
        y = self.decoder(y, target_padding_mask, deterministic=True)
        f0_frames = None
        if self.cfg.vocoder.f0_cond:
            f0_frames, _ = expand_by_duration(pitch[..., None], durations, n_frames)
            f0_frames = f0_frames[..., 0] * y_mask.astype(f0_frames.dtype)
        wav = self.vocoder(y, f0=f0_frames, padding_mask=target_padding_mask,
                           deterministic=True)
        wav_lengths = y_lengths * self.cfg.features.hop_length
        return {"wav": wav.astype(jnp.float32), "wav_lengths": wav_lengths}
